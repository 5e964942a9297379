package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventQueries

/** q176's SCD2 packing core on a hand fixture: runs of equal attribute
  * values pack into [valid_from, valid_to) intervals that tile each
  * user's timeline (each segment closes at the NEXT segment's start),
  * an A→B→A flip-flop yields THREE segments (gaps-and-islands, not
  * groupBy(value)), exactly one open current segment per user, and the
  * (ms, event_id) tiebreak makes equal-timestamp ordering total.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flip-flop packs to three tiling segments; ties order by event_id; " +
    "one NULL-bounded current segment per user") {
    import spark.implicits._
    val ev = Seq(
      // user 1: A A B A  -> 3 segments (A:2, B:1, A:1)
      (1L, 10L, 100L, "A"),
      (1L, 11L, 200L, "A"),
      (1L, 12L, 300L, "B"),
      (1L, 13L, 400L, "A"),
      // user 2: tie at ms=100 — event_id orders B(20) before A(21),
      // so segments are B then A, NOT one merged run
      (2L, 20L, 100L, "B"),
      (2L, 21L, 100L, "A")
    ).toDF("user_id", "event_id", "ms", "event_type")
    val seg = EventQueries.scd2Segments(ev)
      .orderBy("user_id", "valid_from_ms")
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(seg.toSeq == Seq(
      (1L, "A", 100L, 2L, Some(300L)),
      (1L, "B", 300L, 1L, Some(400L)),
      (1L, "A", 400L, 1L, None),
      (2L, "B", 100L, 1L, Some(100L)),
      (2L, "A", 100L, 1L, None)))
    // exactly one current (NULL valid_to) segment per user
    assert(seg.groupBy(_._1).forall(_._2.count(_._5.isEmpty) == 1))
  }
}
