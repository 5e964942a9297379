package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.TpchQueries

/** Fixture preconditions the derived TPC-H layer depends on — pinned
  * the way the ASCII-corpus precondition is pinned, so a future
  * testdata regeneration that silently breaks the spread arithmetic
  * fails HERE with the reason spelled out, not downstream as a
  * hash-green-but-semantically-wrong canon (advisory r18 #1).
  *
  *  - Supplier keys contiguous in [min, min+count) and count >= 4:
  *    TpchLayer.partsupp maps each part to 4 DISTINCT EXISTING
  *    suppliers only under these two facts. The production guard is
  *    the lazy `raise_error` inside partsupp's broadcast frame; this
  *    spec asserts the fixture directly and exercises the guard.
  *  - Every ps_suppkey must resolve to a shipped supplier row and
  *    every (ps_partkey, ps_suppkey) pair must be unique — the two
  *    concrete corruptions the advisory names (Q9 composite-join
  *    double-counts, Q16 supplier_cnt deflation).
  */
class TpchLayerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("fixture: supplier keys are contiguous and count >= 4") {
    val r = graft.core.Tables.supplier(spark, sf)
      .agg(count(lit(1)).as("cnt"), min("s_suppkey").as("mn"),
        max("s_suppkey").as("mx"))
      .head()
    val (cnt, mn, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(cnt >= 4, s"supplier count $cnt < 4")
    assert(mx - mn + 1 == cnt,
      s"supplier keys not contiguous: min=$mn max=$mx cnt=$cnt")
  }

  test("partsupp: every ps_suppkey dangles nowhere and every " +
    "(ps_partkey, ps_suppkey) pair is unique") {
    val ps = TpchQueries.TpchLayer.partsupp(spark, sf).cache()
    try {
      val dangling = ps
        .join(graft.core.Tables.supplier(spark, sf),
          ps("ps_suppkey") === col("s_suppkey"), "left_anti")
        .count()
      assert(dangling == 0, s"$dangling partsupp rows dangle")
      val total = ps.count()
      val distinctPairs =
        ps.select("ps_partkey", "ps_suppkey").distinct().count()
      assert(total == distinctPairs,
        s"duplicate (ps_partkey, ps_suppkey) pairs: $total rows, " +
          s"$distinctPairs distinct")
    } finally ps.unpersist()
  }

  test("the in-frame guard trips on a fixture violating contiguity") {
    // Rebuild partsupp's guarded frame over a synthetic supplier set
    // with a key gap: the same when/raise_error must throw on use.
    import spark.implicits._
    val holey = Seq(1L, 2L, 3L, 5L, 6L).toDF("s_suppkey")
    val sc = holey
      .agg(count(lit(1)).as("s_cnt"), min("s_suppkey").as("s_min"),
        max("s_suppkey").as("s_max"))
      .select(
        when(col("s_cnt") >= 4 &&
             col("s_max") - col("s_min") + 1 === col("s_cnt"),
          col("s_cnt"))
          .otherwise(raise_error(lit("precondition violated")))
          .as("s_cnt"))
    val e = intercept[Exception] { sc.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("precondition violated")),
      messages(e).mkString(" | "))
  }
}
