package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.MinHashBandKeys
import org.apache.spark.unsafe.types.UTF8String

/** Online LSH near-dup over a document stream: collisions resolve against
  * everything inside the state horizon, duplicates expire out of state
  * after the TTL.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val TextA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val TextC =
    "one two three four five six seven eight nine ten eleven twelve"
  // TextA with one middle word changed: shares a prefix/suffix of
  // shingles with TextA — how many BANDS collide is fixed arithmetic,
  // computed below from the expression itself, not assumed
  private val TextD =
    "alpha beta gamma delta epsilon zeta XRAY theta iota kappa lambda mu"

  private def keys(s: String): Seq[String] = {
    val arr = MinHashBandKeys.compute(UTF8String.fromString(s))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  test("copies collide in all bands against the horizon owner; disjoint " +
    "docs never collide; expired buckets forget their owner") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingNearDup.collisions(
        source.toDS().toDF("doc_id", "text", "ts"),
        watermarkDelay = "0 seconds", stateTtlMs = 60L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    def hits(): Seq[(Long, Int, Long)] = spark.table("neardup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    try {
      // batch 1: A claims its 4 buckets, C claims 4 disjoint ones
      source.addData((1L, TextA, t(0)), (3L, TextC, t(0)))
      q.processAllAvailable()
      assert(hits().isEmpty)

      // batch 2: an exact copy of A collides in every band; the
      // partial-overlap doc D collides in exactly the bands whose keys
      // it shares with A (ground truth from the expression arithmetic)
      val sharedAD = keys(TextA).zip(keys(TextD)).count { case (a, d) => a == d }
      source.addData((2L, TextA, t(10)), (4L, TextD, t(10)))
      q.processAllAvailable()
      val h2 = hits()
      assert(h2.count { case (d, _, o) => d == 2L && o == 1L }
        == MinHashBandKeys.Bands)
      assert(h2.count { case (d, _, o) => d == 4L && o == 1L } == sharedAD)
      assert(h2.size == MinHashBandKeys.Bands + sharedAD)

      // two watermark-advancing sentinels (2 tokens -> no band rows, so
      // no state touched): first moves the watermark past every bucket's
      // TTL, second lets the timeouts fire and drop the state
      source.addData((90L, "tick tock", t(300)))
      q.processAllAvailable()
      source.addData((91L, "tick tock", t(301)))
      q.processAllAvailable()

      // batch 5: a fresh copy of A arrives AFTER the horizon — the old
      // owner has been forgotten, so it claims the buckets silently
      val before = hits().size
      source.addData((5L, TextA, t(310)))
      q.processAllAvailable()
      assert(hits().size == before)

      // batch 6: and a copy arriving while 5's claim is live collides
      // against 5, not against the long-expired 1
      source.addData((6L, TextA, t(315)))
      q.processAllAvailable()
      val h6 = hits().filter { case (d, _, _) => d == 6L }
      assert(h6.size == MinHashBandKeys.Bands)
      assert(h6.forall { case (_, _, o) => o == 5L })
    } finally q.stop()
  }
}
