package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.queries.{CorpusStatsQueries, StreamingQueries}

/** q173/q174's bloom filter: the word fold is a commutative AND
  * idempotent monoid (bitwise OR), so (a) folding ANY batching of the
  * base — including a REPLAYED batch — must land on the batch sketch
  * exactly, and (b) the membership contract holds: no false negative
  * can ever appear in the verdict grid, at any fill level.
  */
class BloomFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("folding a disordered 3-way batching (with one batch REPLAYED) " +
    "== the batch sketch, and the verdict grid has no false negatives") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val docs = graft.core.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val root = java.nio.file.Files
        .createTempDirectory("bloom_fold_spec").toString
      val parts = Seq(
        docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 > 3),
        docs.filter(col("doc_id") % 7 < 3))
      parts.zipWithIndex.foreach { case (b, i) =>
        StreamingQueries.bloomFoldBatch(spark, root)(b, i.toLong)
      }
      // at-least-once delivery: batch 2's payload arrives AGAIN as
      // batch 3 — idempotence means the folded words cannot change
      StreamingQueries.bloomFoldBatch(spark, root)(parts(2), 3L)
      val folded = spark.read.parquet(s"$root/batch_3")
      val batchSketch = CorpusStatsQueries.bloomSketch(
        CorpusStatsQueries.bloomDocFps(spark, d)
          .filter(col("doc_id") % 10 =!= 0))
      assert(folded.exceptAll(batchSketch).isEmpty &&
        batchSketch.exceptAll(folded).isEmpty,
        "folded words differ from the batch sketch (monoid broken)")
      assert(folded.count() <= CorpusStatsQueries.BloomWords,
        "state rows must stay within the fixed word geometry")
      val grid = CorpusStatsQueries.bloomReport(spark, d, folded)
        .select("maybe_in_base", "is_member").collect()
      assert(!grid.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L),
        "a (maybe=0, member=1) row is a FALSE NEGATIVE — bloom contract broken")
      // the fixture must actually exercise membership on both sides
      assert(grid.exists(r => r.getLong(1) == 1L) &&
        grid.exists(r => r.getLong(1) == 0L),
        "fixture must contain both members and non-members")
    }
  }
}
