package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.queries.{IngestQueries, StreamingQueries}

/** q180's compaction fold: per-key argmax by seq is a commutative AND
  * idempotent monoid, so folding ANY batching of the change feed —
  * including a REPLAYED batch — must land on the batch compaction
  * exactly, and the merge report over the folded state must equal
  * q175's output row for row.
  */
class MergeFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("folding a disordered 3-way batching (with one batch REPLAYED) " +
    "== the batch compaction, and the merge over the folded state == " +
    "q175") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val feed = IngestQueries.cdcFeed(spark, d)
      val root = java.nio.file.Files
        .createTempDirectory("merge_fold_spec").toString
      // split by seq so batches interleave ops on the SAME keys, the
      // order the monoid must not care about
      val parts = Seq(
        feed.filter(col("seq") === 3),
        feed.filter(col("seq") === 1),
        feed.filter(col("seq") === 2))
      parts.zipWithIndex.foreach { case (b, i) =>
        StreamingQueries.mergeFoldBatch(spark, root)(b, i.toLong)
      }
      // at-least-once delivery: batch 1's payload arrives AGAIN
      StreamingQueries.mergeFoldBatch(spark, root)(parts(1), 3L)
      val folded = spark.read.parquet(s"$root/batch_3")
      val batchCompact = feed
        .groupBy("doc_id")
        .agg(max(struct(col("seq"), col("op"), col("new_text"))).as("m"))
        .select(col("doc_id"), col("m.seq").as("seq"),
          col("m.op").as("op"), col("m.new_text").as("new_text"))
      assert(folded.exceptAll(batchCompact).isEmpty &&
        batchCompact.exceptAll(folded).isEmpty,
        "folded state differs from the batch compaction (monoid broken)")
      val base = graft.core.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val streamed = IngestQueries.mergeReport(
        IngestQueries.applyMerge(base, folded)).collect().toSeq
      val batch = IngestQueries.queries("q175_merge_upsert")(spark, d)
        .collect().toSeq
      assert(streamed == batch,
        "merge over the folded state differs from q175")
    }
  }
}
