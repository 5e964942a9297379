package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.queries.{IngestQueries, StreamingQueries}

/** q193's signed-partial fold: state transitions under the monotone
  * argmax fold TELESCOPE, so the partial sum must equal
  * final-state-minus-base per doc for ANY batching of the feed — a
  * disordered split, a duplicated batch (whose rows are all dominated
  * → zero transitions → an EMPTY partial frame), and a same-id replay
  * (which must overwrite its own state and partials identically).
  */
class RetractFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("disordered batching + duplicated batch + same-id replay: " +
    "summed signed partials reproduce q191 exactly") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val feed = IngestQueries.cdcFeed(spark, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("retract_fold_spec").toString
      val stateRoot = s"$tmp/state"
      val partialRoot = s"$tmp/partials"
      val docs = graft.core.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val baseLens = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("base_len"))
      // split by seq so batches interleave ops on the SAME keys in an
      // order the telescoping must not care about
      val parts = Seq(
        feed.filter(col("seq") === 3),
        feed.filter(col("seq") === 1),
        feed.filter(col("seq") === 2))
      parts.zipWithIndex.foreach { case (b, i) =>
        StreamingQueries.retractFoldBatch(spark, stateRoot, partialRoot,
          baseLens)(b, i.toLong)
      }
      // at-least-once delivery as a NEW batch: every row is dominated
      // by state, so the batch must cause zero transitions
      StreamingQueries.retractFoldBatch(spark, stateRoot, partialRoot,
        baseLens)(parts(1), 3L)
      val dupPartials = spark.read.parquet(s"$partialRoot/batch_id=3")
      assert(dupPartials.isEmpty,
        "a fully-dominated batch must emit no partials")
      // same-id replay: recomputing batch 2 from state 1 must land on
      // identical state and partials (exactly-once from overwrite)
      val before = spark.read.parquet(s"$partialRoot/batch_id=2")
        .collect().toSet
      StreamingQueries.retractFoldBatch(spark, stateRoot, partialRoot,
        baseLens)(parts(2), 2L)
      val after = spark.read.parquet(s"$partialRoot/batch_id=2")
        .collect().toSet
      assert(before == after, "same-id replay changed the partials")
      val basePartials = docs
        .groupBy((col("doc_id") % 8).as("shard"))
        .agg(count(lit(1)).cast("long").as("dn"),
          sum(length(col("text")).cast("long")).as("dchars"))
      val served = basePartials
        .unionByName(StreamingQueries.readSink(spark, partialRoot))
        .groupBy("shard")
        .agg(sum(col("dn")).as("n_live"), sum(col("dchars")).as("n_chars"))
        .orderBy("shard").collect().toSeq
      val batch = IngestQueries
        .queries("q191_retractable_agg_view")(spark, d).collect().toSeq
      assert(served == batch,
        "folded signed partials differ from the batch view")
    }
  }
}
