package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{DedupTextQueries, MultimodalQueries, RunStore,
  SimilarityQueries, StreamingQueries}

/** The driver-visible streaming admission queries (q97/q98/q99) really
  * run the Structured Streaming engine over MULTIPLE micro-batches and
  * still union to exactly their batch twins' verdicts — the
  * batch-invariance contract as an executable equality, not just the
  * hash gate's say-so.
  */
class StreamingQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  /** Committed micro-batch count from the query's checkpoint log. */
  private def commits(tag: String): Int = {
    val dir = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      RunStore.tableName(s"graft_stream_$tag", sf) + "_ckpt/commits")
    Option(dir.list()).map(_.count(_.forall(_.isDigit))).getOrElse(0)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q97 streaming text admission == batch q64 verdicts, " +
    "and the run spanned multiple micro-batches") {
    val got = rows(StreamingQueries.q97StreamingTextAdmission(spark, sf))
    val want = rows(DedupTextQueries.q64IncrementalNeardup(spark, sf))
    assert(got == want)
    assert(commits("text") >= 3,
      "delta was spooled as 3 files with maxFilesPerTrigger=1 — fewer " +
        "than 3 commits means the stream collapsed to one batch and the " +
        "multi-batch union claim is untested")
  }

  test("q98 streaming media admission == batch q91 verdicts across " +
    "micro-batches") {
    val got = rows(StreamingQueries.q98StreamingMediaAdmission(spark, sf))
    val want = rows(MultimodalQueries.q91MediaAdmission(spark, sf))
    assert(got == want)
    assert(commits("media") >= 3)
  }

  test("q99 streaming embedding admission == batch q95 two-stage " +
    "verdicts across micro-batches") {
    val got = rows(StreamingQueries.q99StreamingEmbeddingAdmission(spark, sf))
    val want = rows(SimilarityQueries.q95EmbeddingAdmission(spark, sf))
    assert(got == want)
    assert(commits("emb") >= 3)
  }

  test("q101 streaming online near-dup across >= 3 micro-batches == " +
    "the min-owner-per-bucket batch semantics (tier one, driver-visible)") {
    import org.apache.spark.sql.functions._
    val got = rows(StreamingQueries.q101StreamingOnlineNeardup(spark, sf))
    // batch equivalent of online ownership under the (ts, doc_id)-
    // ordered spool: a bucket's owner is its min doc_id
    val bands = DedupTextQueries.textBandFrame(
      graft.core.Tables.documents(spark, sf).select(col("doc_id"), col("text")))
    val own = bands.groupBy("band", "bkey")
      .agg(min(col("doc_id")).as("dup_of"))
    val want = rows(bands.join(own, Seq("band", "bkey"))
      .filter(col("doc_id") =!= col("dup_of"))
      .select(col("doc_id"), col("band"), col("dup_of"))
      .orderBy(col("doc_id"), col("band")))
    assert(got == want)
    assert(commits("online") >= 3)
  }

  test("q100 streaming pattern top-k over a maximally disordered spool " +
    "== batch q96, bit-for-bit, across >= 5 micro-batches (3 shuffled " +
    "event files + 2 flush sentinels)") {
    val got = rows(StreamingQueries.q100StreamingPatternTopk(spark, sf))
    val want = rows(graft.queries.EventQueries.queries("q96_pattern_topk")(spark, sf))
    assert(got.nonEmpty && got == want)
    assert(commits("pattern") >= 5)
  }
}
