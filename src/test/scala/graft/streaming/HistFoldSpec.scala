package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.queries.{CorpusStatsQueries, StreamingQueries}

/** q170's histogram fold: per-(lang, n_chars) counts are a commutative
  * monoid, so folding ANY batching of the corpus must land on the batch
  * histogram exactly — and the quantile report over the folded state
  * must equal q61's batch output row for row. Also pins the state
  * bound: rows = distinct (lang, n_chars) pairs, the value domain,
  * never the document count.
  */
class HistFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("folding an arbitrary 3-way batching of the corpus == the batch " +
    "histogram, the quantile report over the folded state == q61, and " +
    "state rows are value-domain-bounded") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val docs = graft.core.Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val root = java.nio.file.Files
        .createTempDirectory("hist_fold_spec").toString
      // a deliberately unbalanced, disordered batching
      val parts = Seq(
        docs.filter(col("doc_id") % 7 === 3),
        docs.filter(col("doc_id") % 7 > 3),
        docs.filter(col("doc_id") % 7 < 3))
      parts.zipWithIndex.foreach { case (b, i) =>
        StreamingQueries.histFoldBatch(spark, root)(b, i.toLong)
      }
      val folded = spark.read.parquet(s"$root/batch_${parts.size - 1}")
      val batchHist = docs.groupBy("lang", "n_chars")
        .agg(count(lit(1)).as("cnt"))
      assert(folded.exceptAll(batchHist).isEmpty &&
        batchHist.exceptAll(folded).isEmpty,
        "folded state differs from the batch histogram")
      val domain = docs.select("lang", "n_chars").distinct().count()
      assert(folded.count() == domain,
        "state rows must equal the distinct (lang, n_chars) domain")
      val streamed = CorpusStatsQueries.quantilesOverHist(folded)
        .orderBy("lang").collect().toSeq
      val batch = CorpusStatsQueries.lengthQuantiles(spark, d)
        .orderBy("lang").collect().toSeq
      assert(streamed == batch,
        "quantiles over the folded state differ from q61")
    }
  }
}
