package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.{RunStore, SearchQueries}

/** q163's fold contract beyond the oracle row (which proves folded ==
  * from-scratch): the delta really lands in the index O(delta)-style —
  * delta postings are present, nothing base-side is rewritten, and a
  * delta document is VISIBLE to the serving path.
  */
class PostingFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("the folded posting table carries base AND delta postings " +
    "exactly once each, and the serve path sees delta documents") {
    graft.core.CacheScope.withScope {
      // run the lifecycle (build + fold + serve plan construction)
      SearchQueries.queries("q163_posting_index_fold")(spark, sf).collect()
      val t = RunStore.tableName("graft_posting_lifecycle", sf)
      val folded = spark.table(t)
      val full = SearchQueries
        .postingRows(graft.core.Tables.documents(spark, sf))
      // fold == from-scratch at the ROW level (the oracle only checks
      // the served top-20): same multiset of (term, doc_id, tf, dl)
      val key = Seq(col("term"), col("doc_id"), col("tf"), col("dl"))
      assert(folded.select(key: _*).exceptAll(full.select(key: _*)).isEmpty)
      assert(full.select(key: _*).exceptAll(folded.select(key: _*)).isEmpty)
      // delta documents (doc_id % 10 == 0) are present in the index
      val nDelta = folded.filter(col("doc_id") % 10 === 0).count()
      assert(nDelta > 0, "fold appended no delta postings")
      // and the serving tier can surface a delta doc: the UNCUT
      // boolean-AND hit set over the folded store contains delta ids
      // (the top-20 cut may or may not — visibility must not depend on
      // rank)
      val Seq(ta, tb) = SearchQueries.topDfTermsOf(folded, 2)
      val hits = folded.filter(col("term").isin(ta, tb))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .filter(col("n") === 2)
      assert(hits.filter(col("doc_id") % 10 === 0).count() > 0,
        "no delta doc in the boolean-AND hit set")
    }
  }
}
