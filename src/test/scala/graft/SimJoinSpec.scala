package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.DedupTextQueries

/** q178's prefix filter, held quantitatively: the candidate set must
  * PRUNE (strictly fewer pairs than the docs that co-share any
  * shingle) yet stay COMPLETE (every pair the brute-force all-pairs
  * join qualifies survives the prefix cut) — completeness is also
  * oracle-gated at sf0.01, this pins the pruning actually happening.
  */
class SimJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("prefix candidates prune the co-sharing pair space and lose no " +
    "qualifying pair") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val sh = graft.core.CacheScope.track(
        graft.core.Tables.documents(spark, d)
          .select(col("doc_id"), explode(array_distinct(
            graft.functions.WordShingles.wordShingles(col("text"))))
            .as("s"))
          .persist())
      val allPairs = sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), "s")
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val cands = DedupTextQueries.prefixCandidates(sh)
        .select("doc_a", "doc_b").distinct()
      val nAll = allPairs.count()
      val nCand = cands.count()
      assert(nCand < nAll,
        s"prefix filter must prune: candidates=$nCand all=$nAll")
      // completeness: the qualifying pairs (from the full query, whose
      // oracle is brute force) are all inside the candidate set
      val qualifying = DedupTextQueries
        .queries("q178_set_similarity_join")(spark, d)
        .select("doc_a", "doc_b")
      assert(qualifying.exceptAll(cands).isEmpty,
        "a qualifying pair escaped the prefix candidates")
      assert(qualifying.count() > 0,
        "fixture must contain at least one qualifying pair")
    }
  }
}
