package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.CorpusStatsQueries

/** q179's two passes, held quantitatively: the CMS candidate probe must
  * PRUNE the vocabulary (strictly fewer candidates than distinct
  * tokens) while remaining a SUPERSET of the true heavy hitters
  * (overestimate-only ⇒ no false negatives) — exactness of the final
  * answer is oracle-gated; this pins that the sketch is doing the work.
  */
class HeavyHitterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CMS candidates prune the vocab, contain every true heavy " +
    "hitter, and the two-pass output equals the direct computation") {
    graft.core.CacheScope.withScope {
      // sf0.01: sf0.001's 31-token vocabulary makes every token a heavy
      // hitter, so the pruning assertion would be vacuous there
      val d = "/root/testdata/sf0.01"
      val toks = graft.core.CacheScope.track(
        graft.core.Tables.documents(spark, d)
          .select(explode(graft.queries.tokens(col("text"))).as("tok"))
          .persist())
      val total = toks.agg(count(lit(1)).as("total"))
      val vocab = toks.select("tok").distinct().count()
      val cands = CorpusStatsQueries.hhCandidates(toks, total)
        .select("tok")
      val nCand = cands.count()
      assert(nCand < vocab,
        s"sketch must prune the vocab: candidates=$nCand vocab=$vocab")
      val direct = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
        .crossJoin(total)
        .filter(col("exact_n") * lit(CorpusStatsQueries.HhShareDen) >=
          col("total"))
      assert(direct.count() > 0, "fixture must contain heavy hitters")
      assert(direct.select("tok").exceptAll(cands).isEmpty,
        "a true heavy hitter escaped the CMS candidates (false negative)")
      val twoPass = CorpusStatsQueries
        .queries("q179_heavy_hitters")(spark, d)
        .select("tok", "exact_n")
      val want = direct.select("tok", "exact_n")
      assert(twoPass.exceptAll(want).isEmpty &&
        want.exceptAll(twoPass).isEmpty,
        "two-pass output differs from the direct heavy-hitter computation")
    }
  }
}
