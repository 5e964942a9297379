package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.CorpusStatsQueries

/** q127's BPE trainer on a hand-built corpus: most-frequent-pair wins,
  * merge symbols themselves pair in later rounds (merge-of-merged — the
  * property that makes BPE BPE), whitespace never pairs, and the loop
  * stops early when no legal pair remains.
  */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge-of-merged, whitespace exclusion, early stop") {
    import spark.implicits._
    val docs = Seq(
      1L -> "abab cd",
      2L -> "abab").toDF("doc_id", "text")
    val got = CorpusStatsQueries.bpeMerges(spark, docs)
      .collect()
      .map(r => (r.getAs[Int]("it"), r.getAs[String]("pair"),
        r.getAs[Long]("n_pair")))
      .toSeq
    val m0 = 0xE000.toChar // symbol minted for merge 0
    val m1 = 0xE001.toChar
    assert(got == Seq(
      // "ab" occurs 4x -> merge 0
      (0, "ab", 4L),
      // the merged symbol pairs with ITSELF: "m0 m0" occurs twice
      (1, s"$m0$m0", 2L),
      // only "cd" remains (pairs spanning the space are excluded)
      (2, "cd", 1L)),
      s"got $got")
    // after 3 merges the corpus is "m1 m2" / "m1" — no legal pair left,
    // so the trainer stopped early instead of emitting degenerate rows
    assert(got.size == 3 && got.forall(_._2.forall(c => c != ' ')))
    assert(got(1)._2.head == m0 && got.map(_._1) == Seq(0, 1, 2))
    assert(m1 == 0xE001.toChar) // (documents the symbol progression)
  }

  test("q128 encode compresses: every doc's BPE symbol count is at most " +
    "its raw character count, and the corpus strictly shrank") {
    val rows = CorpusStatsQueries.queries("q128_bpe_encode")(
      spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe") <= r.getAs[Long]("n_chars"))
    }
    assert(rows.map(_.getAs[Long]("n_bpe")).sum <
      rows.map(_.getAs[Long]("n_chars")).sum)
  }
}
