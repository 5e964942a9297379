package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs at sf0.001 without error; the flagship
  * smoke contract holds; names line up between queries and oracleSql.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
      // core operators must produce rows even at the smallest SF
      val mustBeNonEmpty = !Set("q32_minhash_pairs", "q34_ngram_jaccard",
        "q42_embed_neardup", "q06_anti_join", "q12_except",
        "q101_streaming_online_neardup",
        // downstream of q32's candidate set — empty whenever it is
        "q129_edit_confirm",
        // TPC-H canon rows whose substitution parameters select through
        // several dimension filters at once (Q2 size×type×region over 10
        // suppliers, Q7 nation pair, Q11 single-nation partsupp, Q20/Q21
        // nation-filtered supplier cohorts): legitimately empty at
        // sf0.001's cardinalities, non-empty from sf0.01 up (the oracle
        // gate runs there — DuckDB replays the same zero)
        "q251_tpch02", "q256_tpch07", "q260_tpch11", "q269_tpch20",
        "q270_tpch21").contains(name)
      if (mustBeNonEmpty) assert(n > 0, s"$name returned no rows")
    }
  }
}
