package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.DedupTextQueries

/** The non-ASCII claim behind q283 (the collation-key router), held as
  * MEASURED facts rather than folklore:
  *
  *  1. Router faithfulness: for every probe pair — ASCII case
  *     variants, German ß/SS, Greek final sigma ς/σ, Turkish dotted İ,
  *     ligatures — collation-key equality must coincide EXACTLY with
  *     UTF8_LCASE equality (both directions: no split, no merge).
  *     This is the property the lean-dedup rewrite needs and the one
  *     `lower()` only provides on ASCII.
  *  2. Divergence witnesses: at least one pair must be collated-EQUAL
  *     while `lower()`-UNEQUAL — the concrete string q275's router
  *     would split into two dedup groups (a missed duplicate) and
  *     q283's keeps together. If a Spark release changes UTF8_LCASE's
  *     fold tables so no probe diverges, this test fails and flags
  *     the q283 scaladoc's claim for re-measurement.
  *  3. End-to-end: a corpus seeded with a divergent pair dedups to ONE
  *     canonical under q283's router and TWO under the lower() router.
  */
class CollationRouterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val probes = Seq(
    ("ascii case", "Hello World", "hello world"),
    ("ascii distinct", "hello world", "hello worlds"),
    ("german sharp s", "STRASSE", "straße"),
    ("greek final sigma", "ΘΕΟΣ", // ΘΕΟΣ
      "θεος"), // θεος (final ς)
    ("greek medial sigma pair", "σ", "ς"), // σ vs ς
    ("turkish dotted capital I", "İstanbul", "i̇stanbul"),
    ("unrelated non-ascii", "éclair", "eclair"))

  /** (collatedEqual, lowerEqual, ckeyEqual) measured through the engine. */
  private def measure(a: String, b: String): (Boolean, Boolean, Boolean) = {
    import spark.implicits._
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        (collate(col("a"), "UTF8_LCASE") === collate(col("b"), "UTF8_LCASE"))
          .as("ce"),
        (lower(col("a")) === lower(col("b"))).as("le"),
        (DedupTextQueries.collationKeyRouter(col("a")) ===
          DedupTextQueries.collationKeyRouter(col("b"))).as("ke"))
      .head()
    (row.getBoolean(0), row.getBoolean(1), row.getBoolean(2))
  }

  test("collation-key equality coincides exactly with UTF8_LCASE " +
    "equality on every probe (lower() does not)") {
    val measured = probes.map { case (name, a, b) =>
      val (ce, le, ke) = measure(a, b)
      assert(ke == ce,
        s"$name: collation key ${if (ke) "merged" else "split"} a pair " +
          s"the collation ${if (ce) "equates" else "distinguishes"} " +
          s"($a vs $b)")
      (name, ce, le)
    }
    val witnesses = measured.collect {
      case (name, true, false) => name
    }
    assert(witnesses.nonEmpty,
      "no probe diverged (collated-equal but lower()-unequal) — " +
        "UTF8_LCASE's fold tables changed; re-measure q283's claim. " +
        s"Measured: $measured")
  }

  test("end-to-end: a divergent pair dedups to one canonical under the " +
    "collation-key router and stays split under the lower() router") {
    import spark.implicits._
    // pick the first measured witness so the test tracks the engine
    val (wa, wb) = probes.collectFirst {
      case (_, a, b) if {
        val (ce, le, _) = measure(a, b); ce && !le
      } => (a, b)
    }.getOrElse(fail("no divergence witness among probes"))

    val corpus = Seq((1L, wa), (2L, wb), (3L, "unrelated text"))
      .toDF("doc_id", "text")

    def groups(router: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Long =
      corpus.select(xxhash64(router(col("text"))).as("fp"))
        .distinct().count()

    assert(groups(DedupTextQueries.collationKeyRouter) == 2,
      s"collation-key router must merge '$wa'/'$wb' into one group")
    assert(groups(t => lower(t)) == 3,
      s"lower() router unexpectedly merged '$wa'/'$wb' — the q275 " +
        "scaladoc's ASCII-only caveat no longer holds, update it")
  }
}
