package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The plan claim behind q233 that its hash gate cannot hold: the
  * case-insensitive dedup key is the UTF8_LCASE-COLLATED text column —
  * the comparison/hash runs under the collation — and NOT a `lower()`
  * rewrite that would materialize a lowercase copy of every document
  * into the shuffle. Plus the semantics seam the oracle replays with
  * lower(): on collision-free fixtures the two formulations must agree
  * row-for-row (they are the same equivalence relation expressed two
  * ways), while the planned machinery differs.
  */
class CollatedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q233's optimized plan partitions on the collated comparison " +
    "itself — collate(..., UTF8_LCASE) present, no lower() rewrite") {
    val df = DedupTextQueries.q233CollatedDedup(spark, TestSpark.Sf0001)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("UTF8_LCASE"),
      s"expected a UTF8_LCASE-collated window key, got:\n$plan")
    assert(!plan.toLowerCase.contains("lower("),
      s"the collated key must not be a lower() rewrite, got:\n$plan")
  }

  test("xxhash64 is collation-UNAWARE on 4.1.2 (case variants of a " +
    "UTF8_LCASE string hash apart) — the measured fact that forces " +
    "q275's lower()-keyed router; a Spark release that makes this " +
    "test fail lets q275 route on the collated hash directly") {
    import spark.implicits._
    val collatedHashes = Seq("Alpha", "alpha").toDF("t")
      .select(xxhash64(collate(col("t"), "UTF8_LCASE")).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(collatedHashes.size == 2,
      "xxhash64 became collation-aware — route q275 on the collated hash")
    // the lower()-keyed router DOES unify case variants…
    val routed = Seq("Alpha", "ALPHA", "alpha").toDF("t")
      .select(xxhash64(lower(col("t"))).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(routed.size == 1)
    // …and distinct texts still get distinct routes
    val distinctH = Seq("alpha", "beta").toDF("t")
      .select(xxhash64(lower(col("t"))).as("h"))
      .collect().map(_.getLong(0)).toSet
    assert(distinctH.size == 2)
  }

  test("q275 ≡ q233 row-for-row, and the lean plan moves FEWER shuffle " +
    "bytes (the corpus text no longer rides the corpus-wide exchange)") {
    def shuffleBytes(df: org.apache.spark.sql.DataFrame): Long = {
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case r: org.apache.spark.sql.execution.exchange
              .ReusedExchangeExec => Seq(r.child)
          case x => x.children
        }
        p +: kids.flatMap(all)
      }
      all(df.queryExecution.executedPlan)
        .flatMap(_.metrics.get("shuffleBytesWritten")).map(_.value).sum
    }
    val lean = DedupTextQueries
      .queries("q275_collated_dedup_lean")(spark, TestSpark.Sf0001)
    val window = DedupTextQueries.q233CollatedDedup(spark, TestSpark.Sf0001)
    val leanRows = lean.collect().map(_.toSeq).toSeq
    val windowRows = window.collect().map(_.toSeq).toSeq
    assert(leanRows == windowRows)
    val (lb, wb) = (shuffleBytes(lean), shuffleBytes(window))
    assert(lb > 0 && wb > 0, s"expected both plans to shuffle: $lb vs $wb")
    assert(lb < wb,
      s"lean plan must move fewer shuffle bytes: lean=$lb window=$wb")
  }

  test("q283's fold fixture is discriminative: each non-ASCII witness " +
    "pair merges under the collation-key router and SPLITS under the " +
    "lower() router — a lower()-only oracle cannot green this gate") {
    val sf = TestSpark.Sf0001
    val q283 = DedupTextQueries
      .queries("q283_collation_key_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = graft.core.Tables.documents(spark, sf)
      .filter(col("doc_id") % 11 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(seeds.nonEmpty, "no %11 seeds at sf0.001 — fixture empty")
    for (s <- seeds) {
      // the sigma trio (final ς / medial σ / capital Σ) is ONE
      // UTF8_LCASE group
      assert(q283(s + 30000000L) == s + 20000000L,
        s"θεος/θεοσ pair for seed $s did not merge under the " +
          "collation-key router")
      assert(q283(s + 40000000L) == s + 20000000L,
        s"θεος/ΘΕΟΣ pair for seed $s did not merge under the " +
          "collation-key router")
      // the ß pair is NOT collated-equal (UTF8_LCASE does not
      // full-fold ß→ss) — an overfolding oracle would merge it
      assert(q283(s + 60000000L) == s + 60000000L,
        s"straße/STRASSE pair for seed $s merged — UTF8_LCASE began " +
          "full-folding ß; the q283 oracle's replay needs re-measuring")
      assert(q283(s + 20000000L) != q283(s),
        s"suffixed clone for seed $s merged with its base document")
    }
    // negative control: the q275 lower() router over the SAME corpus
    // splits the sigma trio (Spark's lower keeps final ς distinct
    // from medial σ), so a lower()-keyed dedup misses those dups
    val lowered = DedupTextQueries.leanCollatedDedup(
      DedupTextQueries.foldVariantCorpus(spark, sf), t => lower(t))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (s <- seeds) {
      assert(lowered(s + 30000000L) == s + 30000000L,
        s"lower() router unexpectedly merged final-ς with medial-σ " +
          s"for seed $s — UTF8_LCASE no longer diverges from lower(); " +
          "retire the fold-replay oracle commentary")
    }
  }

  test("the corpus is ASCII — the precondition under which UTF8_LCASE " +
    "≡ lower() (and so DuckDB's lower()-oracle) holds; a non-ASCII " +
    "testdata regeneration must fail HERE, not bend the oracle") {
    val nonAscii = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0,
      s"$nonAscii documents carry non-ASCII text; q233's lower() oracle " +
        "is only equivalent to UTF8_LCASE on ASCII (ß, Turkish İ, final " +
        "sigma diverge) — revisit the oracle before regenerating testdata")
  }

  test("collated dedup ≡ lower() dedup row-for-row (the oracle seam), " +
    "and every seeded case-variant clone resolves to its original") {
    import spark.implicits._
    val collated = DedupTextQueries.q233CollatedDedup(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    val docs = graft.core.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          upper(col("text")).as("text")))
    val w = Window.partitionBy(lower(col("text")))
    val rewritten = corpus
      .select(col("doc_id"), min(col("doc_id")).over(w).as("canonical_id"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    assert(collated.toSeq == rewritten.toSeq)

    val clones = collated.filter(_._1 >= 10000000L)
    assert(clones.nonEmpty, "fixture must seed case-variant clones")
    clones.foreach { case (id, canonical, isDup) =>
      assert(isDup, s"clone $id must be a duplicate of its original")
      assert(canonical <= id - 10000000L,
        s"clone $id must canonicalize to an original doc_id, got $canonical")
    }
  }
}
