package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Plan pins for the TPC-H canon tier (q250–q271) — the spots where the
  * canon is famous for punishing a planner, promoted from folklore to
  * assertions:
  *
  *  - Q2 / Q17 / Q20 / Q21: every CORRELATED subquery must decorrelate
  *    to joins/aggregates — a physical plan still carrying a correlated
  *    subquery expression would execute it per outer row, the classic
  *    100 TB scale-killer. (Uncorrelated scalars — Q11's total, Q15's
  *    max, Q22's average — legitimately stay as one-row subquery
  *    stages; those are NOT pinned away.)
  *  - No CartesianProduct anywhere in the tier. The only cross shapes
  *    allowed are the bounded broadcast ones the derived partsupp
  *    layer uses (a 1-row supplier-count frame and a 4-row index
  *    frame), which plan as BroadcastNestedLoopJoin over a broadcast
  *    side of ≤4 rows.
  *  - Q1/Q6: the date/quantity predicates must reach the parquet scan
  *    (PushedFilters) — a canon run that scans everything and filters
  *    in memory reads 100× the bytes it needs at 100 TB.
  */
class TpchPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q2's correlated min-cost scalar decorrelates to a part-grain " +
    "min aggregate joined back — no subquery, no cartesian") {
    val p = physical(TpchQueries.q251Tpch02(spark, sf))
    assert(!p.contains("subquery"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
    // the min rides a partkey-grouped HashAggregate, not a per-row probe
    assert(p.contains("min(ps_supplycost"), p.take(4000))
  }

  test("Q17's per-part threshold scalars decorrelate to partkey-grain " +
    "aggregates (the q203 contract, count-bug guarded)") {
    val p = physical(TpchQueries.q266Tpch17(spark, sf))
    assert(!p.contains("scalar-subquery"), p.take(4000))
    assert(p.contains("LeftOuter"), p.take(4000))
    assert(p.split("HashAggregate\\(keys=\\[l_partkey").length - 1 >= 2,
      p.take(4000))
  }

  test("Q20's nested IN + two-key correlated scalar decorrelates: semi " +
    "joins for the INs, an aggregate join for the shipped-quantity sum") {
    val p = physical(TpchQueries.q269Tpch20(spark, sf))
    assert(!p.contains("subquery"), p.take(4000))
    assert(p.contains("LeftSemi"), p.take(4000))
    assert(!p.contains("CartesianProduct"), p.take(4000))
  }

  test("Q21's EXISTS ∧ NOT EXISTS pair decorrelates to a semi + anti " +
    "join on orderkey, the suppkey disequality riding as a residual") {
    val p = physical(TpchQueries.q270Tpch21(spark, sf))
    assert(p.contains("LeftSemi"), p.take(4000))
    assert(p.contains("LeftAnti"), p.take(4000))
    assert(!p.contains("subquery"), p.take(4000))
  }

  test("no CartesianProduct in ANY canon plan; dims broadcast in the " +
    "deep joins (Q5/Q8/Q9)") {
    for ((name, q) <- TpchQueries.queries.toSeq.sortBy(_._1)) {
      val p = physical(q(spark, sf))
      assert(!p.contains("CartesianProduct"), s"$name:\n${p.take(3000)}")
    }
    for (name <- Seq("q254_tpch05", "q257_tpch08", "q258_tpch09")) {
      val p = physical(TpchQueries.queries(name)(spark, sf))
      assert(p.contains("BroadcastHashJoin"), s"$name:\n${p.take(3000)}")
    }
  }

  test("Q1 and Q6 push their scan predicates into the parquet reader") {
    // formatted mode: toString truncates long PushedFilters lists
    def formatted(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    val p1 = formatted(TpchQueries.q250Tpch01(spark, sf))
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), p1.take(4000))
    val p6 = formatted(TpchQueries.q255Tpch06(spark, sf))
    assert(p6.contains("GreaterThanOrEqual(l_shipdate"), p6.take(4000))
    assert(p6.contains("GreaterThanOrEqual(l_discount,0.04)"), p6.take(4000))
    assert(p6.contains("LessThan(l_quantity,24.0)"), p6.take(4000))
  }

  test("the canon answers are stable across the derived layer: spot " +
    "totals match an independent recomputation (Q1 count, Q12 counts)") {
    import org.apache.spark.sql.functions._
    val q1 = TpchQueries.q250Tpch01(spark, sf)
      .agg(sum(col("count_order"))).head().getLong(0)
    val direct = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-08-06 00:00:00")
        .cast("timestamp")).count()
    assert(q1 == direct)

    val q12 = TpchQueries.q261Tpch12(spark, sf)
      .agg(sum(col("high_line_count") + col("low_line_count")))
      .head().getLong(0)
    val directX = TpchQueries.TpchLayer.lineitemX(spark, sf)
      .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
        col("l_commitdate") < col("l_receiptdate") &&
        col("l_shipdate") < col("l_commitdate") &&
        col("l_receiptdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_receiptdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      .count()
    assert(q12 == directX)
  }
}
