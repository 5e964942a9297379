package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.SparkPlan

import graft.queries.TpcdsShapeQueries

/** Plan pins for the TPC-DS shape slice (q290–q298): the hash gate
  * proves the answers; this spec proves the SHAPES planned the way the
  * 100 TB story claims — no cartesian product anywhere, the part
  * dimension broadcast in the queries that attach it, and q297's
  * self-joined aggregate reusing one exchange instead of recomputing
  * the monthly rollup twice.
  */
class TpcdsShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case x => x.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("every DS-shape query runs non-empty at sf0.001 with no " +
    "cartesian product in its executed plan") {
    for ((name, q) <- TpcdsShapeQueries.queries) {
      val df = q(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned no rows at sf0.001")
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
        s"$name planned a CartesianProduct")
    }
  }

  test("the part dimension broadcasts in the queries that attach it " +
    "(q290/q291/q292/q293/q297)") {
    val withPart = Seq("q290_ds44_topk_window", "q291_ds67_rollup_window",
      "q292_ds51_cumulative_full_outer", "q293_ds36_margin_rollup",
      "q297_ds59_pop_ratio")
    for (name <- withPart) {
      val df = TpcdsShapeQueries.queries(name)(spark, sf)
      df.collect()
      val nodes = allNodes(df.queryExecution.executedPlan)
      assert(nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        s"$name: expected at least one broadcast-hash join (part dim)")
    }
  }

  test("q297's period-over-period self-join reuses the monthly " +
    "aggregate's exchange (one shuffle feeds both years)") {
    val df = TpcdsShapeQueries
      .queries("q297_ds59_pop_ratio")(spark, sf)
    df.collect()
    val reused = allNodes(df.queryExecution.executedPlan).exists {
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
      case _ => false
    }
    assert(reused,
      "q297 recomputed the monthly aggregate instead of reusing its " +
        "exchange — the two year-sides diverged in plan")
  }
}
