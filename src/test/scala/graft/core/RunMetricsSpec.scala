package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RunMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("listener captures action name and duration for executed queries") {
    val l = RunMetrics.register(spark)
    try {
      Tables.nation(spark, TestSpark.Sf0001).collect()
      // listener callbacks run async on the listener bus
      val deadline = System.nanoTime() + 10e9.toLong
      while (l.metrics.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = l.metrics
      assert(m.nonEmpty)
      assert(m.exists(x => x.action == "collect" && x.error.isEmpty &&
        x.durationNs > 0))
    } finally spark.listenerManager.unregister(l)
  }
}
