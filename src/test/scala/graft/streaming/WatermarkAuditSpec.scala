package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q208's watermark-lateness report: deterministic across runs (same
  * spool → same per-batch metrics, checkpoint and sink reset each run)
  * and shaped by the documented two-watermark protocol.
  */
class WatermarkAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("the per-batch report is deterministic and follows the " +
    "two-watermark protocol: drops lag lateness by one batch, the " +
    "final state holds exactly the two sentinel windows") {
    val run1 = graft.queries.StreamingQueries
      .queries("q208_watermark_audit")(spark, sf).collect().map(_.toSeq)
    val run2 = graft.queries.StreamingQueries
      .queries("q208_watermark_audit")(spark, sf).collect().map(_.toSeq)
    assert(run1.toSeq == run2.toSeq, "progress metrics drifted across runs")
    assert(run1.length == 5, run1.mkString("\n"))
    def row(i: Int) = run1(i) // (batch, input, dropped, state, removed)
    // batch 0 (on-time half): nothing dropped, nothing removed
    assert(row(0)(2) == 0L && row(0)(4) == 0L, row(0).toString)
    // batch 1 (first late file): the filter watermark LAGS one batch —
    // nothing dropped, but eviction already runs at the new watermark
    assert(row(1)(2) == 0L, row(1).toString)
    assert(row(1)(4).asInstanceOf[Long] > 0L, row(1).toString)
    // batch 2 (second late file): now the filter watermark is high —
    // its windows drop at the state operator, state untouched
    assert(row(2)(2).asInstanceOf[Long] > 0L, row(2).toString)
    assert(row(2)(4) == 0L, row(2).toString)
    assert(row(2)(3) == row(1)(3), s"${row(1)} vs ${row(2)}")
    // sentinels: batch 3 adds a window; batch 4 flushes every real
    // window, leaving exactly the two sentinel windows in state
    assert(row(4)(3) == 2L, row(4).toString)
  }
}
