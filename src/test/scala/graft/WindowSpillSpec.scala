package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Negative control for q299's window-spill detector: under DEFAULT
  * thresholds the same windowed shape buffers in memory and spills
  * NOTHING — a detector that reported spill unconditionally would
  * green the oracle forever while proving nothing. (The positive —
  * spillSize > 0 under the punitive thresholds — is pinned by the
  * oracle row itself: `window_spilled` is TRUE-pinned.)
  */
class WindowSpillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q299's spill detector is discriminative: default thresholds " +
    "spill nothing and the answer is unchanged") {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    def shape(): org.apache.spark.sql.DataFrame =
      graft.core.Tables.documents(spark, TestSpark.Sf0001)
        .select(col("doc_id"), col("lang"),
          sum(col("n_chars")).over(w).as("run_chars"),
          row_number().over(w).as("rn"))
        .agg(count(lit(1)).as("n_rows"),
          sum(FaultGateQueries.fp(col("doc_id"), col("run_chars"),
            col("rn"))).as("win_fp"))
    val clean = shape()
    val cleanRow = clean.collect()(0)
    assert(FaultGateQueries.metricSum(clean, "spillSize") == 0,
      "window spilled under default thresholds — the gate's boolean " +
        "would be vacuous")
    // and the gated run's values equal the pressure-free run's
    val gated = FaultGateQueries
      .queries("q299_window_spill_gate")(spark, TestSpark.Sf0001)
      .collect()(0)
    assert(gated.getLong(0) == cleanRow.getLong(0))
    assert(gated.getLong(1) == cleanRow.getLong(1))
    assert(gated.getBoolean(2), "punitive thresholds did not spill")
  }
}
