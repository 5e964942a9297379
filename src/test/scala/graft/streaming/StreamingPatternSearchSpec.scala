package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Stream ≡ batch for the pattern-search tier: in-order events through
  * the keyed state machine emit EXACTLY q96's scored frame — `==` on
  * doubles, no tolerance (the state-side scoring loop reproduces the
  * batch expression's accumulation order).
  */
class StreamingPatternSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001
  private val Ramp = (1 to 8).map(_.toDouble).toArray

  test("in-order streamed events emit the exact batch q96 scored frame " +
    "(whole corpus, split across micro-batches)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))

    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-7, Window.currentRow)
    val expected = ev
      .withColumn("win", collect_list(col("value")).over(win))
      .filter(size(col("win")) === 8)
      .select(col("user_id"), unix_millis(col("ts")).as("end_ms"),
        graft.functions.VectorFunctions
          .cosineSimilarity(col("win"), typedlit(Ramp.toSeq)).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(expected.nonEmpty)

    val inOrder = ev.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._2.getTime, t._3)).toSeq
    val source = MemoryStream[(Long, Timestamp, Long, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = StreamingPatternSearch.scores(
        source.toDS().toDF("user_id", "ts", "event_id", "value"),
        Ramp, "10 minutes", stateTtlMs = 365L * 24 * 3600 * 1000)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pat_ckpt").toString)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PatternScore], _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(s => (s.user_id, s.end_ms, s.sim))
        }; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try inOrder.grouped(math.max(1, inOrder.size / 3)).foreach { b =>
      source.addData(b: _*); q.processAllAvailable()
    } finally q.stop()

    assert(got.sortBy(t => (t._1, t._2)).toSeq == expected,
      s"stream emitted ${got.size} rows vs batch ${expected.size}")
  }

  test("an idle user's window state expires at the TTL: the rolling " +
    "buffer restarts instead of chaining across the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pat = Array(1.0, 2.0)
    def t(ms: Long) = new Timestamp(ms)
    val source = MemoryStream[(Long, Timestamp, Long, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = StreamingPatternSearch.scores(
        source.toDS().toDF("user_id", "ts", "event_id", "value"),
        pat, "0 seconds", stateTtlMs = 1000)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("pat_ttl_ckpt").toString)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[PatternScore], _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(s => (s.user_id, s.end_ms, s.sim))
        }; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      // two events fill the 2-window and emit once
      source.addData((7L, t(1000), 0L, 3.0), (7L, t(2000), 1L, 4.0))
      q.processAllAvailable()
      // long idle gap >> ttl: the user's state times out...
      source.addData((8L, t(100000), 2L, 1.0))
      q.processAllAvailable()
      // ...so this event starts a FRESH buffer: no window spans the gap
      source.addData((7L, t(101000), 3L, 5.0))
      q.processAllAvailable()
      source.addData((7L, t(102000), 4L, 6.0))
      q.processAllAvailable()
    } finally q.stop()
    val u7 = got.filter(_._1 == 7L).sortBy(_._2)
    assert(u7.map(_._2) == Seq(2000L, 102000L),
      s"exactly the pre-gap and post-gap FULL windows may emit: $got")
  }
}
