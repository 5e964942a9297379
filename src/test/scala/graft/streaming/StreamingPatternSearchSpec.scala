package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Stream ≡ batch for the pattern-search tier: events through the keyed
  * state machine — in-order or with late-but-admissible cross-batch
  * arrivals — emit EXACTLY q96's scored frame, `==` on doubles, no
  * tolerance (the state-side scoring loop reproduces the batch
  * expression's accumulation order). Emission is on FINALITY (watermark
  * past the window end, or state-expiry flush), so each test closes the
  * stream with a watermark-advancing sentinel event for a user that
  * never fills a window.
  */
class StreamingPatternSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001
  private val Ramp = (1 to 8).map(_.toDouble).toArray

  /** Batch q96's scored frame (pre-LIMIT) over a static frame. */
  private def batchScores(ev: org.apache.spark.sql.DataFrame,
      pattern: Array[Double]): Seq[(Long, Long, Double)] = {
    val win = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-(pattern.length - 1), Window.currentRow)
    ev.withColumn("win", collect_list(col("value")).over(win))
      .filter(size(col("win")) === pattern.length)
      .select(col("user_id"), unix_millis(col("ts")).as("end_ms"),
        graft.functions.VectorFunctions
          .cosineSimilarity(col("win"), typedlit(pattern.toSeq)).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  /** Run batches through the streaming engine, then a sentinel event at
    * `flushTs` (user −1, which never fills a window) to advance the
    * watermark past every user's timeout so their final windows flush.
    */
  private def runStream(batches: Seq[Seq[(Long, Timestamp, Long, Double)]],
      pattern: Array[Double], delay: String, ttlMs: Long, flushTs: Long)
      : Seq[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, Long, Double)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val q = StreamingPatternSearch.scores(
        source.toDS().toDF("user_id", "ts", "event_id", "value"),
        pattern, delay, ttlMs)
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
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      source.addData((-1L, new Timestamp(flushTs), Long.MaxValue, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    got.filter(_._1 != -1L).sortBy(t => (t._1, t._2)).toSeq
  }

  test("in-order streamed events emit the exact batch q96 scored frame " +
    "(whole corpus, split across micro-batches)") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val expected = batchScores(ev, Ramp)
    assert(expected.nonEmpty)

    val inOrder = ev.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._2.getTime, t._3)).toSeq
    val maxTs = inOrder.map(_._2.getTime).max
    val ttl = 365L * 24 * 3600 * 1000
    val got = runStream(
      inOrder.grouped(math.max(1, inOrder.size / 3)).toSeq,
      Ramp, "10 minutes", ttl, maxTs + ttl + 24L * 3600 * 1000)
    assert(got == expected,
      s"stream emitted ${got.size} rows vs batch ${expected.size}")
  }

  test("a late-but-admissible event arriving in a LATER micro-batch is " +
    "merge-sorted into position: emissions still bit-equal batch q96") {
    import spark.implicits._
    val pat = Array(1.0, 2.0, 3.0)
    def t(ms: Long) = new Timestamp(ms)
    // user 1's series 1s..5s; 4s is withheld from batch 1 and delivered
    // in batch 2 — admissible (watermark delay 1 hour), but under the
    // old value-buffer design it would have been APPENDED after 5s and
    // every window it belongs to would score wrong values
    val all = Seq(
      (1L, t(1000), 10L, 2.0), (1L, t(2000), 11L, 4.0),
      (1L, t(3000), 12L, 6.0), (1L, t(4000), 13L, 8.0),
      (1L, t(5000), 14L, 1.0))
    val batches = Seq(all.filterNot(_._3 == 13L), all.filter(_._3 == 13L))
    val expected = batchScores(
      all.toDF("user_id", "ts", "event_id", "value"), pat)
    assert(expected.map(_._2) == Seq(3000L, 4000L, 5000L))
    val got = runStream(batches, pat, "1 hour",
      ttlMs = 3600 * 1000, flushTs = 5000 + 3L * 3600 * 1000)
    assert(got == expected)
  }

  test("same-timestamp events split across batches keep the event_id " +
    "tie-break: the window order is total, not arrival order") {
    import spark.implicits._
    val pat = Array(1.0, 2.0)
    def t(ms: Long) = new Timestamp(ms)
    // two events share ts=2000; the SMALLER event_id arrives LATER —
    // finality must wait until the watermark passes the whole ts, then
    // order them 20 before 21
    val all = Seq(
      (1L, t(1000), 19L, 5.0), (1L, t(2000), 20L, 7.0),
      (1L, t(2000), 21L, 3.0), (1L, t(3000), 22L, 9.0))
    val batches = Seq(all.filterNot(_._3 == 20L), all.filter(_._3 == 20L))
    val expected = batchScores(
      all.toDF("user_id", "ts", "event_id", "value"), pat)
    val got = runStream(batches, pat, "1 hour",
      ttlMs = 3600 * 1000, flushTs = 3000 + 3L * 3600 * 1000)
    assert(got == expected)
  }

  test("randomized disorder sweep: arbitrary arrival shuffles cut into " +
    "arbitrary micro-batches all emit the exact batch scored frame " +
    "(seeded, 4 scenarios × 2 users with interleaved ties)") {
    import spark.implicits._
    val pat = Array(1.0, 2.0, 3.0)
    def t(ms: Long) = new Timestamp(ms)
    // two users, interleaved timestamps, one exact ts-tie per user
    val all = (0 until 10).map { i =>
      (1L + i % 2, t(1000L * (i / 2) + 1000), 100L + i, (i * 7 % 5) + 1.0)
    } ++ Seq((1L, t(3000), 200L, 9.0), (2L, t(4000), 201L, 2.5))
    val expected = batchScores(
      all.toDF("user_id", "ts", "event_id", "value"), pat)
    assert(expected.nonEmpty)
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { scenario =>
      val shuffled = rnd.shuffle(all)
      // random cut points -> 1..4 batches of random sizes
      val cuts = (Seq(0, shuffled.size) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(shuffled.size))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val got = runStream(batches, pat, "1 hour",
        ttlMs = 3600 * 1000, flushTs = 6000 + 3L * 3600 * 1000)
      assert(got == expected,
        s"scenario $scenario (batches ${batches.map(_.size)}) diverged")
    }
  }

  test("an idle user's window state expires at the TTL: the rolling " +
    "buffer restarts instead of chaining across the gap, and expiry " +
    "flushes the user's final windows") {
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
      // two events fill the 2-window; it emits at the expiry flush below
      source.addData((7L, t(1000), 0L, 3.0), (7L, t(2000), 1L, 4.0))
      q.processAllAvailable()
      // long idle gap >> ttl: the user's state times out (flushing the
      // pre-gap window)...
      source.addData((8L, t(100000), 2L, 1.0))
      q.processAllAvailable()
      // ...so this event starts a FRESH buffer: no window spans the gap
      source.addData((7L, t(101000), 3L, 5.0))
      q.processAllAvailable()
      source.addData((7L, t(102000), 4L, 6.0))
      q.processAllAvailable()
      // final watermark push so user 7's post-gap state expires too
      source.addData((9L, t(200000), 5L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val u7 = got.filter(_._1 == 7L).sortBy(_._2)
    assert(u7.map(_._2) == Seq(2000L, 102000L),
      s"exactly the pre-gap and post-gap FULL windows may emit: $got")
  }
}
