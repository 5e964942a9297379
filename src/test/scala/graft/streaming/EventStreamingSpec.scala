package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Streaming semantics under MemoryStream: the same transforms that pass
  * the batch oracle (q20/q21) run incrementally with watermark state.
  */
class EventStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  private def runStream(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String, mode: String)(batches: Seq[Ev]*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Ev]
    val q = transform(source.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    batches.foreach { b => source.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("windowedCounts: incremental tumbling windows match batch result") {
    val evs = Seq(
      Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(5), 1, "click", 2.0),
      Ev(3, ts(12), 2, "view", 3.0), Ev(4, ts(25), 1, "click", 4.0))
    val streamed = runStream(EventStreaming.windowedCounts, "wc", "complete")(evs)
    import spark.implicits._
    val batch = EventStreaming.windowedCounts(evs.toDF())
    assert(streamed.collect().toSet == batch.collect().toSet)
    assert(streamed.count() == 3) // windows 00:00, 00:10, 00:20
  }

  test("slidingCounts: incremental overlapping windows match batch, " +
    "each event lands in exactly two") {
    val evs = Seq(
      Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(7), 1, "click", 2.0),
      Ev(3, ts(12), 2, "view", 3.0))
    val streamed = runStream(EventStreaming.slidingCounts, "slc", "complete")(
      evs.take(2), evs.drop(2))
    import spark.implicits._
    val batch = EventStreaming.slidingCounts(evs.toDF())
    assert(streamed.collect().toSet == batch.collect().toSet)
    // span/slide = 2 covering windows per event
    assert(streamed.agg(org.apache.spark.sql.functions.sum("n"))
      .collect().head.getLong(0) == evs.size * 2)
  }

  test("dedupeByKey drops re-delivered events across micro-batches") {
    val b1 = Seq(Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(2), 1, "view", 2.0))
    val b2 = Seq(Ev(1, ts(1), 1, "click", 1.0), Ev(3, ts(3), 2, "click", 3.0))
    val out = runStream(EventStreaming.dedupeByKey, "dd", "append")(b1, b2)
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("sessionCounts groups gap-separated activity into sessions") {
    // user 1: events at 00:01, 00:05 (one session), then 01:40 (new session,
    // gap > 30 min); a 03:00 event advances the watermark past both.
    val evs = Seq(
      Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(5), 1, "click", 1.0),
      Ev(3, Timestamp.valueOf("2024-01-01 01:40:00"), 1, "click", 1.0),
      Ev(4, Timestamp.valueOf("2024-01-01 03:00:00"), 2, "click", 1.0))
    val out = runStream(EventStreaming.sessionCounts, "sc", "complete")(evs)
    val u1 = out.filter("user_id = 1").collect()
    assert(u1.length == 2)
    assert(u1.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }
}
