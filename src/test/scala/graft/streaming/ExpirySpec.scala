package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stateful stale-key expiry (flatMapGroupsWithState + event-time
  * timeout) — the streaming form of the sink's snapshot-expiry contract.
  */
class ExpirySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("keys that stop appearing expire once the watermark passes their TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[KeyedObs]
    val q = EventStreaming
      .expireStale(source.toDS(), staleMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("expiry")
      .outputMode("append").start()

    // batch 1: A and B alive at t0
    source.addData(Seq(KeyedObs("A", t(0)), KeyedObs("B", t(0))))
    q.processAllAvailable()
    assert(spark.table("expiry").count() == 0)

    // batch 2: only B refreshes at t+10min -> watermark reaches t+10,
    // A's timeout (t0+5min) has passed -> A expires; B's TTL renewed
    source.addData(Seq(KeyedObs("B", t(10))))
    q.processAllAvailable()
    // one more batch so the timeout fires against the advanced watermark
    source.addData(Seq(KeyedObs("B", t(11))))
    q.processAllAvailable()

    val expired = spark.table("expiry").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    q.stop()
    assert(expired.toSeq == Seq(("A", t(0))))
  }
}
