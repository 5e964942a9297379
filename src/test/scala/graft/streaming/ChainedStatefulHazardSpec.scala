package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{Column, DataFrame}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the two empirically-verified 4.1.2 hazards q239's scaladoc
  * documents — as executable claims, so a Spark upgrade that changes
  * either behavior flags the assumption instead of silently shifting
  * under the shipped query:
  *
  *  1. a TIME-INTERVAL stream-stream join followed by a windowed
  *     aggregation runs WITHOUT ERROR and silently LOSES DATA — the
  *     join's output event time is unbounded relative to the
  *     watermark, so pairs arrive "late" at the aggregation and only
  *     a straggler subset of windows ever emits (2 of 32 on this
  *     fixture) — if a future Spark makes this compose correctly,
  *     this spec turns red and q239 can adopt the interval form;
  *  2. the window-equality form of the same chain (q239's shipped
  *     shape) flushes EXACTLY the batch-computed window set.
  */
class ChainedStatefulHazardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def side(dir: String, delayMs: Long, t: String,
      prefix: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .filter(col("event_type").isin(t, "sentinel"))
      .select(col("user_id").as(s"${prefix}_uid"),
        col("ts").as(s"${prefix}_ts"),
        col("event_id").as(s"${prefix}_eid"))
      .withWatermark(s"${prefix}_ts", s"$delayMs milliseconds")

  private def runChain(tag: String, chained: DataFrame): Long = {
    val ckpt = Files.createTempDirectory(s"graft_chain_$tag").toString
    var emitted = 0L
    chained.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emitted += batch.count()
      }
      .start().awaitTermination()
    emitted
  }

  /** The batch truth: distinct same-hour (view, purchase) windows. */
  private def batchWindowCount: Long = {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        (unix_millis(col("ts")).divide(3600000)).cast("long").as("hr"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("hr"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("hr"))
    v.join(p, Seq("user_id", "hr")).select("hr").distinct().count()
  }

  test("time-interval join → windowed agg runs without error and " +
    "silently LOSES DATA on 4.1.2 — the restriction q239 designs around") {
    val sp = StreamingQueries.eventSpool(spark, sf)
    val v = side(sp.dir, sp.delayMs, "view", "v")
    val p = side(sp.dir, sp.delayMs, "purchase", "p")
    val interval = v.join(p,
        col("v_uid") === col("p_uid") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "inner")
      .groupBy(window(col("p_ts"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))
    val emitted = runChain("interval", interval)
    val expectedFloor = batchWindowCount
    assert(emitted < expectedFloor,
      s"4.1.2 behavior changed: the interval-join chain emitted $emitted " +
        s"windows (interval truth is at least the $expectedFloor same-hour " +
        "windows) — re-evaluate q239's window-equality workaround")
  }

  test("window-equality join → windowed agg (q239's shape) flushes " +
    "EXACTLY the batch-computed window set") {
    val rows = StreamingQueries.queries("q239_join_agg_chain")(spark, sf)
      .count()
    assert(rows == batchWindowCount)
  }
}
