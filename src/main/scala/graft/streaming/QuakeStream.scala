package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quakes.QuakeModel.{FeatureCollectionSchema, QuakeConfig}
import graft.quakes.QuakePipeline

/** Structured-Streaming wrapper for the quake pipeline (SURVEY.md §2.8).
  *
  * The reference runs as a platform-scheduled batch (task.ts:143); the
  * streaming equivalent treats each fetched FeatureCollection file landing
  * in a directory as one micro-batch snapshot: `readStream` file source →
  * the exact same `QuakePipeline.transform` → per-batch snapshot handling
  * in `foreachBatch` (where the sink's update/expire contract lives).
  * `Trigger.AvailableNow` gives the scheduled-backfill behavior: process
  * everything that has landed, then stop — re-invocation is the schedule.
  *
  * At scale the landing directory is date-partitioned; the file source
  * tracks processed files in its checkpoint, so replays are exactly-once
  * per file.
  */
object QuakeStream {

  /** One row per GeoNet feature from every FeatureCollection file that
    * lands in `dir` (each file = one API response snapshot).
    */
  def featureStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(FeatureCollectionSchema)
      .option("multiLine", "true")
      .json(dir)
      .select(explode(col("features")).as("feature"))
      .select(col("feature.*"))

  /** The full streaming pipeline: landed snapshots → CoT features. */
  def cotStream(spark: SparkSession, dir: String, cfg: QuakeConfig,
      nowMs: Long): DataFrame =
    QuakePipeline.transform(featureStream(spark, dir), cfg, nowMs)

  /** One row per GeoNet feature per fetched snapshot, via the `geonet`
    * source's micro-batch stream: every trigger performs one feed fetch
    * (or re-reads the `body`/`path` option). The reference's cron loop as
    * a continuous query.
    */
  def geonetStream(spark: SparkSession,
      options: Map[String, String]): DataFrame =
    spark.readStream.format("graft.sources.GeoNetTableProvider")
      .options(options).load()

  /** Streaming K1 (task.ts:251-256, continuous form): each micro-batch
    * snapshot is assembled into one FeatureCollection and POSTed through
    * the transport seam. `Trigger.AvailableNow` = one snapshot per
    * invocation (the reference's semantics); a processing-time trigger
    * polls the feed continuously. Checkpointed, so a restart resumes the
    * snapshot counter instead of double-submitting batch 0.
    */
  def submitEachSnapshot(cot: DataFrame, url: String,
      transport: graft.sources.HttpTransport, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    cot.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val (fcJson, _) = QuakePipeline.snapshot(batch.toDF())
        graft.sources.GeoNetHttp.submit(transport, url, fcJson)
      }
      .trigger(trigger)
      .start()
}
