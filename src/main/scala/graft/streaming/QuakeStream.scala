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
    *
    * `maxFilesPerTrigger = 1` is load-bearing for the snapshot sinks:
    * one landed file IS one snapshot, and the expiry contract compares
    * consecutive snapshots. Without it, `Trigger.AvailableNow` after
    * downtime would merge every pending file into ONE micro-batch whose
    * id set is the union of several snapshots — ids dropped between the
    * merged snapshots would be treated as still live (and resubmitted).
    * AvailableNow honors the cap by draining the backlog one file per
    * batch.
    */
  def featureStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(FeatureCollectionSchema)
      .option("multiLine", "true")
      .option("maxFilesPerTrigger", "1")
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

  /** [[submitEachSnapshot]] plus the sink's CUMULATIVE expiry contract
    * (J2, task.ts:195-203 comment): a long-running CloudTAK consumer
    * holds the set of currently-live feature ids across every snapshot it
    * has seen; when a snapshot arrives, ids live-but-absent are expired —
    * once, in exactly the batch where they first go missing. The batch
    * API ([[QuakePipeline.expiredIds]]) compares two frames the caller
    * holds; a streaming query must carry that "previous snapshot" itself,
    * ACROSS micro-batches and across restarts — an in-memory `var` would
    * silently forget the live set on every restart and never expire ids
    * dropped while the query was down.
    *
    * State: the live-id set is written under
    * `checkpointDir/expiry-state/<batchId>.ids` after each batch; a batch
    * reads the newest state OLDER than itself, so a replayed batch (crash
    * after state write, before checkpoint commit) recomputes the same
    * expired set against the same baseline and overwrites its own state —
    * idempotent. Set size is snapshot-sized (one API response, ~100
    * features — task.ts:176), so driver-side text files are the honest
    * scale match; an unbounded id universe would move this to the
    * `flatMapGroupsWithState` machinery in [[EventStreaming.expireStale]].
    *
    * @param onExpired invoked once per batch with the ids this snapshot
    *                  expired (empty on batch 0 and on no-change batches)
    */
  def submitWithExpiry(cot: DataFrame, url: String,
      transport: graft.sources.HttpTransport, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      onExpired: (Long, Seq[String]) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stateDir = new java.io.File(checkpointDir, "expiry-state")
    cot.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // one action: a foreachBatch frame is recomputed per action, so
        // collecting ids separately would run the whole batch twice
        val (fcJson, _, ids) = QuakePipeline.snapshotWithIds(batch.toDF())
        val current = ids.toSet
        val live = readLiveIds(stateDir, batchId)
        val expired = (live -- current).toSeq.sorted
        graft.sources.GeoNetHttp.submit(transport, url, fcJson)
        onExpired(batchId, expired)
        writeLiveIds(stateDir, batchId, current)
      }
      .trigger(trigger)
      .start()
  }

  /** Live ids as of the newest committed batch strictly before `batchId`
    * (empty on the very first batch).
    */
  private def readLiveIds(stateDir: java.io.File,
      batchId: Long): Set[String] = {
    val prior = Option(stateDir.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (n.endsWith(".ids"))
          n.stripSuffix(".ids").toLongOption.filter(_ < batchId).map(_ -> f)
        else None
      }
    if (prior.isEmpty) Set.empty
    else {
      val src = scala.io.Source.fromFile(prior.maxBy(_._1)._2, "UTF-8")
      try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    }
  }

  private def writeLiveIds(stateDir: java.io.File, batchId: Long,
      ids: Set[String]): Unit = {
    stateDir.mkdirs()
    val tmp = new java.io.File(stateDir, s"$batchId.tmp")
    java.nio.file.Files.writeString(tmp.toPath,
      ids.toSeq.sorted.mkString("\n"))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(stateDir, s"$batchId.ids").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // prune: batch N+1 reads the newest file < N+1 (= N) and a REPLAY of
    // batch N reads the newest < N (= N-1); anything older is dead and
    // would otherwise accumulate one file per micro-batch forever
    Option(stateDir.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n.endsWith(".ids") &&
          n.stripSuffix(".ids").toLongOption.exists(_ < batchId - 1))
        f.delete()
    }
  }
}
