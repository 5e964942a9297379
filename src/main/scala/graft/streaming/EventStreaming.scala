package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.money

/** Structured-Streaming surface (SURVEY.md §2.8).
  *
  * The reference is a scheduled full-snapshot micro-batch (task.ts:143):
  * each run refetches the whole lookback window and the sink expires
  * omitted ids. The streaming equivalents below are written as plain
  * `DataFrame => DataFrame` transforms so the SAME code runs in batch
  * (tested against the DuckDB oracle via q20/q21) and under
  * `readStream`/`writeStream` (tested with MemoryStream in
  * EventStreamingSpec). That one-definition-two-modes shape is the point:
  * at 100 TB the backfill is the batch run and the tail is the stream.
  */
object EventStreaming {

  /** Tumbling 10-minute counts with a 30-minute watermark: late events
    * beyond the watermark are dropped and window state is GC'd — bounded
    * state at any scale.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Session windows (30-minute gap) per user — state merges sessions as
    * events arrive; watermark closes and emits them.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Keyed dedup with watermark-bounded state — the streaming analog of
    * the reference's stable `earthquake-{publicID}` upsert key
    * (task.ts:213): re-delivery within the watermark is dropped.
    */
  def dedupeByKey(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicates("event_id")
}
