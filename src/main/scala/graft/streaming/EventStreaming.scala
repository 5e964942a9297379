package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.money

/** A keyed observation in the expiry stream. */
case class KeyedObs(id: String, ts: Timestamp)

/** Emitted when a key goes stale (J2 semantics, task.ts:195-203). */
case class Expired(id: String, last_seen: Timestamp)

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

  /** Sliding 10-minute windows every 5 minutes (the q81 shape) with the
    * same 30-minute watermark: each event updates its span/slide = 2
    * covering windows; state is bounded by (watermark + span)/slide
    * open windows per event_type.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
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

  /** Stateful stale-key expiry via `flatMapGroupsWithState` — the
    * streaming form of the reference sink's snapshot-expiry contract
    * (task.ts:195-203: a previously published id that stops appearing is
    * expired) combined with its per-feature stale TTL (task.ts:221).
    *
    * Per key the state holds only the last-seen event time; an event-time
    * timeout at lastSeen + staleMs fires once the watermark passes it and
    * emits one [[Expired]] record, then drops the state — so state size is
    * O(live keys), bounded regardless of stream length.
    */
  def expireStale(events: Dataset[KeyedObs], staleMs: Long): Dataset[Expired] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.id)
      .flatMapGroupsWithState[Timestamp, Expired](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id: String, obs: Iterator[KeyedObs], state: GroupState[Timestamp]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(Expired(id, last))
          } else {
            val newest = obs.map(_.ts).maxBy(_.getTime)
            val last = state.getOption.fold(newest)(cur =>
              if (cur.after(newest)) cur else newest)
            state.update(last)
            state.setTimeoutTimestamp(last.getTime + staleMs)
            Iterator.empty
          }
      }
  }
}
