package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event's value observation in a per-user series. */
case class ValueObs(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

/** A scored sliding window ending at `end_ms` for `user_id`. */
case class PatternScore(user_id: Long, end_ms: Long, sim: Double)

/** Streaming time-series PATTERN search — q96's online form (the
  * retrieved papers' actual setting: similarity search over STREAMING
  * series). Every arriving event extends its user's rolling value
  * window; once the window is full it is scored against the fixed
  * pattern and emitted — continuous shape/momentum screening without
  * re-running the batch window pass per shard.
  *
  * Shape: `flatMapGroupsWithState` keyed by `user_id` holds the last
  * `pattern.length − 1` values plus the newest event time — O(W)
  * doubles per active user, duplicate- and volume-insensitive — with an
  * event-time timeout dropping users idle longer than `stateTtlMs`, so
  * unbounded streams hold bounded state (the [[StreamingNearDup]]
  * discipline). Within a micro-batch, a user's arrivals are processed
  * in `(ts, event_id)` order, so emissions do not depend on
  * partitioning; across IN-ORDER batches the emitted scores are
  * bit-equal to the batch q96 scored frame (spec-pinned — the scoring
  * loop reproduces [[graft.functions.CosineSimilarity]]'s exact
  * index-ordered accumulation, so the float results are identical, not
  * approximately equal). Watermark-late rows are dropped by the engine
  * like every stateful op here.
  */
object StreamingPatternSearch {

  /** @param events        streaming frame with `user_id, ts, event_id,
    *                      value`
    * @param pattern       the fixed pattern vector; window size = its
    *                      length
    * @param watermarkDelay max event-time lateness admitted
    * @param stateTtlMs    a user's window state expires this long after
    *                      their last event (event time)
    */
  def scores(events: DataFrame, pattern: Array[Double],
      watermarkDelay: String, stateTtlMs: Long): Dataset[PatternScore] = {
    import events.sparkSession.implicits._
    val w = pattern.length
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[ValueObs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Seq[Double], Long), PatternScore](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, obs: Iterator[ValueObs],
            state: GroupState[(Seq[Double], Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val arrivals = obs.toArray.sortBy(o => (o.ts.getTime, o.event_id))
            var (buf, lastSeen) = state.getOption.getOrElse((Seq.empty[Double], 0L))
            val out = Array.newBuilder[PatternScore]
            arrivals.foreach { o =>
              buf = (buf :+ o.value).takeRight(w)
              if (buf.size == w)
                out += PatternScore(o.user_id, o.ts.getTime,
                  cosine(buf.toArray, pattern))
            }
            lastSeen = math.max(lastSeen, arrivals.map(_.ts.getTime).max)
            state.update((buf, lastSeen))
            state.setTimeoutTimestamp(math.max(
              lastSeen + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  /** EXACTLY [[graft.functions.CosineSimilarity]]'s accumulation: one
    * index-ordered pass over xy/xx/yy, then xy / (√xx · √yy) — bit-equal
    * to the batch expression, which is what lets the spec pin stream ≡
    * batch with `==` on doubles.
    */
  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }
}
