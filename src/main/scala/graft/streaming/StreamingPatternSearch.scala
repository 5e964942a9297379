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
  * window; a full window is scored against the fixed pattern and
  * emitted — continuous shape/momentum screening without re-running
  * the batch window pass per shard.
  *
  * Shape: `flatMapGroupsWithState` keyed by `user_id`. State holds the
  * tail as `(ts, event_id, value)` TUPLES, kept sorted by the batch
  * engine's total order `(ts, event_id)`; arrivals are merge-sorted
  * in, so a within-watermark event landing in a LATER micro-batch
  * still takes its correct position (round-8 verdict #2: the previous
  * value-only buffer appended late arrivals after newer values, so
  * stream ≡ batch held only for in-order streams).
  *
  * Emission is ON FINALITY — the watermark discipline Append-mode
  * stateful ops use: a window ending at event `e` is emitted only once
  * the watermark has passed `e.ts`, because from then on the engine
  * drops any arrival that could sort at-or-before `e` (same-`ts`
  * arrivals included — the tie-break is `event_id`, so `e` is final
  * only when its whole `ts` is closed). An emission FRONTIER
  * `(ts, event_id)` in state guarantees exactly-once per window; the
  * already-final prefix is pruned to the `w−1` observations future
  * windows can still reach back into, so state is O(w + in-flight
  * disorder) per active user — bounded by the watermark delay × the
  * user's event rate, never by stream length. The event-time timeout
  * both expires idle users (TTL) and FLUSHES their remaining windows:
  * at timeout the watermark has passed everything buffered (proof in
  * the emit call below), so the flush emits only final windows.
  *
  * Within and across micro-batches the emitted scores are bit-equal to
  * the batch q96 scored frame, in-order or not (spec-pinned — the
  * scoring loop reproduces [[graft.functions.CosineSimilarity]]'s
  * exact index-ordered accumulation, so the float results are
  * identical, not approximately equal). Watermark-late rows are
  * dropped by the engine like every stateful op here — that drop is
  * precisely what makes the finality rule sound.
  */
object StreamingPatternSearch {

  /** A buffered observation: (tsMs, event_id, value). */
  private type Obs = (Long, Long, Double)

  /** Keyed state: (sorted tail buffer, last event-time seen,
    * emission-frontier ts, emission-frontier event_id).
    */
  private type Tail = (Seq[Obs], Long, Long, Long)

  /** @param events        streaming frame with `user_id, ts, event_id,
    *                      value`
    * @param pattern       the fixed pattern vector; window size = its
    *                      length
    * @param watermarkDelay max event-time lateness admitted; also the
    *                      emission latency bound (a window emits once
    *                      the watermark passes its end)
    * @param stateTtlMs    a user's window state expires this long after
    *                      their last event (event time); expiry flushes
    *                      their remaining final windows
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
      .flatMapGroupsWithState[Tail, PatternScore](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, obs: Iterator[ValueObs], state: GroupState[Tail]) =>
          val (buf0, lastSeen0, fTs0, fId0) = state.getOption.getOrElse(
            (Seq.empty[Obs], Long.MinValue, Long.MinValue, Long.MinValue))

          // Emit every window whose end is past the frontier AND final
          // (end ts < finalBefore), ascending; return the new frontier.
          def emit(buf: IndexedSeq[Obs], finalBefore: Long)
              : (Seq[PatternScore], Long, Long) = {
            val out = Seq.newBuilder[PatternScore]
            var nTs = fTs0; var nId = fId0
            var i = w - 1
            while (i < buf.length) {
              val (ts, id, _) = buf(i)
              val afterFrontier = ts > fTs0 || (ts == fTs0 && id > fId0)
              if (afterFrontier && ts < finalBefore) {
                val vals = Array.tabulate(w)(j => buf(i - w + 1 + j)._3)
                out += PatternScore(uid, ts, cosine(vals, pattern))
                nTs = ts; nId = id
              }
              i += 1
            }
            (out.result(), nTs, nId)
          }

          if (state.hasTimedOut) {
            // Flush is final-only: the timeout fired because watermark ≥
            // timeoutTimestamp, and that timestamp was set to at least
            // lastSeen+ttl (> every buffered ts) or wm+1 with
            // lastSeen ≤ wm (ditto) — so the watermark has passed the
            // whole buffer and every remaining window is final.
            val (flushed, _, _) = emit(buf0.toIndexedSeq, Long.MaxValue)
            state.remove()
            flushed.iterator
          } else {
            val arrivals = obs
              .map(o => (o.ts.getTime, o.event_id, o.value)).toArray
            // merge-sort late-but-admissible arrivals into position; the
            // region at-or-before the frontier is immutable (any arrival
            // sorting there would be below the watermark → dropped), so
            // emitted windows can never be perturbed
            val merged = (buf0 ++ arrivals)
              .sortBy(o => (o._1, o._2)).toIndexedSeq
            val wm = state.getCurrentWatermarkMs()
            val (scores, nTs, nId) = emit(merged, wm)
            // prune: future windows reach back at most w−1 observations
            // past the frontier; keep those plus the still-open region
            val (done, open) = merged.partition(o =>
              o._1 < nTs || (o._1 == nTs && o._2 <= nId))
            val kept = done.takeRight(w - 1) ++ open
            val lastSeen = math.max(lastSeen0, arrivals.iterator.map(_._1).max)
            state.update((kept, lastSeen, nTs, nId))
            state.setTimeoutTimestamp(math.max(lastSeen + stateTtlMs, wm + 1))
            scores.iterator
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
