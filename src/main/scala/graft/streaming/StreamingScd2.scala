package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One FINALIZED SCD2 segment — q176's segment-grain row; `valid_to_ms`
  * is None only on a key's current (still-open-at-end-of-stream)
  * segment.
  */
case class Scd2Segment(user_id: Long, event_type: String,
    valid_from_ms: Long, n_events: Long, valid_to_ms: Option[Long])

/** SCD TYPE-2 dimension maintenance (q176's semantics) as a keyed
  * streaming state machine — dimension-on-ingest with per-key state
  * bounded at O(1 + in-flight disorder):
  *
  *  - Events strictly below the watermark are FINAL IN POSITION: every
  *    future arrival has `ts ≥ wm` (the spool is watermark-consistent,
  *    the q100/q159 discipline), so nothing can ever sort between two
  *    below-watermark events again. Folding finalized events in
  *    `(ms, event_id)` order into the single OPEN RUN — extend on equal
  *    attribute value, close-and-emit on change (`valid_to` = the new
  *    run's start, exactly the batch `lead`) — is therefore lossless.
  *  - State = ONE open-run summary `(type, valid_from, n)` plus the
  *    not-yet-final buffer (`ms ≥ wm` — the disorder horizon). The
  *    whole history below the watermark lives in emitted output and a
  *    3-field summary, never in state; compare q144's unwindowed funnel,
  *    where unbounded state is PROVEN unavoidable — here the run fold's
  *    prefix-summarizability is what buys the O(1 + disorder) bound.
  *  - A closed segment emits exactly once (append mode; the
  *    batchId-keyed sink makes replays idempotent); the event-time
  *    timeout flushes each key's buffered tail and its final open
  *    segment (valid_to = None) once the watermark has passed
  *    everything.
  *
  * Emitted segments union to q176's batch dimension VERBATIM for any
  * batching of the stream — the hash gate holds it (oracle = q176Sql),
  * and the run fold is property-spec'd lossless under randomized
  * watermark-consistent disorder (Scd2StreamSpec).
  */
object StreamingScd2 {

  /** The open run: attribute value, segment start, events so far. */
  private[graft] case class Run(tpe: String, from: Long, n: Long)

  /** Keyed state: (open run, buffered `(ms, event_id, type)` events at
    * or above the watermark, last event-time seen).
    */
  private type SState = (Option[Run], Seq[(Long, Long, String)], Long)

  /** Fold a block of FINALIZED events (each strictly below the
    * watermark at fold time) into the open run. Events MUST be in
    * `(ms, event_id)` order — callers sort the block; cross-batch order
    * holds because batch k's finals are all `< wm_k` and batch k+1's
    * arrivals are all `≥ wm_k`. Returns the segments this block CLOSED
    * plus the new open run. Pure — the property spec drives it through
    * randomized batched disorder.
    */
  private[graft] def foldFinal(uid: Long, open: Option[Run],
      finals: Seq[(Long, Long, String)])
      : (Seq[Scd2Segment], Option[Run]) = {
    var cur = open
    val out = Seq.newBuilder[Scd2Segment]
    finals.foreach { case (ms, _, tpe) =>
      cur match {
        case Some(r) if r.tpe == tpe => cur = Some(r.copy(n = r.n + 1))
        case Some(r) =>
          out += Scd2Segment(uid, r.tpe, r.from, r.n, Some(ms))
          cur = Some(Run(tpe, ms, 1))
        case None => cur = Some(Run(tpe, ms, 1))
      }
    }
    (out.result(), cur)
  }

  def segments(events: DataFrame, watermarkDelay: String, stateTtlMs: Long)
      : Dataset[Scd2Segment] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SState, Scd2Segment](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, obs: Iterator[(Long, Timestamp, Long, String)],
            state: GroupState[SState]) =>
          if (state.hasTimedOut) {
            // wm has passed everything buffered: fold the tail, then
            // the open run is this key's current segment
            val (open0, buf, _) = state.get
            state.remove()
            val (closed, open) =
              foldFinal(uid, open0, buf.sortBy(e => (e._1, e._2)))
            (closed ++ open.map(r =>
              Scd2Segment(uid, r.tpe, r.from, r.n, None))).iterator
          } else {
            val (open0, buf0, lastSeen0) = state.getOption.getOrElse(
              (None, Seq.empty[(Long, Long, String)], Long.MinValue))
            var lastSeen = lastSeen0
            val nb = Seq.newBuilder[(Long, Long, String)]
            obs.foreach { case (_, ts, id, tpe) =>
              val t = ts.getTime
              lastSeen = math.max(lastSeen, t)
              nb += ((t, id, tpe))
            }
            val wm = state.getCurrentWatermarkMs()
            val (finals, buf) =
              (buf0 ++ nb.result()).partition(_._1 < wm)
            val (closed, open) =
              foldFinal(uid, open0, finals.sortBy(e => (e._1, e._2)))
            state.update((open, buf, lastSeen))
            state.setTimeoutTimestamp(math.max(lastSeen + stateTtlMs, wm + 1))
            closed.iterator
          }
      }
  }
}
