package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One attribution verdict: q156's row, emitted per purchase. */
case class AttributionRow(user_id: Long, purchase_id: Long,
    touch_id: Option[Long], latency_ms: Option[Long])

/** LAST-TOUCH attribution (q156's semantics) as a keyed streaming state
  * machine — attribution-on-ingest with per-user state bounded at
  * O(1 + in-flight disorder):
  *
  *  - TOUCHES (views/clicks): a future purchase has `ts ≥ wm` (the
  *    engine drops later-than-watermark arrivals), and its attributed
  *    touch is the MAXIMUM touch preceding it in `(ms, event_id)`
  *    order — so among touches with `ms < wm` only the maximum can
  *    ever win again (any other is dominated by it for every future
  *    purchase), and it alone survives; touches with `ms ≥ wm` are
  *    retained individually until the watermark passes them. State =
  *    one best-so-far pair plus the disorder horizon's touches.
  *  - PURCHASES buffer until FINAL: purchase p's verdict can change
  *    while a preceding touch can still arrive, i.e. while `wm ≤
  *    p.ms`; once `wm > p.ms` every future arrival sorts after p and
  *    the verdict emits exactly once (the batchId-keyed sink makes
  *    replays idempotent). The event-time timeout flushes the rest at
  *    end-of-stream, where the watermark has passed everything.
  *
  * The emitted rows union to q156's batch output VERBATIM for any
  * batching of the stream — the hash gate holds it, and the retention
  * rule is property-spec'd lossless under randomized
  * watermark-consistent disorder (StreamingAttributionSpec).
  */
object StreamingAttribution {

  /** Keyed state: (best below-watermark touch (ms, id) or
    * (MinValue, MinValue), retained touches, pending purchases,
    * last event-time seen).
    */
  private type AState =
    ((Long, Long), Seq[(Long, Long)], Seq[(Long, Long)], Long)

  private val NoTouch = (Long.MinValue, Long.MinValue)

  /** Strict `(ms, id)` total order. */
  private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** The verdict for one purchase against the retained touches —
    * q156's algebra: latest strictly-preceding touch, null if outside
    * the lookback window. Exposed pure for the property spec.
    */
  private[graft] def verdict(uid: Long, p: (Long, Long), best: (Long, Long),
      touches: Seq[(Long, Long)], windowMs: Long): AttributionRow = {
    val cands = (best +: touches).filter(t => t != NoTouch && before(t, p))
    if (cands.isEmpty) AttributionRow(uid, p._2, None, None)
    else {
      val t = cands.max
      if (p._1 - t._1 <= windowMs)
        AttributionRow(uid, p._2, Some(t._2), Some(p._1 - t._1))
      else AttributionRow(uid, p._2, None, None)
    }
  }

  /** The retention fold, exposed pure for the property spec: merge new
    * touches, then collapse everything below the watermark to its
    * maximum.
    */
  private[graft] def retainTouches(best: (Long, Long),
      touches: Seq[(Long, Long)], wm: Long)
      : ((Long, Long), Seq[(Long, Long)]) = {
    val (below, above) = touches.partition(_._1 < wm)
    val nbest = (best +: below).max
    (nbest, above)
  }

  def attribute(events: DataFrame, windowMs: Long, watermarkDelay: String,
      stateTtlMs: Long): Dataset[AttributionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AState, AttributionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, obs: Iterator[(Long, Timestamp, Long, String)],
            state: GroupState[AState]) =>
          if (state.hasTimedOut) {
            // wm has passed everything retained: every pending verdict
            // is final
            val (best, touches, pending, _) = state.get
            state.remove()
            pending.sorted.iterator
              .map(p => verdict(uid, p, best, touches, windowMs))
          } else {
            val (best0, touches0, pending0, lastSeen0) =
              state.getOption.getOrElse(
                (NoTouch, Seq.empty[(Long, Long)], Seq.empty[(Long, Long)],
                  Long.MinValue))
            var lastSeen = lastSeen0
            val newTouches = Seq.newBuilder[(Long, Long)]
            val newPurch = Seq.newBuilder[(Long, Long)]
            obs.foreach { case (_, ts, id, tpe) =>
              val t = ts.getTime
              lastSeen = math.max(lastSeen, t)
              tpe match {
                case "view" | "click" => newTouches += ((t, id))
                case "purchase" => newPurch += ((t, id))
                case _ => ()
              }
            }
            val wm = state.getCurrentWatermarkMs()
            val touchesAll = touches0 ++ newTouches.result()
            // purchases with ms < wm are FINAL: no future arrival can
            // precede them — attribute against the full retained set,
            // BEFORE pruning
            val (done, pending) =
              (pending0 ++ newPurch.result()).partition(_._1 < wm)
            val out = done.sorted
              .map(p => verdict(uid, p, best0, touchesAll, windowMs))
            val (best, touches) = retainTouches(best0, touchesAll, wm)
            state.update((best, touches, pending, lastSeen))
            state.setTimeoutTimestamp(math.max(lastSeen + stateTtlMs, wm + 1))
            out.iterator
          }
      }
  }
}
