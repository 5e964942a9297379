package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event in a per-user funnel stream. */
case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** A user's final windowed-funnel verdict. */
case class FunnelRow(user_id: Long, s1_ms: Option[Long],
    s2_ms: Option[Long], s3_ms: Option[Long], reached: Long)

/** The WINDOWED funnel (q145's semantics) as a keyed streaming state
  * machine with BOUNDED per-user state — the thing q144's unwindowed
  * contract proves impossible: there, any click ≤ the current s2 must
  * be retained forever because an arbitrarily late earlier view can
  * re-open it. The conversion window W plus the watermark is what
  * closes that hole, and this operator holds exactly the events the
  * proof says are still reachable:
  *
  *  - views: only the MINIMUM is ever read → one value (`s1`).
  *  - clicks: the final first-view `s1_f = min(s1, future views)`, and
  *    the engine drops arrivals below the watermark, so every future
  *    view has `ts ≥ wm` and `s1_f ≥ L = min(s1, wm)`. A click
  *    qualifies iff `s1_f < c ≤ s1_f + W`, hence qualifying clicks lie
  *    in `(L, s1 + W]` — retained; everything at-or-below L or above
  *    `s1 + W` is pruned. The interval's width is ≤ (s1 − wm) + W:
  *    the conversion window plus the in-flight disorder horizon,
  *    EXACTLY the `O(w + disorder)` state class of
  *    [[StreamingPatternSearch]]. With no view yet, `s1_f ≥ wm`, so
  *    clicks ≤ wm prune (upper bound open until a view arrives —
  *    still disorder-bounded, since wm trails the max seen ts by the
  *    delay).
  *  - purchases: qualify iff `s2_f < p ≤ s1_f + W` with `s2_f > s1_f`,
  *    so the click retention rule is a (safe) superset.
  *  - any other event type contributes only user PRESENCE (q145's
  *    `users` frame is type-blind): state existence records it.
  *
  * Emission is ON FINALITY via the event-time timeout (the q100
  * discipline): the TTL exceeds the stream span and trailing sentinels
  * advance the watermark past every user's timeout at end-of-stream,
  * where the watermark has passed everything admissible — the verdict
  * computed from the retained sets equals the batch q145 verdict by
  * the retention proof, and the hash gate holds it.
  */
object StreamingFunnel {

  /** Keyed state: (s1 or MaxValue, retained click ts, retained
    * purchase ts, last event-time seen).
    */
  private type FState = (Long, Seq[Long], Seq[Long], Long)

  /** The retention rule, exposed pure for the property spec: given the
    * current minimum view (MaxValue = none), the watermark, and the
    * window, which candidate timestamps are still reachable?
    */
  private[graft] def retain(cands: Seq[Long], s1: Long, wm: Long,
      windowMs: Long): Seq[Long] =
    if (s1 == Long.MaxValue) cands.filter(_ > wm)
    else cands.filter(c => c > math.min(s1, wm) && c <= s1 + windowMs)

  /** The final verdict from a user's retained state — q145's algebra. */
  private[graft] def verdict(uid: Long, s1: Long, clicks: Seq[Long],
      purchases: Seq[Long], windowMs: Long): FunnelRow =
    if (s1 == Long.MaxValue) FunnelRow(uid, None, None, None, 0L)
    else {
      val s2 = clicks.filter(c => c > s1 && c <= s1 + windowMs)
        .minOption
      val s3 = s2.flatMap(v2 => purchases
        .filter(p => p > v2 && p <= s1 + windowMs).minOption)
      FunnelRow(uid, Some(s1), s2, s3,
        if (s3.isDefined) 3L else if (s2.isDefined) 2L else 1L)
    }

  /** @param events         streaming frame with `user_id, ts, event_type`
    * @param windowMs       the conversion window W
    * @param watermarkDelay max admitted event-time lateness
    * @param stateTtlMs     a user's verdict emits this long (event time)
    *                       after their last event
    */
  def funnel(events: DataFrame, windowMs: Long, watermarkDelay: String,
      stateTtlMs: Long): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, obs: Iterator[FunnelEvent], state: GroupState[FState]) =>
          if (state.hasTimedOut) {
            // watermark ≥ the timeout ≥ lastSeen + ttl > every retained
            // ts → nothing can arrive that the retention rule still
            // admits: the verdict is final
            val (s1, clicks, purchases, _) = state.get
            state.remove()
            Iterator.single(verdict(uid, s1, clicks, purchases, windowMs))
          } else {
            val (s10, clicks0, purchases0, lastSeen0) =
              state.getOption.getOrElse(
                (Long.MaxValue, Seq.empty[Long], Seq.empty[Long],
                  Long.MinValue))
            var s1 = s10
            val clicks = Seq.newBuilder[Long]
            val purchases = Seq.newBuilder[Long]
            var lastSeen = lastSeen0
            obs.foreach { e =>
              val t = e.ts.getTime
              lastSeen = math.max(lastSeen, t)
              e.event_type match {
                case "view" => s1 = math.min(s1, t)
                case "click" => clicks += t
                case "purchase" => purchases += t
                case _ => ()
              }
            }
            val wm = state.getCurrentWatermarkMs()
            state.update((s1,
              retain(clicks0 ++ clicks.result(), s1, wm, windowMs),
              retain(purchases0 ++ purchases.result(), s1, wm, windowMs),
              lastSeen))
            state.setTimeoutTimestamp(math.max(lastSeen + stateTtlMs, wm + 1))
            Iterator.empty
          }
      }
  }
}
