package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, StatefulProcessorWithInitialState,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** LAST-TOUCH attribution on Spark 4's `transformWithState` — the SAME
  * algebra as [[StreamingAttribution]] (whose pure kernel —
  * [[StreamingAttribution.verdict]] / [[StreamingAttribution.retainTouches]]
  * — it calls verbatim, so the two implementations cannot drift apart
  * silently), re-expressed on the API production stateful pipelines
  * are moving to:
  *
  *  - TYPED STATE VARIABLES instead of one monolithic state tuple:
  *    `best` ([[ValueState]]) is the collapsed below-watermark
  *    maximum, `touches`/`pending` ([[ListState]]) the disorder
  *    horizon's individually-retained rows. The engine persists each
  *    variable as its own column family, so a large pending list never
  *    rewrites the O(1) best value — the state-layout win over
  *    `flatMapGroupsWithState`, where every update rewrites the whole
  *    tuple.
  *  - EVENT-TIME TIMERS instead of `setTimeoutTimestamp`: the
  *    end-of-stream flush re-arms one timer per key at
  *    `max(lastSeen + ttl, wm + 1)` (timers accumulate rather than
  *    replace, so the previous one is deleted explicitly — the one
  *    protocol difference from fMGWS this port has to own).
  *
  * `transformWithState` REQUIRES the RocksDB state-store provider
  * (q218 runs under it — which also makes the row a provider-parity
  * gate: its oracle is q156's batch SQL VERBATIM, the same hash the
  * HDFS-backed q159 twin must produce). State TTL via [[TTLConfig]] is
  * processing-time-based and therefore non-deterministic for a
  * replayable gate; the gate keeps TTL on the event-time timer path,
  * and TtlConfigSpec exercises the TTLConfig surface separately.
  *
  * Semantics (identical to q159, proof on [[StreamingAttribution]]):
  * purchases buffer until the watermark proves them FINAL (`ms < wm`),
  * touches below the watermark collapse to their `(ms, event_id)`
  * maximum, and the emitted rows union to the batch attribution table
  * for ANY batching of the stream.
  */
object StreamingAttributionTws {

  private val NoTouch = (Long.MinValue, Long.MinValue)

  /** One batch of the processor's fold, held PURE for the parity spec
    * (TwsAttributionParitySpec drives 500 randomized arrival orders
    * through it against the brute-force batch semantics): given the
    * key's state as the processor reads it back from its typed state
    * variables, the arrived rows, and the eviction watermark, returns
    * `(emitted verdicts, best', touches', pending', lastSeen')` — the
    * values [[Processor.handleInputRows]] writes back.
    */
  private[graft] def foldBatch(uid: Long, best0: (Long, Long),
      touches0: Seq[(Long, Long)], pending0: Seq[(Long, Long)],
      lastSeen0: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
      wm: Long, windowMs: Long)
      : (Seq[AttributionRow], (Long, Long), Seq[(Long, Long)],
        Seq[(Long, Long)], Long) = {
    var seen = lastSeen0
    val newTouches = Seq.newBuilder[(Long, Long)]
    val newPurch = Seq.newBuilder[(Long, Long)]
    rows.foreach { case (_, ts, id, tpe) =>
      val t = ts.getTime
      seen = math.max(seen, t)
      tpe match {
        case "view" | "click" => newTouches += ((t, id))
        case "purchase" => newPurch += ((t, id))
        case _ => ()
      }
    }
    val touchesAll = touches0 ++ newTouches.result()
    val (done, pend) =
      (pending0 ++ newPurch.result()).partition(_._1 < wm)
    val out = done.sorted.map(p =>
      StreamingAttribution.verdict(uid, p, best0, touchesAll, windowMs))
    val (nbest, ntouches) =
      StreamingAttribution.retainTouches(best0, touchesAll, wm)
    (out, nbest, ntouches, pend, seen)
  }

  /** The end-of-stream flush, pure: every pending verdict is final. */
  private[graft] def flush(uid: Long, best0: (Long, Long),
      touches0: Seq[(Long, Long)], pending0: Seq[(Long, Long)],
      windowMs: Long): Seq[AttributionRow] =
    pending0.sorted.map(p =>
      StreamingAttribution.verdict(uid, p, best0, touches0, windowMs))

  /** One key's processor shell, shared by the plain and the
    * initial-state-bootstrapped forms (they differ only in which
    * `StatefulProcessor` base Spark requires): three typed state
    * variables + a re-armed event-time flush timer. Scale shape: state
    * per user is O(1 + rows inside the watermark horizon), identical
    * to the fMGWS twin.
    */
  private trait AttributionShell {
    self: StatefulProcessor[Long, (Long, Timestamp, Long, String),
      AttributionRow] =>
    protected def windowMs: Long
    protected def stateTtlMs: Long
    @transient protected var best: ValueState[(Long, Long)] = _
    @transient private var touches: ListState[(Long, Long)] = _
    @transient private var pending: ListState[(Long, Long)] = _
    @transient private var lastSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val pair = Encoders.product[(Long, Long)]
      best = getHandle.getValueState("best", pair, TTLConfig.NONE)
      touches = getHandle.getListState("touches", pair, TTLConfig.NONE)
      pending = getHandle.getListState("pending", pair, TTLConfig.NONE)
      lastSeen = getHandle.getValueState("last_seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(uid: Long,
        rows: Iterator[(Long, Timestamp, Long, String)],
        timerValues: TimerValues): Iterator[AttributionRow] = {
      val best0 = if (best.exists()) best.get() else NoTouch
      val touches0 = if (touches.exists()) touches.get().toSeq else Seq.empty
      val pending0 = if (pending.exists()) pending.get().toSeq else Seq.empty
      val lastSeen0 = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      // same two-watermark stance as the fMGWS twin: this is the
      // EVICTION watermark for the running batch, so `ms < wm` is
      // final — every future arrival is admitted only at `ts >= wm`
      val wm = timerValues.getCurrentWatermarkInMs()
      val (out, nbest, ntouches, pend, seen) =
        foldBatch(uid, best0, touches0, pending0, lastSeen0, rows, wm,
          windowMs)
      best.update(nbest)
      touches.clear(); if (ntouches.nonEmpty) touches.put(ntouches.toArray)
      pending.clear(); if (pend.nonEmpty) pending.put(pend.toArray)
      lastSeen.update(seen)
      // re-arm the flush timer: timers ACCUMULATE per key (unlike
      // fMGWS's single timeout), so drop the stale one first
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(math.max(seen + stateTtlMs, wm + 1))
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[AttributionRow] = {
      // wm has passed everything retained (the timer sits beyond the
      // span-derived TTL): every pending verdict is final
      val best0 = if (best.exists()) best.get() else NoTouch
      val touches0 = if (touches.exists()) touches.get().toSeq else Seq.empty
      val pending0 = if (pending.exists()) pending.get().toSeq else Seq.empty
      val out = flush(uid, best0, touches0, pending0, windowMs)
      best.clear(); touches.clear(); pending.clear(); lastSeen.clear()
      out.iterator
    }
  }

  private class Processor(
      protected val windowMs: Long, protected val stateTtlMs: Long)
      extends StatefulProcessor[Long, (Long, Timestamp, Long, String),
        AttributionRow] with AttributionShell

  /** The BOOTSTRAPPED form (q227): identical machine, but the `best`
    * touch is seeded per key from a batch-computed snapshot before the
    * first micro-batch — Spark calls [[handleInitialState]] once per
    * key of the initial-state relation. The seed is sufficient state
    * by the operator's own domination argument: among touches wholly
    * in the past (the backfill), only the `(ms, event_id)` maximum can
    * ever win a future purchase.
    */
  private class BootstrappedProcessor(
      protected val windowMs: Long, protected val stateTtlMs: Long)
      extends StatefulProcessorWithInitialState[Long,
        (Long, Timestamp, Long, String), AttributionRow, (Long, Long)]
      with AttributionShell {
    override def handleInitialState(uid: Long, init: (Long, Long),
        timerValues: TimerValues): Unit = {
      best.update(init)
      // seeded keys that never reappear in the live stream must still
      // expire, or every backfill-only user is a permanent state row
      // (round-16 review). The timer is LOSSLESS given ttl >= window
      // (enforced at the entry point): any purchase admitted after the
      // watermark passes best_ms + ttl sits more than the attribution
      // window past the seed, so the cleared seed could never have won
      // it. A live arrival before expiry re-arms via handleInputRows.
      getHandle.registerTimer(init._1 + stateTtlMs)
    }
  }

  /** The q218 entry: same signature and contract as
    * [[StreamingAttribution.attribute]].
    */
  def attribute(events: DataFrame, windowMs: Long, watermarkDelay: String,
      stateTtlMs: Long): Dataset[AttributionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .transformWithState[AttributionRow](
        new Processor(windowMs, stateTtlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** The q227 entry: [[attribute]] warm-started from a batch backfill.
    * `initial` is one row per user — `(user_id, best_ms, best_id)`,
    * the maximum backfill touch — and the stream carries only the live
    * tail. Spark seeds each key's state via
    * [[BootstrappedProcessor.handleInitialState]] before the first
    * micro-batch: the standard migration path from a batch backfill
    * (or a legacy operator's exported state) into a running
    * transformWithState pipeline, without replaying history through
    * the stream.
    */
  def attributeBootstrapped(events: DataFrame, initial: DataFrame,
      windowMs: Long, watermarkDelay: String, stateTtlMs: Long)
      : Dataset[AttributionRow] = {
    require(stateTtlMs >= windowMs,
      s"attributeBootstrapped: stateTtlMs=$stateTtlMs must cover the " +
        s"attribution window ($windowMs ms) — the seeded-key expiry " +
        "timer is only lossless when an expired seed can no longer win")
    import events.sparkSession.implicits._
    val init = initial
      .select(col("user_id"), col("best_ms"), col("best_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .transformWithState[AttributionRow, (Long, Long)](
        new BootstrappedProcessor(windowMs, stateTtlMs),
        TimeMode.EventTime(), OutputMode.Append(), init)
  }
}
