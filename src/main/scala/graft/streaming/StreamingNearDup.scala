package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MinHashBandKeys

/** One document's presence in one LSH band bucket. */
case class BandObs(doc_id: Long, ts: Timestamp, band: Int, bkey: String)

/** A near-dup collision: `doc_id` landed in band `band`'s bucket already
  * claimed by `dup_of`. A document colliding in several bands emits one
  * row per band — downstream policy (e.g. "dup iff ≥2 bands") is a
  * trivial grouped count on this duplicate-proportional stream.
  */
case class NearDupHit(doc_id: Long, band: Int, dup_of: Long)

/** Streaming near-duplicate detection over a document stream — the
  * crawl-ingest form of q32/q64: every arriving document is checked
  * against everything seen inside the state horizon, ONLINE, instead of
  * re-running a batch LSH pass per shard.
  *
  * Shape: [[MinHashBandKeys]] turns each document into its `Bands` band
  * keys in the map stage (one native-expression call, no mid-stream
  * aggregation — the reason that expression exists), `posexplode` fans
  * each doc to `Bands` rows, and `flatMapGroupsWithState` keyed by
  * `(band, bkey)` holds one (owner id, newest-claim-ms) pair per bucket:
  * the first document id that claimed it plus the latest claim time (so
  * late arrivals can never shorten the expiry). Later arrivals in the
  * same bucket emit a [[NearDupHit]] against that owner. State is
  * therefore O(distinct band keys in the horizon) × 16 bytes —
  * duplicate-INsensitive (copies share buckets),
  * and an event-time timeout drops buckets `stateTtlMs` after the last
  * claim, so unbounded streams hold bounded state. Watermark-late rows
  * are dropped by the engine like every stateful op here.
  *
  * At 100 TB-scale ingest the horizon state is the streaming tier of a
  * two-tier design: collisions within the horizon resolve online; the
  * durable q64 signature store catches cross-horizon duplicates in the
  * nightly admission pass. Determinism: within a micro-batch, bucket
  * arrivals are processed in (ts, doc_id) order, so the bucket owner and
  * the emitted hits do not depend on partitioning.
  */
object StreamingNearDup {

  /** The shared map stage: watermarked docs fanned to per-band bucket
    * claims, keyed by `(band, bkey)`.
    */
  private def bucketClaims(docs: DataFrame, watermarkDelay: String) =
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        posexplode(MinHashBandKeys.bandKeys(col("text"))).as(Seq("band", "bkey")))

  /** @param docs          streaming frame with `doc_id` (long), `text`
    *                      (string), `ts` (timestamp)
    * @param watermarkDelay max event-time lateness admitted, e.g. "10 minutes"
    * @param stateTtlMs    horizon: a band bucket expires this long after
    *                      its last claim (event time)
    */
  def collisions(docs: DataFrame, watermarkDelay: String,
      stateTtlMs: Long): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    bucketClaims(docs, watermarkDelay)
      .as[BandObs]
      .groupByKey(o => (o.band, o.bkey))
      // state = (owner doc id, newest claim time seen): the claim time
      // must persist across batches or a LATE-but-admissible arrival
      // (older ts than the stored claim) would shorten an already-later
      // expiry when the timeout is recomputed from its batch alone
      .flatMapGroupsWithState[(Long, Long), NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), obs: Iterator[BandObs],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic arrival order within the batch
            val arrivals = obs.toArray.sortBy(o => (o.ts.getTime, o.doc_id))
            var (owner, lastClaim) = state.getOption.getOrElse((-1L, 0L))
            val hits = Array.newBuilder[NearDupHit]
            arrivals.foreach { o =>
              if (owner < 0) owner = o.doc_id
              else if (owner != o.doc_id)
                hits += NearDupHit(o.doc_id, key._1, owner)
            }
            lastClaim = math.max(lastClaim, arrivals.map(_.ts.getTime).max)
            state.update((owner, lastClaim))
            // a timeout at or below the watermark is rejected by the
            // engine; clamp for buckets claimed only by near-late rows
            state.setTimeoutTimestamp(math.max(
              lastClaim + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            hits.result().iterator
          }
      }
  }

  /** No-owner-yet sentinel for the finality mode's state — compares
    * AFTER every admissible claim, so `min(sentinel, claim) = claim`.
    */
  private val NoOwner: (Long, Long) = (Long.MaxValue, Long.MaxValue)

  /** [[collisions]]'s DISORDER-TOLERANT twin (round-9 verdict #2: the
    * arrival-order mode requires the spool to realize the intended
    * ownership order; this mode doesn't). Ownership is by EVENT TIME,
    * not arrival: a bucket's owner is its minimum `(ts, doc_id)` claim
    * within the horizon, and every other claim emits a hit against
    * that owner — decided on watermark FINALITY, the q100 discipline.
    * A claim is judged only once the watermark strictly passes its
    * `ts`: from then on the engine drops any arrival that could sort
    * at-or-before it (ties share a `ts`, so the whole `ts` must be
    * closed), which is what makes the owner decision immutable. Until
    * then claims buffer in state, so arbitrary cross-batch disorder
    * inside the watermark delay reorders nothing.
    *
    * Owner immutability across batches: the owner was finalized when
    * the watermark passed its `ts`; any later arrival with a smaller
    * `(ts, doc_id)` would carry `ts` at-or-below that watermark and is
    * dropped by the engine as late — so once set, the owner IS the
    * bucket's admitted minimum, and newly-final claims can emit
    * against it without re-deciding.
    *
    * The TTL horizon is EVENT-time too, enforced in the data path: a
    * finalized claim arriving more than `stateTtlMs` after the
    * bucket's previous finalized claim starts a FRESH horizon and
    * claims ownership silently (the arrival mode gets the same effect
    * from its state timeout, but a timeout never fires for a key that
    * keeps receiving data — gap detection over the finalized sequence
    * is the arrival-independent form). The state timeout handles the
    * complementary case — a bucket nothing arrives for anymore: it
    * fires only once the watermark passed `lastClaim + ttl`, so every
    * buffered claim is final (flush emits, state drops), and any
    * later claim necessarily sits a full TTL past the flushed ones —
    * exactly the fresh horizon the gap rule would declare. State per
    * bucket is the owner pair plus still-open claims — O(in-flight
    * disorder), not O(stream).
    */
  def finalityCollisions(docs: DataFrame, watermarkDelay: String,
      stateTtlMs: Long): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    bucketClaims(docs, watermarkDelay)
      .as[BandObs]
      .groupByKey(o => (o.band, o.bkey))
      // state = (owner (tsMs, doc_id) or NoOwner, ts of the newest
      // FINALIZED claim (horizon anchor), open claims not yet past the
      // watermark, newest claim ts seen (timeout anchor))
      .flatMapGroupsWithState[((Long, Long), Long, Seq[(Long, Long)], Long),
          NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Int, String), obs: Iterator[BandObs],
            state: GroupState[((Long, Long), Long, Seq[(Long, Long)], Long)]) =>

          // Finalize `claims` (sorted by (ts, doc_id)) against `owner`:
          // a claim opening a bucket — or a claim more than the TTL
          // past the previous finalized claim — becomes the owner
          // silently; everything else emits a hit against the owner.
          def judge(owner0: (Long, Long), lastFinal0: Long,
              claims: Seq[(Long, Long)])
              : ((Long, Long), Long, Seq[NearDupHit]) = {
            var owner = owner0
            var lastFinal = lastFinal0
            val hits = Seq.newBuilder[NearDupHit]
            claims.foreach { c =>
              if (owner == NoOwner || c._1 - lastFinal > stateTtlMs)
                owner = c
              else hits += NearDupHit(c._2, key._1, owner._2)
              lastFinal = c._1
            }
            (owner, lastFinal, hits.result())
          }

          if (state.hasTimedOut) {
            // flush is final-only: the timeout fired because watermark ≥
            // timeoutTimestamp ≥ lastClaim + ttl, which exceeds every
            // buffered claim's ts — everything open is now final
            val (owner, lastFinal, open, _) = state.get
            state.remove()
            judge(owner, lastFinal, open.sorted)._3.iterator
          } else {
            val arrivals = obs.map(o => (o.ts.getTime, o.doc_id)).toArray
            val (owner0, lastFinal0, open0, last0) = state.getOption.getOrElse(
              (NoOwner, Long.MinValue, Seq.empty[(Long, Long)], Long.MinValue))
            val wm = state.getCurrentWatermarkMs()
            // strict <: a claim sharing the watermark's ts is not final
            // (an equal-ts, smaller-doc_id arrival is still admissible)
            val (fin, open) = (open0 ++ arrivals).sorted
              .partition(_._1 < wm)
            val (owner, lastFinal, hits) = judge(owner0, lastFinal0, fin)
            val lastClaim = (last0 +: arrivals.map(_._1).toSeq).max
            state.update((owner, lastFinal, open, lastClaim))
            state.setTimeoutTimestamp(math.max(
              lastClaim + stateTtlMs, wm + 1))
            hits.iterator
          }
      }
  }
}
