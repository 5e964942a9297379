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

  /** @param docs          streaming frame with `doc_id` (long), `text`
    *                      (string), `ts` (timestamp)
    * @param watermarkDelay max event-time lateness admitted, e.g. "10 minutes"
    * @param stateTtlMs    horizon: a band bucket expires this long after
    *                      its last claim (event time)
    */
  def collisions(docs: DataFrame, watermarkDelay: String,
      stateTtlMs: Long): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        posexplode(MinHashBandKeys.bandKeys(col("text"))).as(Seq("band", "bkey")))
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
}
