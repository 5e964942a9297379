package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Streaming ADMISSION against the durable signature store — the
  * second tier of the two-tier streaming dedup design
  * ([[StreamingNearDup]] is tier one: online collisions *within* the
  * state horizon; this is tier two: each arriving document checked
  * against the whole admitted CORPUS via its on-disk `(band, bkey)`
  * store, the artifact [[graft.queries.DedupTextQueries
  * .writeSignatureStore]] writes and q64 models in one pass).
  *
  * Per micro-batch this runs EXACTLY the batch admission engine
  * ([[graft.queries.DedupTextQueries.incrementalNeardupFlagged]]): the
  * batch's per-row native band keys ([[graft.queries.DedupTextQueries
  * .textBandFrame]], spec-pinned
  * bit-equal to the batch signature pipeline) union the store's bands,
  * and the store side never shuffles — the delta keys broadcast onto
  * it. The skew cap is sized from the STORE's bands alone (round-6
  * advisory), so a document's verdict is invariant to how the delta
  * was cut into micro-batches; StreamingAdmissionSpec pins both that
  * invariance (a store bucket at the cap boundary) and verdict
  * equality with `q64IncrementalNeardup` on the identical delta.
  *
  * Batch-boundary semantics are deliberate: a batch is admitted
  * against the STORE, not against earlier un-persisted batches —
  * cross-batch collisions inside the horizon are tier one's job, and
  * the nightly [[graft.queries.DedupTextQueries.foldAdmitted]] appends
  * admitted docs' band keys into the store for the next day (an
  * O(|delta|) bucketed append, never a corpus rewrite).
  * That split keeps this tier stateless (no streaming state at all:
  * stream-static join + per-batch aggregation inside foreachBatch), so
  * it scales with the store's bucketed layout, not with stream length.
  */
object StreamingAdmission {

  /** The admission engine over ANY band derivation: `bandFrameOf`
    * turns a micro-batch into store-shaped `(doc_id, band, bkey)`
    * rows; the store side never shuffles and the skew cap reads the
    * store alone. [[admitBatch]] (text) and [[admitMediaBatch]]
    * (binary assets) are the two keyed instantiations — admission
    * semantics are keyed, not modality-specific, wherever a band
    * collision IS the verdict. The embedding tier
    * ([[admitEmbeddingBatch]]) deliberately does NOT ride this
    * engine: its dense band keys make collisions candidates, not
    * verdicts, so it runs the two-stage candidates→confirm shape.
    */
  private def admitVia(bandFrameOf: DataFrame => DataFrame)(
      storeBands: DataFrame)(delta: DataFrame): DataFrame =
    graft.queries.DedupTextQueries.incrementalNeardupFlagged(
      storeBands.select(col("doc_id"), col("band"), col("bkey"))
        .withColumn("is_delta", lit(false))
        .unionByName(bandFrameOf(delta).withColumn("is_delta", lit(true))),
      delta.select(col("doc_id")))

  /** One micro-batch's admission verdicts: `(doc_id, is_dup,
    * n_candidates, dup_of)` — q64's exact output schema — for a static
    * `delta` frame of `(doc_id, text)` rows against `storeBands`
    * (`doc_id, band, bkey`, e.g. `spark.table("sig_store")`).
    */
  def admitBatch(storeBands: DataFrame)(delta: DataFrame): DataFrame =
    admitVia(graft.queries.DedupTextQueries.textBandFrame)(storeBands)(delta)

  /** [[admitBatch]]'s MEDIA analog: a `(doc_id, mime, payload)` asset
    * batch admitted against a byte-window band store (the q91 keys —
    * [[graft.queries.MultimodalQueries.mediaBandFrame]], mime folded
    * into the band key so per-mime isolation survives). Written once
    * via `Tables.writeBucketed(mediaBandFrame(corpus), t, n, "band",
    * "bkey")`, the store then serves the same lifecycle as the text
    * store: nightly `foldAdmittedVia(mediaBandFrame)` appends admitted
    * assets (the fold MUST use the media derivation — text keys can
    * never match media admission), `compactStore` merges the fold
    * files (spec-pinned end-to-end in StreamingAdmissionSpec).
    */
  def admitMediaBatch(storeBands: DataFrame)(delta: DataFrame): DataFrame =
    admitVia(graft.queries.MultimodalQueries.mediaBandFrame)(storeBands)(delta)

  /** The EMBEDDING tier (q95's streaming form): a `(doc_id, embedding)`
    * vector batch admitted against the WIDE admitted-corpus store
    * (`vec_id, embedding, bkey0..bkey5` — the EmbBandStore layout) —
    * the semantic gate that rejects an arriving document whose vector
    * near-duplicates an admitted one, whatever its surface form.
    * Deliberately NOT the generic `admitVia` engine: 6-bit hyperplane
    * band keys are dense, so a bare band collision is a candidate,
    * not a verdict — this tier runs q95's two-stage shape (LSH
    * candidates → exact cosine confirmation at the q42 bar; see
    * [[graft.queries.SimilarityQueries.embeddingAdmitBatch]]). The
    * batch signs itself inline; verdict schema adds `n_confirmed`.
    */
  def admitEmbeddingBatch(storeSig: DataFrame)(delta: DataFrame): DataFrame =
    graft.queries.SimilarityQueries.embeddingAdmitBatch(storeSig)(delta)

  /** Wire a STREAMING frame to the admission engine and START it:
    * every trigger runs the per-batch admission on that micro-batch
    * and hands the verdict frame to `onVerdicts` inside a CacheScope —
    * the engine itself no longer persists (the round-7 cap change
    * removed it), but the scope stays so anything `onVerdicts` or a
    * future engine revision tracks is released per batch rather than
    * leaking across the stream's lifetime. `admit` is [[admitBatch]]
    * for `(doc_id, text)` documents (the default) or
    * [[admitMediaBatch]] / [[admitEmbeddingBatch]] for assets/vectors.
    *
    * Each micro-batch runs the admission plan against the CURRENT
    * store — the tier is stateless, and a nightly fold must be visible
    * to the next batch. `storeBands` is taken BY NAME so the stream
    * CAN re-resolve the store's catalog entry from scratch; since
    * round 11 it does so only when it must (round-10 verdict #1 — the
    * unconditional per-trigger re-resolution was a fixed ~0.2 s/
    * trigger re-analysis tax): the resolved frame is cached keyed on
    * the [[graft.core.StoreEpochs]] snapshot of the catalog tables its
    * plan scans, and every engine operation that mutates a store — a
    * fold's bucketed append, a compaction's `SET LOCATION` swap, a
    * rebuild, a drop — bumps the table's epoch, so the very next
    * trigger after a mutation re-evaluates the thunk and picks up the
    * new file set/location while a steady stream between maintenance
    * events resolves once. Mutations from ANOTHER process can't bump
    * this JVM's epochs, so the cache key also carries each table's
    * sidecar stamp ([[graft.queries.RunStore.sidecarStamp]], probed
    * every trigger — one `getFileStatus`): a child-process fold's
    * manifest refresh moves the stamp and the very next trigger
    * re-resolves (TwoJvmStoreRaceSpec proves it in two real JVMs).
    * A frame whose plan scans NO catalog table
    * (a literal or in-memory store, spec corpora) has no epoch to
    * watch and keeps the round-10 behavior: re-evaluated every
    * trigger. StreamingAdmissionSpec's fold-between-triggers and
    * post-swap-fold properties hold across this cache — they exist
    * precisely so the optimization cannot silently break visibility.
    *
    * For the stream's LIFETIME, the catalog tables `storeBands` scans
    * are leased in [[graft.core.StoreLeases]] (acquired under a
    * pending token BEFORE start so no startup window is unguarded;
    * released by a termination listener), which is what makes
    * `compactStore` RETAIN the generation this stream's pinned plan
    * scans until the stream stops — the atomic swap itself is
    * invisible to the reader, and deleting the old files out from
    * under its file index is the one hazard left (round-9 verdict #1).
    */
  def admissionQuery(docs: DataFrame, storeBands: => DataFrame,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow(),
      admit: DataFrame => DataFrame => DataFrame = admitBatch)(
      onVerdicts: (DataFrame, Long) => Unit): StreamingQuery = {
    val tables = storeBands.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.catalogTable.isDefined =>
        lr.catalogTable.get.identifier.table
    }.toSet
    val token = "pending:" + java.util.UUID.randomUUID()
    graft.core.StoreLeases.acquire(token, tables)
    // Per-GENERATION store resolution (see class doc): re-evaluate the
    // by-name thunk only when some scanned table's mutation epoch OR
    // its on-disk sidecar stamp has moved since the cached frame was
    // resolved. The epoch covers every in-JVM mutation; the sidecar
    // stamp (one getFileStatus per table per trigger) covers mutations
    // performed by ANOTHER process, whose folds/compactions rewrite
    // the sidecar but can never bump this JVM's StoreEpochs —
    // round-11 verdict #3: without it, a long-running stream could
    // read a stale resolution until its own process mutated something.
    // foreachBatch bodies run sequentially per query, but the lock
    // keeps the cache safe if an engine ever overlaps them.
    val cacheLock = new Object
    var cachedKey: Map[String, (Long, Long)] = null
    var cachedFrame: DataFrame = null
    def resolvedStore(): DataFrame =
      if (tables.isEmpty) storeBands
      else cacheLock.synchronized {
        // snapshot BEFORE evaluating: a mutation landing mid-resolve
        // leaves the snapshot behind its epoch, so the next trigger
        // re-resolves rather than serving the half-stale frame forever
        val s = docs.sparkSession
        val now = tables.iterator
          .map(t => t -> (graft.core.StoreEpochs.epoch(t),
            graft.queries.RunStore.sidecarStamp(s, t))).toMap
        if (cachedFrame == null || cachedKey != now) {
          // a STAMP move means another process mutated the store: this
          // JVM's table-relation cache still holds the stale file
          // index (an in-JVM mutation would have invalidated it
          // itself) — refresh before re-resolving or the new plan
          // re-reads the old listing
          if (cachedKey != null) tables.foreach { t =>
            if (cachedKey.get(t).map(_._2) != now.get(t).map(_._2))
              s.catalog.refreshTable(t)
          }
          cachedKey = now
          cachedFrame = storeBands
        }
        cachedFrame
      }
    val started = try {
      docs.writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(trigger)
        // the batch id is handed through so sinks can key their writes
        // by it — the idempotence handle a replayed epoch needs (a
        // restarted stream re-runs its last uncommitted batch with the
        // SAME id, so a batchId-keyed overwrite can't duplicate rows)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.core.CacheScope.withScope {
            onVerdicts(admit(resolvedStore())(batch), batchId)
          }
        }
        .start()
    } catch { case e: Throwable =>
      graft.core.StoreLeases.release(token); throw e
    }
    if (tables.nonEmpty) {
      // the lease's liveness rides the query handle itself, so the
      // sweep guard holds for streams from ANY session in this JVM —
      // not just the one compaction happens to run in
      graft.core.StoreLeases.rekey(token, started.id.toString,
        () => started.isActive)
      val streams = docs.sparkSession.streams
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == started.id) {
            graft.core.StoreLeases.release(started.id.toString)
            streams.removeListener(this)
          }
      }
      streams.addListener(listener)
      // a query can terminate (instant AvailableNow drain, immediate
      // failure) BEFORE the listener registers, in which case its
      // termination event was posted to nobody: release/deregister
      // here — both operations are idempotent, so double cleanup from
      // the race's other interleaving is harmless. Without this, every
      // short-lived admission stream would leak its lease entry and a
      // dead listener on the bus for the JVM's lifetime.
      if (!started.isActive) {
        graft.core.StoreLeases.release(started.id.toString)
        streams.removeListener(listener)
      }
    }
    started
  }
}
