package graft.core

/** JVM-global MUTATION EPOCHS for catalog store tables — the
  * invalidation signal behind
  * [[graft.streaming.StreamingAdmission.admissionQuery]]'s cached
  * store resolution (round-10 verdict #1).
  *
  * The round-10 design re-evaluated the admission stream's store frame
  * at EVERY micro-batch so a nightly fold's appended files and a
  * compaction's `SET LOCATION` swap were visible to the very next
  * trigger. That bought correctness at a fixed per-trigger re-analysis
  * tax (~0.2 s/trigger in the round-10 bench). This registry makes the
  * invalidation EXPLICIT instead of unconditional: every engine
  * operation that mutates a store table's file set or location —
  * [[graft.queries.DedupTextQueries.foldAdmittedVia]]'s bucketed
  * append, [[graft.queries.DedupTextQueries.compactStore]]'s atomic
  * swap, a [[graft.queries.RunStore]] build or drop — bumps the
  * table's epoch, and a reader holding a resolved frame re-resolves
  * only when the epoch of some table its plan scans has moved. A
  * steady stream between maintenance events pays the resolution ONCE.
  *
  * SCOPE: per-JVM, like [[StoreLeases]]. For mutations performed by
  * ANOTHER process — which can never bump this JVM's registry — the
  * admission cache pairs each epoch with the table's on-disk sidecar
  * stamp ([[graft.queries.RunStore.sidecarStamp]]), which every
  * lifecycle mutation rewrites; the two signals together make the
  * invalidation complete across processes (round-11 verdict #3).
  * At multi-writer scale the epoch is the catalog's own table version
  * (an open table format's snapshot id); this registry is the in-JVM
  * stand-in for exactly that, and the admission stream's contract —
  * "re-resolve when the version moves" — transfers unchanged.
  */
object StoreEpochs {

  private val epochs =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Catalog identifiers are lowercased by the writer; normalize so
    * `bump("Sig_Store")` and a plan-collected `sig_store` meet.
    */
  private def key(table: String): String =
    table.toLowerCase(java.util.Locale.ROOT)

  /** The table's current mutation epoch (0 until first bump). */
  def epoch(table: String): Long = {
    val v = epochs.get(key(table))
    if (v == null) 0L else v.longValue()
  }

  /** Record a mutation of `table` (fold append, compaction swap,
    * rebuild, drop) — every cached resolution keyed on the old epoch
    * re-resolves on its next read.
    */
  def bump(table: String): Unit = {
    epochs.merge(key(table), 1L, (a, b) => a.longValue() + b.longValue())
    ()
  }

  /** Test hook. */
  private[graft] def reset(): Unit = epochs.clear()
}
