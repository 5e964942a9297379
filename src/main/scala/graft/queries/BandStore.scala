package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ADMISSION-LAYOUT text band store: the corpus's `(doc_id, band,
  * bkey)` LSH band keys bucketed AND sorted on `(band, bkey)` — the
  * second half of the text family's two-layout split ([[SignatureStore]]
  * is the `doc_id`-keyed half; the durable lifecycle stores written by
  * [[DedupTextQueries.writeSignatureStore]] use this same layout).
  *
  * Why it exists: every band-keyed operation — the skew-cap window
  * (q64/q92 admission), bucket-local pair enumeration (q32 and every
  * composed consumer: q53/q57/q59/q72/q78/q80) — requires
  * hash-distribution on `(band, bkey)`. Derived per query from the
  * `doc_id`-bucketed signature store, that distribution costs a
  * corpus-grain exchange of the 4-rows/doc band frame EVERY run of
  * EVERY family query; read from this table, the window plans with NO
  * exchange and the pair groupBy aggregates directly over the bucketed
  * scan (verified plan shapes, PlanSpec-pinned). The one shuffle moved
  * into the once-per-run build — at 100 TB, into the ingest job that
  * also writes the signature partition.
  *
  * Derivation chain: built FROM the memoized [[SignatureStore]] (which
  * itself rebuilds per JVM), so band keys are bit-identical to
  * `bandFrame(signatures)` and every oracle is unchanged.
  */
object BandStore {

  private val store = new RunStore("graft_bandstore", 8, Seq("band", "bkey"),
    (s, d) => DedupTextQueries.bandFrame(SignatureStore.signatures(s, d)))

  private[graft] def tableName(d: String): String = store.tableName(d)

  /** The corpus band-key table for `d` (built on first access in this
    * JVM): `doc_id, band, bkey`, bucketed+sorted on `(band, bkey)`.
    */
  def bands(s: SparkSession, d: String): DataFrame = store.table(s, d)

  /** Eager build for Bench's visible setup metric. */
  def ensure(s: SparkSession, d: String): String = store.ensure(s, d)

  /** Test hook: forget the memo so a spec can observe a fresh build. */
  private[graft] def reset(): Unit = store.reset()
}
