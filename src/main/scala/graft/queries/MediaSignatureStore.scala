package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ON-DISK byte-window MinHash signature store for MEDIA assets —
  * [[SignatureStore]]'s discipline applied to binary columns (the
  * round-7 verdict's #1 debt: q89, q91, and the streaming media tier
  * each re-derived window signatures from raw payloads per query, the
  * same shape as the pre-store shingle-chain cost that was ~16 s of the
  * round-5 text bench).
  *
  * Schema: `(doc_id, mime, byte_len, content_fp, mh0..mh7)` — one row
  * per asset — bit-identical to [[MultimodalQueries.mediaProfile]]
  * over the corpus media frame (MediaSignatureStoreSpec pins the
  * parity, which is what lets the store-reading q86/q87/q89/q91/q93/
  * q94 keep their payload-recomputing DuckDB oracles). Carrying the
  * EXACT-dedup digest and byte length next to the window minhashes
  * makes the whole media query family payload-free: ~100 B/asset vs
  * the payload bytes, and at 100 TB this is the table that lives NEXT
  * TO the payload at ingest — the corpus bytes are scanned once at
  * profile time and never again (no per-query digest pass, no
  * payload-grain exchange anywhere).
  *
  * Built once per JVM per source dir, `doc_id`-bucketed (the
  * [[RunStore]] contract: rebuild-always, orphan-location cleanup,
  * collision-free naming). The DELTA side of admission still signs its
  * own micro-batch — arriving assets have no store row yet by
  * definition — via [[MultimodalQueries.mediaBandFrame]]; only
  * corpus-side signatures read from here.
  */
object MediaSignatureStore {

  private val store = new RunStore("graft_media_sigstore", 8, Seq("doc_id"),
    (s, d) => MultimodalQueries.mediaProfile(
      graft.multimodal.MediaPipeline
        .toMediaRows(graft.core.Tables.documents(s, d)).toDF()))

  private[graft] def tableName(d: String): String = store.tableName(d)

  /** The corpus media-profile table for `d` (built on first access in
    * this JVM): `doc_id, mime, byte_len, content_fp, mh0..mh7`.
    */
  def signatures(s: SparkSession, d: String): DataFrame = store.table(s, d)

  /** Eager build for Bench's visible setup metric. */
  def ensure(s: SparkSession, d: String): String = store.ensure(s, d)

  /** Test hook: forget the memo so a spec can observe a fresh build. */
  private[graft] def reset(): Unit = store.reset()
}
