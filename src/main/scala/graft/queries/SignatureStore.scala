package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ON-DISK MinHash signature store shared by the LSH query family.
  *
  * A production dedup pipeline never re-derives shingles+signatures per
  * query: the `(doc_id, mh00..mh15)` signature table — ~100× smaller
  * than the corpus text — is materialized ONCE at ingest and every
  * downstream near-dup operation (candidate pairs, estimated Jaccard,
  * composed verdicts, incremental admission, leakage audits) reads it.
  * Round-5 measurement: six queries independently rebuilding the
  * shingle→signature chain cold accounted for ~16 s of the 55 s bench.
  *
  * [[signatures]] is that materialization: built once per JVM per source
  * directory (concurrent callers serialize on the build; later callers
  * get the memoized table) with [[graft.core.Tables.writeBucketed]] on
  * `doc_id`, so the one corpus-sized shuffle is paid at write time and
  * any later `doc_id`-keyed join/window over signatures plans without
  * its exchange. The store is REBUILT on the first access of each JVM —
  * never trusted across process restarts — so a changed source table
  * can't serve stale signatures; at 100 TB the analog is the ingest
  * job's own overwrite of the signature partition it (re)processed.
  *
  * Bit-parity with the inline chain is spec-held (SignatureStoreSpec:
  * store-read ≡ recompute, exact equality on all 17 columns), so a
  * store-reading query is hash-identical to its recomputing oracle.
  * The `(band, bkey)`-bucketed variant for streaming/incremental
  * admission is [[DedupTextQueries.writeSignatureStore]]; this one is
  * the signature-level table the batch family consumes.
  */
object SignatureStore {

  /** One store table per source dir per JVM; ConcurrentHashMap
    * serializes the build so parallel first readers don't race the
    * overwrite.
    */
  private val built = new ConcurrentHashMap[String, String]()

  /** Sanitizing alone collapses distinct dirs ("sf0.001" vs "sf0_001")
    * to one table name while the memo stays keyed by the raw dir — the
    * second build would silently overwrite the first's table under the
    * first's live memo entry. A short hash of the RAW path keeps
    * distinct dirs collision-free (round-6 advisory).
    */
  private[graft] def tableName(d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"graft_sigstore_${d.replaceAll("[^A-Za-z0-9]+", "_")}_$h"
  }

  /** The corpus signature table for `d`, reading the bucketed on-disk
    * store (built on first access in this JVM). Schema: `doc_id,
    * mh00..mh15` — identical, bit-for-bit, to
    * `minhashSignature(shingleRows(s, d))`.
    */
  def signatures(s: SparkSession, d: String): DataFrame = {
    val name = built.computeIfAbsent(d, _ => {
      val t = tableName(d)
      // The in-memory catalog dies with the JVM but the warehouse
      // directory does not: a previous process's store is an ORPHAN
      // location that blocks CREATE TABLE. Drop both — this build
      // policy is rebuild-always (see class doc), so the old files are
      // dead weight, never a cache.
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.core.Tables.writeBucketed(
        DedupTextQueries.minhashSignature(DedupTextQueries.shingleRows(s, d)),
        t, numBuckets = 8, "doc_id")
      t
    })
    s.table(name)
  }

  /** Build (or re-read) the store eagerly — Bench calls this before the
    * timed loop so the ingest-time cost is reported as its own visible
    * setup metric rather than inside whichever family query runs first.
    */
  def ensure(s: SparkSession, d: String): Unit = { signatures(s, d); () }

  /** Test hook: forget the memo so a spec can observe a fresh build. */
  private[graft] def reset(): Unit = built.clear()
}
