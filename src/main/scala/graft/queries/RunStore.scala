package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic once-per-JVM-per-source-dir ON-DISK bucketed materialization —
  * the machinery behind every "store discipline" table in the engine
  * (text MinHash signatures, media byte-window signatures, the bigram
  * LM, hyperplane band keys).
  *
  * The contract, shared by all instances:
  *  - built ONCE per JVM per source directory (concurrent first readers
  *    serialize on the `ConcurrentHashMap` memo; later callers get the
  *    memoized table) with [[graft.core.Tables.writeBucketed]], so the
  *    one corpus-sized shuffle is paid at write time and later
  *    key-aligned joins/windows plan without their exchange;
  *  - REBUILT on the first access of each JVM — never trusted across
  *    process restarts, so a changed source table can't serve stale
  *    derived rows. At 100 TB the analog is the ingest job's own
  *    overwrite of the derived partition it (re)processed;
  *  - the in-memory catalog dies with the JVM but the warehouse
  *    directory does not: a previous process's store is an ORPHAN
  *    location that blocks CREATE TABLE, so both the catalog entry and
  *    the location are dropped before the rebuild (the files are dead
  *    weight under the rebuild-always policy, never a cache).
  *
  * Table naming keeps distinct source dirs collision-free even when
  * sanitizing collides them ("sf0.001" vs "sf0_001" — round-6
  * advisory): a short hash of the RAW path is appended to the sanitized
  * prefix.
  */
private[graft] final class RunStore(
    prefix: String, numBuckets: Int, bucketKeys: Seq[String],
    build: (SparkSession, String) => DataFrame) {

  private val built = new ConcurrentHashMap[String, String]()

  private[graft] def tableName(d: String): String =
    RunStore.tableName(prefix, d)

  /** The store table for source dir `d`, building it on the first
    * access in this JVM.
    */
  def table(s: SparkSession, d: String): DataFrame = {
    val name = built.computeIfAbsent(d, _ => {
      val t = tableName(d)
      RunStore.dropWithLocation(s, t)
      graft.core.Tables.writeBucketed(build(s, d), t, numBuckets,
        bucketKeys: _*)
      t
    })
    s.table(name)
  }

  /** Build (or re-read) eagerly — Bench calls this before the timed
    * loop so the ingest-time cost is reported as a visible setup metric
    * rather than inside whichever family query runs first.
    */
  def ensure(s: SparkSession, d: String): Unit = { table(s, d); () }

  /** Test hook: forget the memo so a spec can observe a fresh build. */
  private[graft] def reset(): Unit = built.clear()
}

private[graft] object RunStore {
  /** Collision-free per-source-dir table naming (see class doc) —
    * also used by non-memoized lifecycle tables (q92).
    */
  private[graft] def tableName(prefix: String, d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${prefix}_${d.replaceAll("[^A-Za-z0-9]+", "_")}_$h"
  }

  /** Drop a catalog table AND its warehouse location — the orphan-file
    * cleanup every rebuild-always store needs (see class doc).
    */
  private[graft] def dropWithLocation(s: SparkSession, t: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), t)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    ()
  }
}
