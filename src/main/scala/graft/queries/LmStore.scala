package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ON-DISK bigram language-model table — the [[SignatureStore]]
  * discipline applied to n-gram statistics (round-7 verdict #2: q84
  * and q90 each ran their own tokenize+explode of the corpus to build
  * the identical `(head, next, cnt)` table; at 100 TB that is a second
  * full corpus pass).
  *
  * Schema: `(head, next, cnt, total)` — the bigram count plus the
  * per-head marginal `total = Σ cnt` (so conditional frequencies are
  * one division of two stored exact integers; nothing float is ever
  * persisted, keeping every consumer oracle-hash-stable). Bounded by
  * bigram TYPES (vocabulary²-ish), not corpus size — the classic
  * KenLM-style artifact an ingest job materializes once.
  *
  * Bucketed+sorted on `head`: q84's top-k-per-head rank window reads
  * the bucket layout's hash distribution without an exchange, and
  * q90's `(head, next)` probe join starts from head-clustered files.
  * Built once per JVM per source dir ([[RunStore]]: rebuild-always,
  * orphan cleanup, collision-free naming); the build itself is the ONE
  * corpus tokenize pass, reported as Bench's `lm_store_build` setup
  * metric.
  */
object LmStore {

  private val store = new RunStore("graft_lmstore", 8, Seq("head"),
    (s, d) => DedupTextQueries.bigramRows(s, d)
      .groupBy("head", "next").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy("head"))))

  private[graft] def tableName(d: String): String = store.tableName(d)

  /** The corpus bigram LM for `d` (built on first access in this JVM):
    * `head, next, cnt, total`.
    */
  def table(s: SparkSession, d: String): DataFrame = store.table(s, d)

  /** Eager build for Bench's visible setup metric. */
  def ensure(s: SparkSession, d: String): String = store.ensure(s, d)

  /** Test hook: forget the memo so a spec can observe a fresh build. */
  private[graft] def reset(): Unit = store.reset()
}
