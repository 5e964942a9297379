package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{DedupTextQueries, SignatureStore}

/** The signature-store contract: reading the on-disk bucketed store is
  * BIT-IDENTICAL to recomputing the shingle→minhash chain inline. This
  * is what lets the store-reading query family keep its recomputing
  * DuckDB oracles — any drift here would surface as a hash mismatch in
  * the driver's correctness gate, so the spec pins it at the source.
  */
class SignatureStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("store-read equals inline recompute bit-for-bit (all 17 columns)") {
    val fromStore = SignatureStore.signatures(spark, sf)
      .orderBy("doc_id").collect()
    val recomputed = DedupTextQueries
      .minhashSignature(DedupTextQueries.shingleRows(spark, sf))
      .orderBy("doc_id").collect()
    assert(fromStore.length == recomputed.length)
    // exact Row equality: doc_id + 16 minhash longs — no tolerance
    fromStore.zip(recomputed).foreach { case (a, b) => assert(a == b) }
  }

  test("second access reads the memoized table without a rebuild") {
    SignatureStore.signatures(spark, sf).count()
    val before = spark.table(SignatureStore.tableName(sf))
      .inputFiles.toSet
    SignatureStore.signatures(spark, sf).count()
    val after = spark.table(SignatureStore.tableName(sf))
      .inputFiles.toSet
    assert(before == after, "memoized access must not rewrite the store")
  }

  test("distinct source dirs can never share a table name, even when " +
    "sanitizing collides them (round-6 advisory)") {
    // these two distinct raw paths sanitize to the SAME prefix; the
    // raw-path hash suffix must keep the table names apart
    val a = SignatureStore.tableName("/data/sf0.001")
    val b = SignatureStore.tableName("/data/sf0_001")
    assert(a != b, s"$a == $b")
    assert(a.startsWith("graft_sigstore_"))
    // and the name stays a valid identifier + deterministic
    assert(a.matches("[A-Za-z0-9_]+"))
    assert(a == SignatureStore.tableName("/data/sf0.001"))
  }

  test("store table is bucketed on doc_id (ingest-time shuffle paid once)") {
    val cat = spark.catalog
    val t = SignatureStore.tableName(sf)
    SignatureStore.signatures(spark, sf).count()
    val desc = spark.sql(s"DESCRIBE EXTENDED $t").collect()
      .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(desc.contains("Num Buckets"), desc)
    assert(desc.contains("doc_id"), desc)
    assert(cat.tableExists(t))
  }
}
