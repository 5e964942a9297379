package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The shared store machinery's edge cases — exercised through a
  * throwaway RunStore instance so the five production stores don't
  * need to each re-prove them.
  */
class RunStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a stale warehouse directory from a previous process (orphan " +
    "location, no catalog entry) does not block the rebuild") {
    import spark.implicits._
    val store = new RunStore("graft_test_orphan", 2, Seq("k"),
      (s, _) => Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val t = store.tableName("/no/such/dir")
    try {
      // simulate the crashed-previous-JVM state: files on disk under
      // the store's location, nothing in the (in-memory) catalog
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(loc)
      val out = fs.create(new org.apache.hadoop.fs.Path(loc, "junk"))
      out.writeBytes("stale"); out.close()
      spark.sql(s"DROP TABLE IF EXISTS $t")

      assert(store.table(spark, "/no/such/dir").count() == 2)
      // and the memoized second read returns the same table untouched
      assert(store.table(spark, "/no/such/dir").count() == 2)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      store.reset()
    }
  }

  test("distinct raw dirs that sanitize identically still get distinct " +
    "tables (the shared naming helper)") {
    val a = RunStore.tableName("pfx", "/data/sf0.001")
    val b = RunStore.tableName("pfx", "/data/sf0_001")
    assert(a != b)
    assert(a.matches("[A-Za-z0-9_]+"))
  }

  test("foldAdmittedVia refuses a band frame whose key TYPES differ " +
    "from the store's (round-7 advisory: an unconditional cast would " +
    "silently truncate) — a cross-modality fold cannot corrupt a store") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    try {
      DedupTextQueries.writeSignatureStore(spark, TestSpark.Sf0001,
        "typed_store", lit(true))
      // the embedding band derivation emits INT bkeys; the text store
      // holds STRING bkeys — the fold must throw, not cast
      val e = intercept[IllegalArgumentException] {
        DedupTextQueries.foldAdmittedVia(
          SimilarityQueries.embBandFrame)(spark, "typed_store",
          Seq((900500L, Array.fill(64)(0.5f))).toDF("doc_id", "embedding"))
      }
      assert(e.getMessage.contains("bkey"), e.getMessage)
      // and the store is untouched by the refused fold
      assert(spark.table("typed_store").count() > 0)
    } finally spark.sql("DROP TABLE IF EXISTS typed_store")
  }
}
