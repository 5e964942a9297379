package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{MediaSignatureStore, MultimodalQueries}

/** The media-signature-store contract, mirroring SignatureStoreSpec:
  * reading the on-disk `(doc_id, mime, mh0..mh7)` store is
  * BIT-IDENTICAL to recomputing the byte-window MinHash chain from the
  * payloads inline — which is what lets the store-reading q89/q91/q93
  * keep their payload-recomputing DuckDB oracles.
  */
class MediaSignatureStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("store-read equals the inline payload profile bit-for-bit " +
    "(doc_id, mime, byte_len, content_fp + 8 minhash longs)") {
    val fromStore = MediaSignatureStore.signatures(spark, sf)
      .orderBy("doc_id").collect()
    val recomputed = MultimodalQueries.mediaProfile(
        graft.multimodal.MediaPipeline
          .toMediaRows(Tables.documents(spark, sf)).toDF())
      .orderBy("doc_id").collect()
    assert(fromStore.length == recomputed.length && fromStore.nonEmpty)
    fromStore.zip(recomputed).foreach { case (a, b) => assert(a == b) }
  }

  test("the profile's signature columns equal mediaSignatures exactly " +
    "(carrying byte_len/content_fp through the window aggregation " +
    "changes nothing)") {
    val media = graft.multimodal.MediaPipeline
      .toMediaRows(Tables.documents(spark, sf)).toDF()
    import org.apache.spark.sql.functions.col
    val mhCols = Seq("doc_id", "mime") ++ (0 until 8).map(j => s"mh$j")
    val fromProfile = MultimodalQueries.mediaProfile(media)
      .select(mhCols.map(col): _*).orderBy("doc_id").collect()
    val direct = MultimodalQueries.mediaSignatures(media)
      .orderBy("doc_id").collect()
    fromProfile.zip(direct).foreach { case (a, b) => assert(a == b) }
  }

  test("second access reads the memoized table without a rebuild") {
    MediaSignatureStore.signatures(spark, sf).count()
    val t = MediaSignatureStore.tableName(sf)
    val before = spark.table(t).inputFiles.toSet
    MediaSignatureStore.signatures(spark, sf).count()
    assert(spark.table(t).inputFiles.toSet == before,
      "memoized access must not rewrite the store")
  }

  test("table naming: distinct raw dirs never collide; media and text " +
    "stores never share a name") {
    val a = MediaSignatureStore.tableName("/data/sf0.001")
    val b = MediaSignatureStore.tableName("/data/sf0_001")
    assert(a != b, s"$a == $b")
    assert(a.startsWith("graft_media_sigstore_"))
    assert(a.matches("[A-Za-z0-9_]+"))
    assert(a != graft.queries.SignatureStore.tableName("/data/sf0.001"))
  }
}
