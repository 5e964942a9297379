package graft.multimodal

import org.apache.spark.sql.functions._
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

  test("q89 near-dup media: a truncated copy of an asset pairs with its " +
    "original WITHOUT equal content md5; unrelated assets and cross-mime " +
    "byte-twins never pair") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"frame$i payload").mkString(" ")
    val truncated = base.dropRight(40) // tail windows lost, rest shared
    val unrelated = (0 until 60).map(i => s"totally other bytes $i").mkString(" ")
    val media = Seq(
      (0L, "image/png", base),
      (1L, "image/png", truncated),
      (2L, "image/png", unrelated),
      (3L, "audio/wav", base) // byte-twin of 0 under another mime
    ).toDF("doc_id", "mime", "text")
      .selectExpr("doc_id", "mime", "encode(text, 'UTF-8') AS payload")

    val pairs = graft.queries.MultimodalQueries.mediaNearDupPairs(media)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    assert(pairs.map(p => (p._1, p._2, p._3)).toSeq ==
      Seq(("image/png", 0L, 1L)), pairs.mkString(", "))
    // est is a SIGNATURE similarity: truncation may or may not move a
    // given min-hash (it removes ~4% of windows here), so only the bar
    // is contractual — the byte-inequality proof is the md5 check below
    assert(pairs.head._4 >= 0.5 && pairs.head._4 <= 1.0)
    // the whole point: q86's content hash can NOT see this pair
    val fps = media.selectExpr("doc_id", "md5(payload) AS fp").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(0L) != fps(1L))
  }

  test("q94 clusters merge TRANSITIVELY across edge types: a byte-twin " +
    "edge and a near-dup edge chain into one component with the min-id " +
    "canonical (pairwise verdicts would under-merge); cross-mime twins " +
    "and unrelated assets stay singletons") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"frame$i payload").mkString(" ")
    val truncated = base.dropRight(40)
    val unrelated = (0 until 60).map(i => s"totally other bytes $i").mkString(" ")
    val media = Seq(
      (10L, "image/png", base),       // canonical
      (11L, "image/png", base),       // exact twin of 10
      (12L, "image/png", truncated),  // near-dup of 10/11
      (13L, "audio/wav", base),       // byte-twin, other mime: own cluster
      (14L, "image/png", unrelated)   // singleton
    ).toDF("doc_id", "mime", "text")
      .selectExpr("doc_id", "mime", "encode(text, 'UTF-8') AS payload")
    val got = graft.queries.MultimodalQueries.mediaDupClusters(spark,
        graft.queries.MultimodalQueries.mediaProfile(media))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, 10L, 3L, true),   // the exact+near chain is ONE cluster of 3
      (11L, 10L, 3L, false),
      (12L, 10L, 3L, false),
      (13L, 13L, 1L, true),   // per-mime isolation lifts to components
      (14L, 14L, 1L, true)), got.mkString(", "))
  }

  test("q91 engine: a truncated copy of an ADMITTED asset is rejected " +
    "at the gate; cross-mime byte-twins and novel assets admit") {
    import spark.implicits._
    val base = (0 until 60).map(i => s"frame$i payload").mkString(" ")
    def media(rows: (Long, String, String)*) =
      rows.toSeq.toDF("doc_id", "mime", "text")
        .selectExpr("doc_id", "mime", "encode(text, 'UTF-8') AS payload")
    val store = media((0L, "image/png", base),
      (2L, "image/png", (0 until 60).map(i => s"other stuff $i").mkString(" ")))
    val delta = media(
      (10L, "image/png", base.dropRight(40)), // truncated copy of 0
      (11L, "audio/wav", base),               // byte-twin, other mime
      (12L, "image/png", (0 until 60).map(i => s"novel words $i").mkString(" ")))

    val q = graft.queries.MultimodalQueries
    val verdicts = graft.core.CacheScope.withScope {
      graft.queries.DedupTextQueries.incrementalNeardupFlagged(
          q.mediaBandFrame(store).withColumn("is_delta", lit(false))
            .unionByName(q.mediaBandFrame(delta)
              .withColumn("is_delta", lit(true))),
          delta.select(col("doc_id")))
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    }
    assert(verdicts == Seq(
      (10L, true, 1L, 0L),   // near-identical bytes: rejected, names 0
      (11L, false, 0L, -1L), // same bytes, different mime: admitted
      (12L, false, 0L, -1L)  // novel: admitted
    ), verdicts.mkString(", "))
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
