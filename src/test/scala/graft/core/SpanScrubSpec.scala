package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.IngestQueries

/** q120's duplicated-span scrub semantics on a hand-built corpus:
  * cross-document spans are cut from BOTH documents, overlapping
  * duplicated windows merge like interval union, within-document
  * repetition is scrubbed too, and short documents pass through
  * untouched.
  */
class SpanScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    IngestQueries.spanScrub(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_scrubbed"), r.getAs[String]("scrub_md5"))))
      .toMap
  }

  test("shared 8-token span is scrubbed from both documents; unique " +
    "remainder kept; overlapping dup windows merge; intra-doc repeats " +
    "scrubbed; short docs untouched") {
    val out = run(Seq(
      1L -> "a b c d e f g h x1 u v w",          // span at head
      2L -> "p q r a b c d e f g h y2",          // same span mid-doc
      3L -> "m1 a b c d e f g h i m3",           // 9-token shared run...
      4L -> "m2 a b c d e f g h i m4",           // ...two overlapping windows
      5L -> "r1 r2 r3 r4 r5 r6 r7 r8 z r1 r2 r3 r4 r5 r6 r7 r8", // self-repeat
      6L -> "s1 s2 s3",                          // below window width
      7L -> ""))                                 // empty
    assert(out(1L) == ((12L, 1L, 8L, md5hex("x1 u v w"))))
    assert(out(2L) == ((12L, 1L, 8L, md5hex("p q r y2"))))
    // doc 3/4: dup windows at starts 1 and 2 → union covers tokens 1..9
    assert(out(3L) == ((11L, 2L, 9L, md5hex("m1 m3"))))
    assert(out(4L) == ((11L, 2L, 9L, md5hex("m2 m4"))))
    // doc 5: "r1..r8" occurs at starts 0 and 9 (both in-doc) → corpus
    // count 2 → both occurrences scrubbed, the separator survives
    assert(out(5L) == ((17L, 2L, 16L, md5hex("z"))))
    assert(out(6L) == ((3L, 0L, 0L, md5hex("s1 s2 s3"))))
    assert(out(7L) == ((0L, 0L, 0L, md5hex(""))))
  }

  test("q124 incremental scrub against the DupWindowStore == the batch " +
    "scrub restricted to the delta slice (incremental == recompute, " +
    "executable)") {
    import org.apache.spark.sql.functions.col
    val sf = TestSpark.Sf0001
    val want = IngestQueries.queries("q120_span_scrub")(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .collect().map(_.toSeq).toSeq
    val got = IngestQueries.queries("q124_incremental_span_scrub")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("a corpus with no duplication is returned verbatim") {
    val out = run(Seq(
      10L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9",
      11L -> "v1 v2 v3 v4 v5 v6 v7 v8 v9"))
    assert(out(10L) == ((9L, 0L, 0L, md5hex("w1 w2 w3 w4 w5 w6 w7 w8 w9"))))
    assert(out(11L) == ((9L, 0L, 0L, md5hex("v1 v2 v3 v4 v5 v6 v7 v8 v9"))))
  }
}
