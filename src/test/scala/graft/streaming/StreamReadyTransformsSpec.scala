package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Map-side corpus transforms are stream-ready by construction — no
  * aggregation, no sort, no state — so the SAME code path must produce
  * the SAME rows whether the documents arrive as a table or as
  * micro-batches. Pinned here for chunking (q67's transform), the
  * pattern every map-only op in the suite follows.
  */
class StreamReadyTransformsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunkTokens emits identical rows on a batch frame and on a " +
    "micro-batched stream of the same documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, Array.tabulate(100)(i => s"w$i").mkString(" ")), // 3 chunks
      (2L, "short doc only"),                               // 1 chunk
      (3L, "")                                              // 0 chunks
    )
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet

    val batch = rows(graft.queries.IngestQueries
      .chunkTokens(docs.toDF("doc_id", "text")))

    val source = MemoryStream[(Long, String)]
    val q = graft.queries.IngestQueries
      .chunkTokens(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2))
      q.processAllAvailable()
      assert(rows(spark.table("chunks")) == batch)
      assert(batch.map(_._1) == Set(1L, 2L)) // doc 3 chunk-free, doc 1 split
      assert(batch.count(_._1 == 1L) == 3)
    } finally q.stop()
  }

  test("piiScrub emits identical detector counts and redacted " +
    "fingerprints on a batch frame and on a micro-batched stream — " +
    "scrub-on-ingest and scrub-on-release are the same operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "mail me at alice.w@example.com or +64-21-5551234 today"),
      (2L, "no contacts in this one at all"),
      (3L, "two mails a@b.org c.d@e.net and +64-21-9 plus +64-21-77"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet

    val batch = rows(graft.queries.DedupTextQueries
      .piiScrub(docs.toDF("doc_id", "text")))
    assert(batch.map(t => (t._1, t._2, t._3)) ==
      Set((1L, 1, 1), (2L, 0, 0), (3L, 2, 2)))

    val source = MemoryStream[(Long, String)]
    val q = graft.queries.DedupTextQueries
      .piiScrub(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("pii")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2))
      q.processAllAvailable()
      assert(rows(spark.table("pii")) == batch)
    } finally q.stop()
  }

  test("luhn_scrub emits identical candidate/card counts and redacted " +
    "text on a batch frame and on a micro-batched stream — the " +
    "checksum-validated scrub is the same operator on ingest and " +
    "release (q115's engine)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "pay 4532015112830366 by friday"),        // Luhn-valid card
      (2L, "order 4532015112830367 is not a card"),  // candidate, invalid
      (3L, "no digits in this document at all"),
      (4L, "serial 04532015112830366 is 17 digits")) // not a candidate
    def scrubbed(df: org.apache.spark.sql.DataFrame) = {
      val s = graft.functions.LuhnScrub.luhnScrub(col("text"))
      df.select(col("doc_id"), s.getField("n_candidates").as("nc"),
        s.getField("n_cards").as("nk"), s.getField("redacted").as("r"))
    }
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet

    val batch = rows(scrubbed(docs.toDF("doc_id", "text")))
    assert(batch.map(t => (t._1, t._2, t._3)) ==
      Set((1L, 1, 1), (2L, 1, 0), (3L, 0, 0), (4L, 0, 0)))
    assert(batch.find(_._1 == 1L).get._4 == "pay <CARD> by friday")

    val source = MemoryStream[(Long, String)]
    val q = scrubbed(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("luhn")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2), docs(3))
      q.processAllAvailable()
      assert(rows(spark.table("luhn")) == batch)
    } finally q.stop()
  }

  test("bpeEncodeCounts with a FIXED merge table emits identical symbol " +
    "counts on a batch frame and on a micro-batched stream — " +
    "tokenize-on-ingest with a shipped tokenizer artifact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val merges = Seq((0, "ab", 4L), (1, "", 2L), (2, "cd", 1L))
    val docs = Seq((1L, "abab cd"), (2L, "abab"), (3L, "xyz"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = rows(graft.queries.CorpusStatsQueries
      .bpeEncodeCounts(docs.toDF("doc_id", "text"), merges))
    // "abab cd" -> "m1 m2": 6 raw symbols -> 2 BPE symbols
    assert(batch == Set((1L, 6L, 2L), (2L, 4L, 1L), (3L, 3L, 3L)))
    val source = MemoryStream[(Long, String)]
    val q = graft.queries.CorpusStatsQueries
      .bpeEncodeCounts(source.toDS().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_enc")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2))
      q.processAllAvailable()
      assert(rows(spark.table("bpe_enc")) == batch)
    } finally q.stop()
  }

  test("qualityGate emits identical verdicts on a batch frame and on a " +
    "micro-batched stream of the same documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // all-alphabetic words: 300 letters / 349 chars = 0.86 ≥ the 0.81 bar
    val good = Array.tabulate(50)(i => s"word${('a' + i % 7).toChar}x").mkString(" ")
    val docs = Seq(
      (1L, good.length.toLong, good),         // passes every rule
      (2L, 9L, "too short"),                  // fails ok_length
      (3L, 21L, "a b c d e f g h i j k")      // fails word-len + alpha
    )
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(7))).toSet

    val batch = rows(graft.queries.DedupTextQueries
      .qualityGate(docs.toDF("doc_id", "n_chars", "text")))
    assert(batch.map(t => t._1 -> t._3) == Set(1L -> true, 2L -> false, 3L -> false))

    val source = MemoryStream[(Long, Long, String)]
    val q = graft.queries.DedupTextQueries
      .qualityGate(source.toDS().toDF("doc_id", "n_chars", "text"))
      .writeStream.format("memory").queryName("quality")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2))
      q.processAllAvailable()
      assert(rows(spark.table("quality")) == batch)
    } finally q.stop()
  }

  test("mixtureFilter over a static rates table admits identical rows on " +
    "batch and stream (stream-static broadcast join)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 200L).map(i => (i, if (i % 3 == 0) "en" else "mi"))
    val rates = Seq(("en", 0.25), ("mi", 0.9)).toDF("lang", "rate")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val batch = rows(graft.queries.IngestQueries
      .mixtureFilter(docs.toDF("doc_id", "lang"), rates))
    // md5-threshold selection really thins both languages
    assert(batch.nonEmpty && batch.size < docs.size)
    assert(batch.exists(_._2 == "en") && batch.exists(_._2 == "mi"))

    val source = MemoryStream[(Long, String)]
    val q = graft.queries.IngestQueries
      .mixtureFilter(source.toDS().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("mixture")
      .outputMode("append").start()
    try {
      docs.grouped(75).foreach { g => source.addData(g: _*); q.processAllAvailable() }
      assert(rows(spark.table("mixture")) == batch)
    } finally q.stop()
  }

  test("mixtureFilter governs a language missing from the rates table " +
    "via unknownLangRate instead of silently dropping it") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val enOnly = Seq(("en", 0.5)).toDF("lang", "rate")
    val admitAll = graft.queries.IngestQueries.mixtureFilter(docs, enOnly)
      .collect().map(r => r.getString(1))
    // default 1.0: every unknown-lang doc survives until the profile
    // catches up; the known lang is still thinned
    assert(admitAll.count(_ == "xx") == 30)
    assert(admitAll.count(_ == "en") < 30)
    val quarantined = graft.queries.IngestQueries
      .mixtureFilter(docs, enOnly, unknownLangRate = 0.0)
      .collect().map(r => r.getString(1))
    assert(!quarantined.contains("xx") && quarantined.nonEmpty)
  }
}
