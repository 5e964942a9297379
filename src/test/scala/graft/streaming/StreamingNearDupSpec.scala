package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.MinHashBandKeys
import org.apache.spark.unsafe.types.UTF8String

/** Online LSH near-dup over a document stream: collisions resolve against
  * everything inside the state horizon, duplicates expire out of state
  * after the TTL.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private val TextA =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val TextC =
    "one two three four five six seven eight nine ten eleven twelve"
  // TextA with one middle word changed: shares a prefix/suffix of
  // shingles with TextA — how many BANDS collide is fixed arithmetic,
  // computed below from the expression itself, not assumed
  private val TextD =
    "alpha beta gamma delta epsilon zeta XRAY theta iota kappa lambda mu"

  private def keys(s: String): Seq[String] = {
    val arr = MinHashBandKeys.compute(UTF8String.fromString(s))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  test("copies collide in all bands against the horizon owner; disjoint " +
    "docs never collide; expired buckets forget their owner") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingNearDup.collisions(
        source.toDS().toDF("doc_id", "text", "ts"),
        watermarkDelay = "0 seconds", stateTtlMs = 60L * 60 * 1000)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    def hits(): Seq[(Long, Int, Long)] = spark.table("neardup").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

    try {
      // batch 1: A claims its 4 buckets, C claims 4 disjoint ones
      source.addData((1L, TextA, t(0)), (3L, TextC, t(0)))
      q.processAllAvailable()
      assert(hits().isEmpty)

      // batch 2: an exact copy of A collides in every band; the
      // partial-overlap doc D collides in exactly the bands whose keys
      // it shares with A (ground truth from the expression arithmetic)
      val sharedAD = keys(TextA).zip(keys(TextD)).count { case (a, d) => a == d }
      source.addData((2L, TextA, t(10)), (4L, TextD, t(10)))
      q.processAllAvailable()
      val h2 = hits()
      assert(h2.count { case (d, _, o) => d == 2L && o == 1L }
        == MinHashBandKeys.Bands)
      assert(h2.count { case (d, _, o) => d == 4L && o == 1L } == sharedAD)
      assert(h2.size == MinHashBandKeys.Bands + sharedAD)

      // two watermark-advancing sentinels (2 tokens -> no band rows, so
      // no state touched): first moves the watermark past every bucket's
      // TTL, second lets the timeouts fire and drop the state
      source.addData((90L, "tick tock", t(300)))
      q.processAllAvailable()
      source.addData((91L, "tick tock", t(301)))
      q.processAllAvailable()

      // batch 5: a fresh copy of A arrives AFTER the horizon — the old
      // owner has been forgotten, so it claims the buckets silently
      val before = hits().size
      source.addData((5L, TextA, t(310)))
      q.processAllAvailable()
      assert(hits().size == before)

      // batch 6: and a copy arriving while 5's claim is live collides
      // against 5, not against the long-expired 1
      source.addData((6L, TextA, t(315)))
      q.processAllAvailable()
      val h6 = hits().filter { case (d, _, _) => d == 6L }
      assert(h6.size == MinHashBandKeys.Bands)
      assert(h6.forall { case (_, _, o) => o == 5L })
    } finally q.stop()
  }

  /** Run batches through [[StreamingNearDup.finalityCollisions]], close
    * with two far-future sentinel docs (unique texts — they collide
    * with nothing; the first advances the watermark, the second's batch
    * fires the timeouts that flush still-open claims), and return the
    * real docs' hits.
    */
  private def runFinality(batches: Seq[Seq[(Long, String, Timestamp)]],
      delay: String, ttlMs: Long, flushTs: Long): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, Timestamp)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val q = StreamingNearDup.finalityCollisions(
        source.toDS().toDF("doc_id", "text", "ts"), delay, ttlMs)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("fin_ckpt").toString)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[NearDupHit], _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(h => (h.doc_id, h.band, h.dup_of))
        }; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
      source.addData((-1L, "finality flush sentinel alpha",
        new Timestamp(flushTs)))
      q.processAllAvailable()
      source.addData((-2L, "finality flush sentinel omega",
        new Timestamp(flushTs + 1000)))
      q.processAllAvailable()
    } finally q.stop()
    got.filter(_._1 >= 0).sortBy(h => (h._1, h._2)).toSeq
  }

  /** The batch semantics finality mode must realize: per bucket the
    * owner is the min `(ts, doc_id)` claim; everyone else emits a hit
    * per colliding band against that owner.
    */
  private def minOwnerHits(docs: Seq[(Long, String, Timestamp)])
      : Seq[(Long, Int, Long)] =
    docs.flatMap { case (id, text, ts) =>
      keys(text).zipWithIndex.map { case (k, band) => (band, k, ts.getTime, id) }
    }.groupBy(c => (c._1, c._2)).toSeq.flatMap { case ((band, _), claims) =>
      val owner = claims.minBy(c => (c._3, c._4))
      claims.filterNot(_ == owner).map(c => (c._4, band, owner._4))
    }.sortBy(h => (h._1, h._2))

  test("finality mode: ownership is EVENT-time min (ts, doc_id), not " +
    "arrival order — the earlier-ts copy arriving in a LATER batch " +
    "still owns the bucket (round-9 verdict #2)") {
    // doc 2 (ts 10min) arrives BEFORE doc 1 (ts 5min): arrival-order
    // ownership would blame 2; event-time ownership blames 1
    val docs = Seq((2L, TextA, t(10)), (1L, TextA, t(5)))
    val got = runFinality(Seq(Seq(docs.head), Seq(docs(1))),
      delay = "1 hour", ttlMs = 60L * 60 * 1000,
      flushTs = t(0).getTime + 10L * 3600 * 1000)
    assert(got.nonEmpty)
    assert(got == minOwnerHits(docs))
    assert(got.forall { case (d, _, o) => d == 2L && o == 1L },
      s"the ts-earlier doc 1 must own every bucket: $got")
  }

  test("finality mode randomized disorder sweep: arbitrary arrival " +
    "shuffles cut into arbitrary micro-batches all emit exactly the " +
    "min-(ts, doc_id)-owner hits (seeded, 4 scenarios)") {
    // four docs: two full copies of A (all bands collide), a partial
    // overlap D, a disjoint C — distinct ts per doc, disordered below
    val docs = Seq(
      (11L, TextA, t(3)), (12L, TextA, t(1)), (13L, TextD, t(8)),
      (14L, TextC, t(2)), (15L, TextA, t(6)))
    val expected = minOwnerHits(docs)
    assert(expected.nonEmpty)
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { scenario =>
      val shuffled = rnd.shuffle(docs)
      val cuts = (Seq(0, shuffled.size) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(shuffled.size))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val got = runFinality(batches, delay = "1 hour",
        ttlMs = 60L * 60 * 1000, flushTs = t(0).getTime + 10L * 3600 * 1000)
      assert(got == expected,
        s"scenario $scenario (batches ${batches.map(_.size)}) diverged")
    }
  }

  test("finality mode property sweep: random duplicate multiplicities, " +
    "random ts assignments WITH ties, random arrival shuffles and " +
    "batch cuts — every case emits exactly the min-(ts, doc_id)-owner " +
    "hits (the tie-break under disorder, not just distinct stamps)") {
    val rnd = new scala.util.Random(42)
    val texts = Seq(TextA, TextC, TextD)
    (1 to 5).foreach { scenario =>
      val n = 4 + rnd.nextInt(4)
      // ts drawn from a SMALL minute pool so equal-ts claims in shared
      // buckets are likely — finality must close the whole ts before
      // judging, then break ties by doc_id
      val docs = (1 to n).map(i =>
        (10L + i, texts(rnd.nextInt(texts.size)), t(rnd.nextInt(4))))
      val expected = minOwnerHits(docs)
      val shuffled = rnd.shuffle(docs)
      val cuts = (Seq(0, shuffled.size) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(shuffled.size))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => shuffled.slice(a, b) }
      val got = runFinality(batches, delay = "1 hour",
        ttlMs = 60L * 60 * 1000, flushTs = t(0).getTime + 10L * 3600 * 1000)
      assert(got == expected,
        s"scenario $scenario (docs $docs, batches ${batches.map(_.size)}) diverged")
    }
  }

  test("finality mode horizon: buckets expire at the TTL like the " +
    "arrival mode — a copy arriving after the horizon claims silently, " +
    "a copy inside the fresh horizon blames the NEW owner") {
    // TTL 1h: doc 21 (ts 0min) expires before doc 22 (ts 120min)
    // arrives; 23 (ts 125min) collides against 22, not 21
    val docs = Seq((21L, TextA, t(0)), (22L, TextA, t(120)),
      (23L, TextA, t(125)))
    val got = runFinality(docs.map(Seq(_)), delay = "10 minutes",
      ttlMs = 60L * 60 * 1000, flushTs = t(0).getTime + 24L * 3600 * 1000)
    assert(got.nonEmpty && got.forall { case (d, _, o) => d == 23L && o == 22L },
      s"only 23-vs-22 hits may emit across the expired horizon: $got")
  }
}
