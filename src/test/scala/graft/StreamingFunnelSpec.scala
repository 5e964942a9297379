package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.{EventQueries, StreamingQueries}

/** q144's state fold held on its own: the batchId-addressed funnel
  * state is (a) LOSSLESS under pruning and ANY batch order — folding a
  * deliberately disordered split reproduces the batch funnel exactly,
  * (b) idempotent under trigger REPLAY (a re-run batch rewrites its
  * state dir to the same content), and (c) actually PRUNED (the state
  * is smaller than the event log it summarizes).
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def eventsMs = graft.core.Tables.events(spark, sf)
    .select(col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"))

  test("folding a disordered 4-way split reproduces the batch funnel " +
    "bit-for-bit, a replayed middle batch is idempotent, and the final " +
    "state is strictly smaller than the event log") {
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "funnel_spec_state")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)

    val ev = eventsMs
    // DISORDERED split: batch i takes rows with md5-bucket i, so event
    // time has no relation to arrival batch (late data everywhere)
    val bucket = abs(hash(col("user_id"), col("event_type"), col("ms"))) % 4
    val splits = (0 until 4).map(i => ev.filter(bucket === i))
    splits.zipWithIndex.foreach { case (b, i) =>
      StreamingQueries.funnelStateBatch(spark, root.toString)(b, i.toLong)
    }
    // replay batch 2 (at-least-once): state dir must be rewritten to
    // identical content, so downstream batches are unaffected
    val before = spark.read.parquet(s"$root/batch_2").collect().toSet
    StreamingQueries.funnelStateBatch(spark, root.toString)(splits(2), 2L)
    val after = spark.read.parquet(s"$root/batch_2").collect().toSet
    assert(before == after)

    val state = spark.read.parquet(s"$root/batch_3")
    graft.core.CacheScope.withScope {
      val st = graft.core.CacheScope.track(state.persist())
      val evp = graft.core.CacheScope.track(ev.persist())
      val streamed = EventQueries.funnelFrame(st).orderBy("user_id").collect()
      val batch = EventQueries.funnelFrame(evp).orderBy("user_id").collect()
      assert(streamed.toSeq == batch.toSeq)
    }
    // the prune bites: state rows < distinct event rows
    assert(state.count() < ev.distinct().count())
    fs.delete(root, true)
  }

  test("q148's retention rule is LOSSLESS for any disorder consistent " +
    "with the watermark: 500 randomized trials of batched arrivals with " +
    "a nondecreasing watermark that never outruns a future event — the " +
    "pruned state's verdict equals the full-set verdict every time") {
    import graft.streaming.StreamingFunnel
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(30)
      val events = Seq.fill(n)(
        (rnd.nextInt(1000).toLong + 1L, rnd.nextInt(4)))
      val w = 50L + rnd.nextInt(300)
      val views = events.collect { case (t, 0) => t }
      val clicks = events.collect { case (t, 1) => t }
      val purch = events.collect { case (t, 2) => t }
      val s1Full = if (views.isEmpty) Long.MaxValue else views.min
      val expect = StreamingFunnel.verdict(7L, s1Full, clicks, purch, w)
      // random arrival order, random batch cuts; the watermark before
      // each batch is anything ≤ every future event's ts (the engine's
      // no-late-arrivals premise), nondecreasing
      val order = rnd.shuffle(events)
      val cuts = order.grouped(1 + rnd.nextInt(5)).toSeq
      var wm = Long.MinValue
      var s1 = Long.MaxValue
      var rc = Seq.empty[Long]
      var rp = Seq.empty[Long]
      cuts.zipWithIndex.foreach { case (batch, i) =>
        val future = cuts.drop(i).flatten
        val bound = if (future.isEmpty) Long.MaxValue else future.map(_._1).min
        wm = math.max(wm, bound - rnd.nextInt(3))
        batch.foreach {
          case (t, 0) => s1 = math.min(s1, t)
          case (t, 1) => rc = rc :+ t
          case (t, 2) => rp = rp :+ t
          case _ => ()
        }
        rc = StreamingFunnel.retain(rc, s1, wm, w)
        rp = StreamingFunnel.retain(rp, s1, wm, w)
      }
      val got = StreamingFunnel.verdict(7L, s1, rc, rp, w)
      assert(got == expect, s"w=$w events=$events order=$order")
    }
  }
}
