package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AttributionRow, StreamingAttribution}

/** q159's state machine held pure: folding randomized batched arrivals
  * with a nondecreasing watermark that never outruns a future event —
  * the collapsed below-watermark touch set (one maximum) plus the
  * disorder-horizon touches must attribute every purchase exactly as
  * the full event log does.
  */
class StreamingAttributionSpec extends AnyFunSuite {

  private val W = 120L // lookback window for the trials

  /** Brute-force q156 semantics over the full log. */
  private def expected(uid: Long, events: Seq[(Long, Long, Int)])
      : Seq[AttributionRow] = {
    val touches = events.collect { case (ms, id, t) if t <= 1 => (ms, id) }
    events.collect { case (ms, id, 2) => (ms, id) }.sorted.map { p =>
      val cands = touches.filter(t =>
        t._1 < p._1 || (t._1 == p._1 && t._2 < p._2))
      if (cands.isEmpty) AttributionRow(uid, p._2, None, None)
      else {
        val t = cands.max
        if (p._1 - t._1 <= W)
          AttributionRow(uid, p._2, Some(t._2), Some(p._1 - t._1))
        else AttributionRow(uid, p._2, None, None)
      }
    }
  }

  test("500 randomized watermark-consistent arrival orders: the bounded " +
    "state (max below-watermark touch + disorder horizon) attributes " +
    "every purchase exactly as the full log, whatever the batching") {
    val rnd = new scala.util.Random(159159L)
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(25)
      // (ms, unique id, type 0=view 1=click 2=purchase 3=other)
      val events = (0 until n).map(i =>
        (rnd.nextInt(500).toLong + 1L, i.toLong, rnd.nextInt(4)))
      val want = expected(9L, events)
      val order = rnd.shuffle(events)
      val cuts = order.grouped(1 + rnd.nextInt(5)).toSeq
      var wm = Long.MinValue
      var best = (Long.MinValue, Long.MinValue)
      var touches = Seq.empty[(Long, Long)]
      var pending = Seq.empty[(Long, Long)]
      val out = Seq.newBuilder[AttributionRow]
      cuts.zipWithIndex.foreach { case (batch, i) =>
        val future = cuts.drop(i).flatten
        val bound = if (future.isEmpty) Long.MaxValue
          else future.map(_._1).min
        wm = math.max(wm, bound - rnd.nextInt(3))
        val touchesAll = touches ++ batch.collect {
          case (ms, id, t) if t <= 1 => (ms, id) }
        val (done, still) = (pending ++ batch.collect {
          case (ms, id, 2) => (ms, id) }).partition(_._1 < wm)
        out ++= done.sorted.map(p =>
          StreamingAttribution.verdict(9L, p, best, touchesAll, W))
        val (nb, nt) = StreamingAttribution.retainTouches(best, touchesAll, wm)
        best = nb; touches = nt; pending = still
      }
      // end-of-stream flush
      out ++= pending.sorted.map(p =>
        StreamingAttribution.verdict(9L, p, best, touches, W))
      val got = out.result().sortBy(_.purchase_id)
      assert(got == want.sortBy(_.purchase_id),
        s"events=$events order=$order")
    }
  }
}
