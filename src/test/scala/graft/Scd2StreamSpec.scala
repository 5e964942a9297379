package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Scd2Segment, StreamingScd2}

/** q177's state machine held pure: folding randomized batched arrivals
  * with a nondecreasing watermark that never outruns a future event —
  * the single open-run summary plus the disorder-horizon buffer must
  * reproduce the batch gaps-and-islands dimension exactly, whatever
  * the batching.
  */
class Scd2StreamSpec extends AnyFunSuite {

  /** Brute-force q176 semantics over the full log: sort, pack runs,
    * close each segment at the next run's start.
    */
  private def expected(uid: Long, events: Seq[(Long, Long, String)])
      : Seq[Scd2Segment] = {
    val sorted = events.sortBy(e => (e._1, e._2))
    val runs = Seq.newBuilder[(String, Long, Long)] // (type, from, n)
    var cur: Option[(String, Long, Long)] = None
    sorted.foreach { case (ms, _, tpe) =>
      cur match {
        case Some((t, f, n)) if t == tpe => cur = Some((t, f, n + 1))
        case Some(r) => runs += r; cur = Some((tpe, ms, 1L))
        case None => cur = Some((tpe, ms, 1L))
      }
    }
    cur.foreach(runs += _)
    val rs = runs.result()
    rs.zipWithIndex.map { case ((t, f, n), i) =>
      Scd2Segment(uid, t, f, n,
        if (i + 1 < rs.size) Some(rs(i + 1)._2) else None)
    }
  }

  test("500 randomized watermark-consistent arrival orders: the open-run " +
    "summary + disorder buffer reproduce the batch dimension exactly, " +
    "whatever the batching") {
    val rnd = new scala.util.Random(177177L)
    val types = Vector("A", "B", "C")
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(25)
      // unique ids; ms collide deliberately so the (ms, id) tiebreak
      // is exercised
      val events = (0 until n).map(i =>
        (rnd.nextInt(120).toLong + 1L, i.toLong,
          types(rnd.nextInt(types.size))))
      val want = expected(9L, events)
      val order = rnd.shuffle(events)
      val cuts = order.grouped(1 + rnd.nextInt(5)).toSeq
      var wm = Long.MinValue
      var open: Option[StreamingScd2.Run] = None
      var buf = Seq.empty[(Long, Long, String)]
      val out = Seq.newBuilder[Scd2Segment]
      cuts.zipWithIndex.foreach { case (batch, i) =>
        val future = cuts.drop(i).flatten
        val bound = if (future.isEmpty) Long.MaxValue
          else future.map(_._1).min
        wm = math.max(wm, bound - rnd.nextInt(3))
        val (finals, still) = (buf ++ batch).partition(_._1 < wm)
        val (closed, nopen) =
          StreamingScd2.foldFinal(9L, open, finals.sortBy(e => (e._1, e._2)))
        out ++= closed
        open = nopen
        buf = still
      }
      // end-of-stream flush: wm has passed everything
      val (closed, fin) =
        StreamingScd2.foldFinal(9L, open, buf.sortBy(e => (e._1, e._2)))
      out ++= closed
      out ++= fin.map(r => Scd2Segment(9L, r.tpe, r.from, r.n, None))
      val got = out.result().sortBy(_.valid_from_ms)
      assert(got == want, s"events=$events order=$order")
    }
  }
}
