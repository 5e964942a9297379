package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityQueries

/** q165's gate: the nprobe knob buys recall monotonically, every
  * partial probe scans a strict fraction of flat PQ's full scan, and
  * the inverted file dominates on recall PER SCANNED ROW at every
  * tested breadth (the claim an IVF tier actually makes — outright hit
  * parity with a full-scan baseline needs full coverage; see the q165
  * scaladoc). Comparisons are cross-multiplied integers — no float
  * recall enters the assertion.
  */
class NprobeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("hits are monotone in nprobe, scanned stays a strict fraction " +
    "of the flat-PQ full scan, and hits/scanned dominates flat PQ's " +
    "at every nprobe (cross-multiplied)") {
    graft.core.CacheScope.withScope {
      val rows = SimilarityQueries.queries("q165_recall_vs_nprobe")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(_._1)
      assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
      val hits = rows.map(_._2)
      assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
        s"hits not monotone: ${hits.mkString(",")}")
      assert(rows.last._2 > rows.head._2,
        "widening the probe 8x bought no recall at all")
      rows.foreach { case (np, h, scanned, pqHits, pqScanned) =>
        assert(scanned < pqScanned,
          s"nprobe=$np scanned $scanned >= full scan $pqScanned")
        // recall-per-scanned-row dominance: h/scanned > pqHits/pqScanned
        assert(h * pqScanned > pqHits * scanned,
          s"nprobe=$np: $h/$scanned not denser than $pqHits/$pqScanned")
      }
    }
  }
}
