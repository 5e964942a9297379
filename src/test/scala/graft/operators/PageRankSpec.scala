package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.GraphQueries

/** q130's fixed-point PageRank must equal an exact scalar replay of the
  * same integer recurrence — if it does on one partitioning, it does on
  * every partitioning, because BIGINT addition is commutative (that is
  * the whole point of the fixed-point design; a float PageRank could
  * pass today and fail under a different reduction tree).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** First 60 bits of md5(s) as a non-negative Long — the engine's
    * md5-hash contract (queries.package scaladoc).
    */
  private def md60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("q130 equals the exact integer recurrence replayed on the driver") {
    val d = TestSpark.Sf0001
    val got = graft.core.CacheScope.withScope {
      GraphQueries.q130PageRank(spark, d)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val n = got.size
    assert(n == 500)

    // scalar replay: same graph, same recurrence, same integer ops
    val scale = 1000000000000L
    val teleport = scale * 15L / 100L
    val edges = for {
      src <- 0L until n.toLong
      j <- 0 until 3
    } yield (src, md60(s"pr:$src:$j") % n)
    var rank = Array.fill(n)(scale)
    for (_ <- 1 to 5) {
      val in = Array.fill(n)(0L)
      edges.foreach { case (src, dst) => in(dst.toInt) += rank(src.toInt) / 3 }
      rank = Array.tabulate(n)(i => teleport + (85L * in(i)) / 100L)
    }
    (0 until n).foreach { i =>
      assert(got(i.toLong) == rank(i), s"doc $i")
    }
    // sanity: damping spreads mass — ranks differ across docs
    assert(rank.distinct.length > 100)
  }
}
