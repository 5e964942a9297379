package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q105's maintenance engine
  * ([[IncrementalClusters.merge]]): the
  * incremental contract→merge→relabel step must (a) equal a
  * from-scratch connected-components run over the combined edge set —
  * the invariant the DuckDB oracle holds on the real corpus — and (b)
  * do it on a contracted graph whose size is the DELTA frontier, not
  * the corpus: the property that makes nightly cluster maintenance an
  * O(delta) job at 100 TB.
  */
class IncrementalClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edgeDF(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("src", "dst")
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental merge equals from-scratch components over the " +
    "combined edges — joins, creations, and a delta doc BRIDGING two " +
    "base components") {
    // base: components {1,2,3}, {10,11}, {20,21}, plus loner pairs far away
    val base = edgeDF(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)))
    // delta: 100 joins {1,2,3}; 200 bridges {10,11} and {20,21};
    // 300-301 create a brand-new cluster of their own
    val delta = edgeDF(Seq((100L, 2L), (200L, 11L), (200L, 21L),
      (300L, 301L)))
    val baseLabels = ConnectedComponents.labels(spark, base)
    val (contracted, labels) = IncrementalClusters.merge(spark, baseLabels, delta)

    val expected = labelMap(
      ConnectedComponents.labels(spark, base.unionByName(delta)))
    assert(labelMap(labels) == expected,
      "incremental must equal recompute over base ∪ delta")
    // the bridge case really merged: 10,11,20,21,200 share one label
    assert(Seq(10L, 11L, 20L, 21L, 200L).map(expected).distinct.size == 1)
    // the contracted graph is the delta frontier: one row per delta edge
    assert(contracted.count() == 4,
      "contraction must touch only delta-incident structure")
  }

  test("the contracted graph stays O(delta) as the BASE corpus grows " +
    "100x: the frontier bound that makes maintenance incremental") {
    def baseOf(n: Int) = edgeDF(
      (0 until n).map(i => (i * 10L, i * 10L + 1))) // n disjoint pairs
    val delta = edgeDF(Seq((5L, 0L), (7000L, 7001L)))
    val small = IncrementalClusters.merge(spark, ConnectedComponents.labels(spark, baseOf(10)), delta)
    val large = IncrementalClusters.merge(spark, ConnectedComponents.labels(spark, baseOf(1000)), delta)
    assert(small._1.count() == 2 && large._1.count() == 2,
      "contracted size must not scale with the base component count")
    // and both are still exact
    assert(labelMap(small._2).get(5L) == Some(0L))
    assert(labelMap(large._2).get(5L) == Some(0L))
  }

  test("randomized property sweep: incremental == recompute over seeded " +
    "random graphs with random delta splits — including multi-way " +
    "bridges, dense cliques, and deltas that touch nothing") {
    val rnd = new scala.util.Random(11L) // deterministic: round-11 seed
    (1 to 12).foreach { round =>
      val nNodes = 8 + rnd.nextInt(40)
      val nEdges = 4 + rnd.nextInt(60)
      val edges = Seq.fill(nEdges) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        (a, if (a == b) a + 1 else b) // no self-loops from generation
      }
      val mod = 2 + rnd.nextInt(5)
      val all = edgeDF(edges)
      val got = labelMap(IncrementalClusters.maintain(spark, all,
        _ % mod === 0))
      val expected = labelMap(ConnectedComponents.labels(spark, all))
      assert(got == expected,
        s"round $round (nodes=$nNodes edges=$nEdges mod=$mod): " +
          s"incremental diverged from recompute")
    }
  }

  test("untouched base components keep their labels verbatim; docs " +
    "absent from all edges never appear in the label frame") {
    val base = edgeDF(Seq((1L, 2L), (50L, 51L)))
    val delta = edgeDF(Seq((100L, 1L)))
    val baseLabels = ConnectedComponents.labels(spark, base)
    val (_, labels) = IncrementalClusters.merge(spark, baseLabels, delta)
    val got = labelMap(labels)
    assert(got(50L) == 50L && got(51L) == 50L, "untouched component intact")
    assert(got(100L) == 1L && got(1L) == 1L && got(2L) == 1L)
    assert(!got.contains(999L))
  }
}
