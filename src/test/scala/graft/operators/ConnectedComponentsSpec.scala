package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Both ConnectedComponents paths must compute the same min-reachable-id
  * fixpoint — including on the shapes that stress each one: long chains
  * (worst diameter for propagation) and random sparse graphs.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], threshold: Long): Map[Long, Long] = {
    import spark.implicits._
    graft.core.CacheScope.withScope {
      val df = edges.toDF("src", "dst").repartition(7)
      ConnectedComponents.labels(spark, df, localThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
  }

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val nodes = adj.keySet.toSeq.sorted
    val label = scala.collection.mutable.Map[Long, Long]()
    nodes.foreach { n =>
      if (!label.contains(n)) { // BFS from the smallest unseen node
        var frontier = Set(n)
        while (frontier.nonEmpty) {
          frontier.foreach(label(_) = n)
          frontier = frontier.flatMap(adj).filterNot(label.contains)
        }
      }
    }
    label.toMap
  }

  test("a 24-node chain (worst diameter: one hop of progress per round) " +
    "agrees with BFS ground truth on both paths") {
    val chain = (0L until 23L).map(i => (i + 1, i)) // descending links
    val truth = bruteComponents(chain)
    assert(run(chain, threshold = Long.MaxValue) == truth) // local
    assert(run(chain, threshold = 0) == truth) // forced distributed
    assert(truth.values.toSet == Set(0L)) // one component, min id 0
  }

  test("random sparse graph: local union-find == distributed propagation") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)(
      (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val truth = bruteComponents(edges)
    assert(run(edges, threshold = Long.MaxValue) == truth)
    assert(run(edges, threshold = 0) == truth)
  }

  test("iterative path releases its checkpointed label RDDs with the " +
    "enclosing scope (no orphaned storage across runs)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.core.CacheScope.withScope {
      val df = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
      ConnectedComponents.labels(spark, df, localThreshold = 0).collect()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
  }

  test("self-contained pairs and isolated stars keep distinct components") {
    val edges = Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 31L))
    val got = run(edges, threshold = Long.MaxValue)
    assert(got == Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L,
      22L -> 20L, 30L -> 30L, 31L -> 30L))
  }
}
