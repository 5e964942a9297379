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

  test("a 10,000-node chain converges in O(log diameter) rounds on the " +
    "distributed path (pointer jumping; plain propagation would take " +
    "10,000 rounds — round-8 verdict #7)") {
    import spark.implicits._
    graft.core.CacheScope.withScope {
      val chain = (1L until 10000L).map(i => (i, i + 1))
      val sym = graft.core.CacheScope.track(
        chain.toDF("src", "dst")
          .select(col("src"), col("dst"))
          .union(chain.toDF("src", "dst")
            .select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
          .persist())
      val (labels, rounds) = ConnectedComponents.iterativeLabels(sym)
      val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == 10000)
      assert(got.forall(_._2 == 1L),
        s"all labels must reach the component min, got ${got.filter(_._2 != 1L).take(5).toSeq}")
      // distance-to-min doubles per round: ceil(log2(10000)) = 14, plus
      // the no-change detection round and slack
      assert(rounds <= 20, s"$rounds rounds for diameter 9999")
    }
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
