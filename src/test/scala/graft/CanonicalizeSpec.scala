package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.DedupTextQueries

/** q171's release election: one row per REAL duplicate cluster (q59's
  * non-singleton components, exactly), and the kept member dominates
  * every member of its cluster on the (q_score, n_chars, min doc_id)
  * key — the elected representative is the argmax, not merely a member.
  */
class CanonicalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q171 emits exactly q59's size>=2 clusters and its kept_doc is " +
    "the quality argmax of each cluster") {
    graft.core.CacheScope.withScope {
      val d = TestSpark.Sf0001
      val canon = DedupTextQueries.q171ClusterCanonicalize(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(canon.nonEmpty, "fixture has duplicate clusters by design")
      val q59 = DedupTextQueries.q59DupClusters(spark, d)
        .filter(col("cluster_size") >= 2)
        .select("doc_id", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val q59Clusters = q59.groupBy(_._2).map { case (c, ms) =>
        c -> ms.map(_._1).toSet
      }
      assert(canon.map(_._1).toSet == q59Clusters.keySet,
        "q171 clusters differ from q59's non-singleton components")
      assert(canon.forall { case (c, n, _) =>
        q59Clusters(c).size.toLong == n
      }, "member counts differ from q59")
      // the elected doc must be the argmax of the election key
      val qual = DedupTextQueries.qualityGate(
          graft.core.Tables.documents(spark, d))
        .select(col("doc_id"),
          (col("ok_length").cast("long") + col("ok_word_len").cast("long") +
            col("ok_alpha").cast("long")).as("q"))
        .join(graft.core.Tables.documents(spark, d)
          .select(col("doc_id"), col("n_chars")), "doc_id")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      canon.foreach { case (c, _, kept) =>
        val best = q59Clusters(c).maxBy { id =>
          val (q, len) = qual(id); (q, len, -id)
        }
        assert(kept == best,
          s"cluster $c kept $kept but the election argmax is $best")
      }
    }
  }
}
