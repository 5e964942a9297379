package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.functions.VectorFunctions.cosineSimilarity
import graft.queries.SimilarityQueries

/** Quality bound for the IVF(k-means) search (q45). IVF's recall promise
  * is conditional on the corpus having cluster structure — on a clustered
  * corpus probing nprobe/kCells of the data must recover (almost) the
  * exact top-k; on a structureless corpus the information-theoretic best
  * is ~the probed fraction. Both sides are pinned here: ≥0.9 on generated
  * blobs, and comfortably-above-the-probed-fraction on the driver's
  * embeddings table (measured: its vectors are near-random — within-label
  * mean cosine ≈ 0.01, so 0.9 there is unattainable for ANY 4-of-16-cell
  * index, not an implementation property).
  */
class SimilarityRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def bruteTop10(emb: DataFrame, queryId: Long): Set[Long] = {
    val qv = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosineSimilarity(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
  }

  private def recallAt10(emb: DataFrame, qid: Long): Double = {
    val approx = SimilarityQueries.ivfSearch(emb, qid, kCells = 8)
      .collect().map(_.getLong(0)).toSet
    approx.intersect(bruteTop10(emb, qid)).size / 10.0
  }

  test("clustered corpus: recall@10 >= 0.9 probing 4 of 8 cells") {
    import spark.implicits._
    // 8 well-separated direction blobs on the 16-sphere, fixed seed
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian()))
    val pts = (0L until 400L).map { i =>
      val c = centers((i % 8).toInt)
      val v = c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (i, v)
    }
    val emb = pts.toDF("vec_id", "embedding")
    val recalls = Seq(0L, 3L, 101L).map(recallAt10(emb, _))
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall $avg, per-query $recalls")
  }

  test("q46 hyperplane LSH recalls >=90% of true near-dup pairs " +
    "(clustered 64-dim corpus, cos >= 0.9)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val pts = (0L until 300L).map { i =>
      val c = centers((i % 10).toInt)
      (i, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat))
    }
    val emb = pts.toDF("vec_id", "embedding")
    // exact >= 0.9 pairs via the all-pairs scan
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exact = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("sim", cosineSimilarity(col("ea"), col("eb")))
      .filter(col("sim") >= 0.9)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.lshNearDup(emb, 0.9)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall of ${exact.size} true pairs")
  }

  test("structureless corpus: recall still beats the probed fraction 2x") {
    val emb = Tables.embeddings(spark, sf)
    val recalls = Seq(0L, 7L, 23L).map { qid =>
      val approx = SimilarityQueries.ivfSearch(emb, qid) // 4 of 16 cells
        .collect().map(_.getLong(0)).toSet
      approx.intersect(bruteTop10(emb, qid)).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    // probed fraction = 4/16 = 0.25; random cells would recall ~0.25
    assert(avg >= 0.5, s"avg recall $avg, per-query $recalls")
  }
}
