package graft.core

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.SimilarityQueries

/** Quality + completeness bounds for the ANN-pruned pair-mining variant
  * (the 100 TB escape hatch when a label block makes q77's exact
  * in-label argmax O(n²/label) compute). Contract:
  *   - COMPLETE: one row per (label, vec_id), exactly q77's cardinality
  *     — the exact fallback covers every LSH-uncovered vector.
  *   - EXACT on a clustered corpus: near neighbors collide in some band
  *     with high probability, so the argmax matches the exact answer
  *     for ≥90% of vectors.
  *   - On the driver's near-random embeddings the variant still returns
  *     a full, well-formed answer (recall is corpus-conditional there —
  *     same caveat as SimilarityRecallSpec's structureless case).
  */
class PrunedPairMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  private def keyed(df: DataFrame): Map[(String, Long), (Long, Double)] =
    df.select("label", "vec_id", "pair_id", "sim").collect()
      .map(r => ((String.valueOf(r.get(0)), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap

  test("clustered corpus: pruned argmax matches exact q77 for >=90% of " +
    "vectors and covers every vector exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
    val pts = (0L until 240L).map { i =>
      val c = centers((i % 6).toInt)
      (i, s"lab${(i % 3).toInt}",
        c.map(x => (x + 0.08 * rnd.nextGaussian()).toFloat))
    }
    val emb = pts.toDF("vec_id", "label", "embedding")
    val exact = keyed(SimilarityQueries.pairMiningExact(emb, emb))
    val pruned = keyed(SimilarityQueries.prunedPairMiningOver(emb))
    assert(pruned.keySet == exact.keySet,
      "pruned mining must answer for exactly the vectors q77 answers for")
    val hit = exact.keys.count(k => pruned(k) == exact(k))
    val recall = hit.toDouble / exact.size
    assert(recall >= 0.9, s"argmax recall $recall over ${exact.size} vectors")
  }

  test("driver embeddings: full coverage, one row per vector, and every " +
    "fallback row equals the exact answer by construction") {
    val exact = keyed(SimilarityQueries.q77PairMining(spark, sf))
    val pruned = keyed(SimilarityQueries.prunedPairMining(spark, sf))
    assert(pruned.keySet == exact.keySet)
    // the pruned sim can never EXCEED the exact in-label maximum
    exact.foreach { case (k, (_, exactSim)) =>
      assert(pruned(k)._2 <= exactSim + 1e-12, s"$k pruned above exact max")
    }
  }
}
