package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.SimilarityQueries

/** Property sweep for the quantization tiers over RANDOMIZED vectors —
  * adversarial shapes the real embeddings table cannot produce:
  * constant (zero-span) dimensions, huge magnitude spread, negative
  * ranges, exact grid-boundary values. Fixed-seed scalacheck data,
  * evaluated as one Spark job per property.
  */
class QuantPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 16
  private val genVec: Gen[Array[Float]] = Gen.listOfN(dim,
    Gen.frequency(
      8 -> Gen.chooseNum(-100.0, 100.0),
      2 -> Gen.oneOf(0.0, 1.0, -1.0, 1e6, -1e6),
      1 -> Gen.chooseNum(-1e-6, 1e-6)))
    .map(_.map(_.toFloat).toArray)

  private lazy val corpus: Seq[(Long, Array[Float])] = {
    val vecs = Gen.listOfN(200, genVec)
      .pureApply(Gen.Parameters.default, Seed(1234L))
    // a constant dimension across the whole corpus -> span 0 everywhere
    val pinned = vecs.map { v => v(3) = 7.5f; v }
    pinned.zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  test("int8 grid quantization on random vectors: codes in [0,255], " +
    "bin-center reconstruction within span/2, zero-span dims exact") {
    import spark.implicits._
    val emb = corpus.toDF("vec_id", "embedding")
    val codes = SimilarityQueries.sqCodes(emb)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val stats = codes.select(
      explode(arrays_zip(
        col("codes"),
        SimilarityQueries.sqDequant(col("codes")).as("recon"),
        col("embedding").cast("array<double>").as("orig"),
        col("spans"))).as("z"))
      .select(col("z.codes").as("code"), col("z.recon").as("recon"),
        col("z.orig").as("orig"), col("z.spans").as("span"))
    assert(stats.filter(col("code") < 0 || col("code") > 255).count() == 0)
    // |orig - recon| <= span/2 with relative fp slack (spans reach 1e4
    // here, so the absolute 1e-12 slack of the corpus test is too tight)
    assert(stats.filter(abs(col("orig") - col("recon")) >
      col("span") / 2 * (1 + 1e-9) + lit(1e-9)).count() == 0)
    // the pinned dimension: span 0 -> code 0 and recon == the pin
    val pinnedRows = codes.select(
      element_at(col("codes"), 4).as("c"),
      element_at(SimilarityQueries.sqDequant(col("codes")), 4).as("r"))
      .collect()
    assert(pinnedRows.forall(r => r.getAs[Int]("c") == 0 &&
      r.getAs[Double]("r") == 7.5))
  }

  test("frozen-grid coding of out-of-distribution vectors clamps to the " +
    "edge bins and never throws") {
    import spark.implicits._
    val base = corpus.take(100).toDF("vec_id", "embedding")
    val wild = Seq(
      (900L, Array.fill(dim)(Float.MaxValue / 2)),
      (901L, Array.fill(dim)(-1e30f)),
      (902L, Array.fill(dim)(0f))).toDF("vec_id", "embedding")
    val grid = SimilarityQueries.sqGrid(base)
    val out = SimilarityQueries.sqCodesAgainst(wild, grid)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    assert(out(900L).forall(c => c == 255 || c == 0)) // 0 on zero-span dims
    assert(out(901L).forall(c => c == 0))
    assert(out(902L).forall(c => c >= 0 && c <= 255))
  }
}
