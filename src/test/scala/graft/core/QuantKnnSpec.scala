package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.SimilarityQueries

/** q119's scalar-quantization machinery: code range, dequantization error
  * bound, and end-to-end search quality (ADC shortlist + exact re-rank
  * recovers the exact top-10 on the driver's embeddings — with 8-bit
  * codes the per-dimension reconstruction error is ≤ span/2 ≈ 0.2% of
  * the value range, far below the corpus' similarity gaps).
  */
class QuantKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("codes are int in [0,255]; bin-center dequantization is within " +
    "span/2 of the original value on every dimension") {
    val emb = Tables.embeddings(spark, sf)
    val codes = SimilarityQueries.sqCodes(emb)
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val stats = codes.select(
      explode(arrays_zip(
        col("codes"),
        SimilarityQueries.sqDequant(col("codes")).as("recon"),
        col("embedding").cast("array<double>").as("orig"),
        col("spans"))).as("z"))
      .select(
        col("z.codes").as("code"), col("z.recon").as("recon"),
        col("z.orig").as("orig"), col("z.spans").as("span"))
    val bad = stats.filter(col("code") < 0 || col("code") > 255).count()
    assert(bad == 0, "codes outside [0,255]")
    // |orig - recon| <= span/2 (+ tiny fp slack); zero-span dims exact
    val offGrid = stats.filter(
      abs(col("orig") - col("recon")) > col("span") / 2 + lit(1e-12)).count()
    assert(offGrid == 0, "dequantized value farther than half a bin")
  }

  test("q119 ADC + re-rank returns the exact brute-force top-10 on the " +
    "driver's embeddings, with adc_sim tracking exact sim") {
    val exact = SimilarityQueries.q40KnnBrute(spark, sf)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val got = SimilarityQueries.q119QuantKnn(spark, sf).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == exact,
      "quantized search diverged from exact top-10")
    got.foreach { r =>
      val adc = r.getAs[Double]("adc_sim"); val sim = r.getAs[Double]("sim")
      assert(math.abs(adc - sim) < 0.05,
        s"ADC estimate $adc far from exact $sim")
    }
  }

  test("q121's sidecar metadata parses back to the exact built grid " +
    "and centroids — bit-identical to a recompute from the corpus") {
    val meta = SimilarityQueries.sqIndexMeta(spark, sf)
    assert(meta.mins.length == 64 && meta.spans.length == 64)
    assert(meta.centroids.length == 16)
    val g = SimilarityQueries.sqGrid(Tables.embeddings(spark, sf)).head()
    assert(meta.mins.toSeq == g.getSeq[Double](0))
    assert(meta.spans.toSeq == g.getSeq[Double](1))
    meta.centroids.foreach { case (_, v) => assert(v.length == 64) }
  }

  test("q121 returns 10 rows with ADC tracking exact sim; candidates " +
    "are members of the two probed cells only") {
    val got = SimilarityQueries.q121IvfAdcServe(spark, sf).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("adc_sim") - r.getAs[Double]("sim")) < 0.05)
    }
    // every returned vec must live in one of the 2 probed cells
    val cells = SimilarityQueries.QuantIndexStore.table(spark, sf)
      .select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val memberCells = got.map(r => cells(r.getAs[Long]("vec_id"))).toSet
    assert(memberCells.size <= 2, s"results from ${memberCells.size} cells")
  }

  test("frozen-quantizer coding (q126's ingest path): out-of-grid delta " +
    "values saturate to the edge bins instead of shifting stored codes") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val delta = Seq(
      (10L, Array(5.0f, -3.0f)),   // above max / below min
      (11L, Array(0.5f, 1.5f)))    // in-grid
    .toDF("vec_id", "embedding")
    val grid = SimilarityQueries.sqGrid(base)
    val codes = SimilarityQueries.sqCodesAgainst(delta, grid)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](3)).toMap
    assert(codes(10L) == Seq(255, 0), s"clamp failed: ${codes(10L)}")
    assert(codes(11L).forall(c => c >= 0 && c <= 255))
    // in-grid midpoint lands mid-scale, not at an edge
    assert(codes(11L).forall(c => c > 0 && c < 255))
  }
}
