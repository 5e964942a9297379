package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** The IVF-PQ residual index's quantizer-quality claim, held
  * deterministically: at the SAME 4-bit-per-subspace budget, coding the
  * RESIDUAL (vector − cell centroid) reconstructs the corpus with
  * strictly smaller total squared error than flat PQ over raw vectors —
  * the reason `IndexIVFPQ` quantizes residuals. Measured over the WHOLE
  * corpus (not a recall sample), so candidate-pool coverage cannot
  * confound the comparison the way it does in q143's tier recall.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  /** Σ_d (emb[d] − recon[d])² as a column. */
  private def sqErr(emb: org.apache.spark.sql.Column,
      recon: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(emb, recon, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  test("residual coding reconstructs with smaller total squared error " +
    "than flat PQ at the same 4-bit budget (the IVF-PQ claim, corpus-wide)") {
    val meta = SimilarityQueries.ivfPqMeta(spark, sf)
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

    // IVF-PQ reconstruction: cell anchor + residual codeword, straight
    // from the SHIPPED store + sidecar (the served artifact, not a replay)
    import spark.implicits._
    val centD = meta.anchors.toSeq.map { case (id, v) => (id, v.toSeq) }
      .toDF("cell", "cd")
    val cbIvfL = typedLit(meta.cbFlat.toSeq)
    val ivfErr = SimilarityQueries.IvfPqIndexStore.table(spark, sf)
      .join(broadcast(centD), "cell")
      .join(emb, "vec_id")
      .select(sqErr(col("emb"),
        transform(sequence(lit(0), lit(63)), dd =>
          element_at(col("cd"), dd + 1) +
            element_at(cbIvfL,
              element_at(col("codes"), (dd / 8).cast("int") + 1) * 64 + dd + 1)))
        .as("e"))
      .agg(sum(col("e"))).head().getDouble(0)

    // flat-PQ reconstruction at the same budget: q125's codebook (the
    // 16 centroid samples' raw sub-vectors), map-side assignment
    val flatCb = meta.centroids.sortBy(_._1).flatMap(_._2.map(_.toDouble)).toSeq
    val flatCbL = typedLit(flatCb)
    val subCb: Int => Array[Array[Double]] = s =>
      Array.tabulate(16)(j =>
        flatCb.slice(j * 64 + s * 8, j * 64 + s * 8 + 8).toArray)
    val flatErr = emb
      .select(col("emb"),
        array((0 until 8).map(s =>
          graft.functions.NearestCentroid.nearestCentroidSqrt(
            slice(col("emb"), s * 8 + 1, 8), subCb(s))): _*).as("codes"))
      .select(sqErr(col("emb"),
        transform(sequence(lit(0), lit(63)), dd =>
          element_at(flatCbL,
            element_at(col("codes"), (dd / 8).cast("int") + 1) * 64 + dd + 1)))
        .as("e"))
      .agg(sum(col("e"))).head().getDouble(0)

    assert(ivfErr < flatErr,
      f"ivf-pq err $ivfErr%.3f !< flat-pq err $flatErr%.3f")
  }

  test("the IVF-PQ store REUSES across a fresh memo (regression: " +
    "NearestCentroid's default toString printed the codebook by JVM " +
    "identity, so the canonicalized-plan fingerprint changed on every " +
    "construction and the store re-paid its build in every process)") {
    // two constructions of the same expression must render identically,
    // with no identity hash in the string
    val cb = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val a = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal(1), cb.map(_.clone()))
    val b = graft.functions.NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal(1), cb.map(_.clone()))
    assert(a.toString == b.toString, a.toString)
    assert(!a.toString.contains("@"), a.toString)
    // and the store-level consequence: a fresh memo revalidates instead
    // of rebuilding
    SimilarityQueries.IvfPqIndexStore.ensure(spark, sf)
    SimilarityQueries.IvfPqIndexStore.reset()
    assert(SimilarityQueries.IvfPqIndexStore.ensure(spark, sf) == "reused")
  }
}
