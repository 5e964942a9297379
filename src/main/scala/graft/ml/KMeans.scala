package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic distributed Lloyd's k-means over an embedding column —
  * the coarse-quantizer trainer for IVF similarity search (q45).
  *
  * Deterministic in every respect, independent of partitioning and task
  * order:
  *  - init: the k rows with the smallest `md5(id)` — an unbiased,
  *    order-independent sample (no RNG, no dependence on row order);
  *  - assignment: argmin L2 via `array_min` over (distance, index)
  *    structs — ties resolve to the smaller centroid index;
  *  - update: per-dimension means as DECIMAL(38,18) sums divided by
  *    counts. Decimal addition is exact and associative (double sums
  *    would vary with partial-aggregation order across runs), so the
  *    fitted centroids are bit-identical on every run and cluster layout.
  *
  * Scale shape per iteration: centroids broadcast as literals (k·dim
  * doubles), assignment is a map-side projection (NO shuffle), the update
  * is posexplode → partial-agg → one shuffle on (cell, dim) — k·dim keys
  * — then a k·dim-row collect. Driver state is k·dim doubles; everything
  * else is distributed and linear.
  */
object KMeans {

  /** Deterministic unbiased init: the k vectors with smallest md5(id). */
  def initCentroids(df: DataFrame, vecCol: String, idCol: String,
      k: Int): Array[Array[Double]] =
    df.orderBy(md5(col(idCol).cast("string")))
      .limit(k)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)

  /** Nearest-centroid index for `vec` (squared L2, ties → smaller
    * index) via the native [[graft.functions.NearestCentroid]]
    * expression: the centroid matrix rides along as a codegen reference
    * object, so the plan is ONE node however large k is. (The previous
    * `array_min` over k (dist, idx) literal structs made the plan tree
    * O(k·dim) — re-optimized on every Lloyd iteration and unusable at
    * production cell counts.)
    */
  def assign(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.NearestCentroid.nearestCentroid(vec, centroids)

  /** `iters` Lloyd iterations from the hash-sample init. Cells that lose
    * all members keep their previous centroid.
    */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = initCentroids(df, vecCol, idCol, k)
    for (_ <- 0 until iters) {
      val means = df
        .select(assign(col(vecCol), cents).as("cell"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg((sum(col("v").cast(DecimalType(38, 18))) / count(lit(1)))
          .cast("double").as("m"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }
}
