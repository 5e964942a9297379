package graft.ml

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

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
  *  - assignment: argmin L2 — ties resolve to the smaller centroid index;
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
  *
  * Small inputs short-circuit to a DRIVER-LOCAL Lloyd's ([[fitLocal]]):
  * a coarse quantizer normally trains on a bounded hash-sample
  * (~sampleFactor·k rows — see `ivfSearch`), and running `iters`
  * distributed jobs over a few thousand cached rows is pure scheduler
  * overhead (measured: ~1.6 s of jobs for ~20 ms of arithmetic at q45's
  * 4k-row sample). The local path collects once, sorts by the same
  * md5(id) order, and iterates in memory — deterministic by fixed
  * iteration order. At production cell counts (thousands of cells →
  * sample in the millions) the distributed path engages automatically.
  */
object KMeans {

  /** Inputs at or below this row count train driver-locally: the collect
    * is ≤ `65536·dim` doubles (~34 MB at dim 64) — bounded, and far
    * cheaper than per-iteration job scheduling.
    */
  val LocalFitThreshold = 65536L

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
    * all members keep their previous centroid. Inputs of at most
    * `localThreshold` rows run [[fitLocal]] (one collect, no
    * per-iteration jobs); larger inputs run the distributed loop. The
    * threshold is a parameter so the distributed path stays directly
    * testable (KMeansSpec pins its layout-independence with
    * `localThreshold = 0`) — it is the production path at real cell
    * counts, not dead code behind the small-input shortcut.
    */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int, localThreshold: Long = LocalFitThreshold)
      : Array[Array[Double]] = {
    val counted = df.select(col(idCol).cast("string").as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    // one cheap job either way: the caller persists training frames
    val n = counted.count()
    if (n <= localThreshold) {
      val rows = counted.collect()
        .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
      fitLocal(rows, k, iters)
    } else fitDistributed(df, vecCol, idCol, k, iters)
  }

  private def fitDistributed(df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
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

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Driver-local Lloyd's over (id, vector) rows — the same algorithm as
    * the distributed loop: init by smallest md5(id), argmin-L2 assignment
    * with ties to the smaller index, per-dimension means, empty cells
    * keep their centroid. Rows are sorted into md5(id) order first, so
    * the result is independent of input order (double summation in a
    * FIXED order is deterministic; it may differ from the distributed
    * path's exact decimal means in the last ulp, which no consumer
    * observes — q45 is tolerance-bounded, not oracle-hashed).
    */
  def fitLocal(rows: Array[(String, Array[Double])], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(rows.nonEmpty, "k-means needs at least one row")
    val sorted = rows.map { case (id, v) => (md5Hex(id), v) }.sortBy(_._1)
    val dim = sorted.head._2.length
    var cents = sorted.take(k).map(_._2.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sorted.foreach { case (_, v) =>
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cents.length) {
          val c = cents(j)
          var dist = 0.0
          var i = 0
          val n = math.min(v.length, c.length)
          while (i < n) { val diff = v(i) - c(i); dist += diff * diff; i += 1 }
          if (dist < bestD) { bestD = dist; best = j }
          j += 1
        }
        val sRow = sums(best)
        var i = 0
        while (i < math.min(v.length, dim)) { sRow(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (c, j) =>
        if (counts(j) == 0) c.clone()
        else sums(j).map(_ / counts(j))
      }
    }
    cents
  }
}
