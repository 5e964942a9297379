package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.functions.VectorFunctions.l2Distance
import graft.ml.KMeans

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("fit is bit-deterministic across cluster layouts (decimal sums)") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.fit(emb.repartition(3), "embedding", "vec_id", 8, 3)
    val b = KMeans.fit(emb.repartition(13), "embedding", "vec_id", 8, 3)
    assert(a.length === 8)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("DISTRIBUTED fit (forced past the local shortcut) is also " +
    "bit-deterministic across layouts, and within an ulp of local fit") {
    val emb = Tables.embeddings(spark, sf)
    val a = KMeans.fit(emb.repartition(3), "embedding", "vec_id", 8, 3,
      localThreshold = 0)
    val b = KMeans.fit(emb.repartition(13), "embedding", "vec_id", 8, 3,
      localThreshold = 0)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // the local path sums doubles in fixed order vs the distributed
    // path's exact decimals: same algorithm, ulp-level agreement
    val local = KMeans.fit(emb, "embedding", "vec_id", 8, 3)
    a.zip(local).foreach { case (da, dl) =>
      da.zip(dl).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
          s"distributed $x vs local $y")
      }
    }
  }

  test("Lloyd iterations do not increase within-cluster SSE") {
    val emb = Tables.embeddings(spark, sf)
    def sse(cents: Array[Array[Double]]): Double = {
      val scored = cents.zipWithIndex.map { case (c, j) =>
        struct(l2Distance(col("embedding"), typedlit(c.toSeq)).as("d"),
          lit(j).as("j"))
      }
      emb.select(array_min(array(scored.toIndexedSeq: _*)).getField("d").as("d"))
        .agg(sum(col("d") * col("d"))).head.getDouble(0)
    }
    val init = KMeans.initCentroids(emb, "embedding", "vec_id", 8)
    val it1 = KMeans.fit(emb, "embedding", "vec_id", 8, 1)
    val it3 = KMeans.fit(emb, "embedding", "vec_id", 8, 3)
    val (s0, s1, s3) = (sse(init), sse(it1), sse(it3))
    assert(s1 <= s0 * (1 + 1e-12), s"$s1 > $s0")
    assert(s3 <= s1 * (1 + 1e-12), s"$s3 > $s1")
  }

  test("empty cells keep their previous centroid") {
    import spark.implicits._
    // two tight groups, k=3: at least one cell must end up empty
    val pts = (0 until 20).map(i =>
      (i.toLong, Array(if (i % 2 == 0) 0.0 else 100.0, i / 1000.0)))
    val df = pts.toDF("vec_id", "embedding")
    val cents = KMeans.fit(df, "embedding", "vec_id", 3, 2)
    assert(cents.length === 3)
    assert(cents.forall(_.forall(v => !v.isNaN)))
  }
}
