package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.MultimodalQueries

/** q141's reason to exist, held as a spec: the perceptual dHash tier
  * pairs re-encoded/rescaled copies of the same picture that the
  * byte-level tier (q89's byte-window MinHash engine) PROVABLY cannot —
  * on the shared fixture the byte tier finds zero of the true pairs
  * while dHash finds all of them at Hamming distance 0.
  */
class DHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("dHash pairs every (2g, 2g+1) same-picture couple at Hamming 0; " +
    "their payloads are byte-disjoint so exact dedup can never pair them") {
    graft.core.CacheScope.withScope {
      val pairs = MultimodalQueries.queries("q141_perceptual_neardup")(
        spark, sf).collect()
      val nDocs = graft.core.Tables.documents(spark, sf).count()
      assert(pairs.nonEmpty)
      // every complete (2g, 2g+1) couple is found, at distance 0
      val truePairs = pairs.filter(r =>
        r.getLong(0) / 2 == r.getLong(1) / 2)
      assert(truePairs.length == (nDocs / 2).toInt, pairs.length.toString)
      assert(truePairs.forall(_.getLong(2) == 0L))
      // and the two payloads of each couple are different bytes — the
      // exact-dedup digest (q86's md5(payload)) separates them
      val fps = MultimodalQueries.dhashFixtureMedia(spark, sf).toDF()
        .select(expr("doc_id div 2").as("g"), md5(col("payload")).as("fp"))
        .groupBy("g").agg(countDistinct(col("fp")).as("n"), count(lit(1)).as("c"))
        .collect()
      assert(fps.forall(r => r.getLong(1) == r.getLong(2)),
        "some couple shares identical payload bytes")
    }
  }

  test("a forced hot bucket — N identical images — stays BOUNDED: over " +
    "the cap the degenerate buckets are dropped (zero pairs, no O(N²) " +
    "enumeration); under the cap all pairs emit") {
    graft.core.CacheScope.withScope {
      import spark.implicits._
      import graft.multimodal.MediaPipeline
      val cap = graft.operators.BucketPairs.DefaultCap
      def identicalImages(n: Int) = spark.range(n).as[Long]
        .mapPartitions(_.map(id => MediaPipeline.MediaRow(id, "image/png",
          // every doc renders the SAME 16x12 picture: all 4 band
          // buckets collapse to one value each — the blank-frame/logo
          // degeneracy q141's cap exists for
          MediaPipeline.encodePngGray(16, 12, (x, y) => (x * 7 + y) % 251))))
      // over the cap: the adversarial corpus yields NO candidate pairs
      val hot = MultimodalQueries
        .perceptualNearDupPairs(identicalImages(cap + 36)).collect()
      assert(hot.isEmpty,
        s"hot bucket enumerated ${hot.length} pairs past the cap")
      // under the cap: every couple of the n identical images pairs up
      val n = 10
      val cool = MultimodalQueries
        .perceptualNearDupPairs(identicalImages(n)).collect()
      assert(cool.length == n * (n - 1) / 2)
      assert(cool.forall(_.getLong(2) == 0L))
    }
  }

  test("the byte-window MinHash tier (q89's engine) finds NONE of the " +
    "same-picture pairs — the class of near-duplicate only the " +
    "perceptual tier can see") {
    graft.core.CacheScope.withScope {
      val media = MultimodalQueries.dhashFixtureMedia(spark, sf).toDF()
      val byteTier = MultimodalQueries.mediaNearDupPairs(media)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a / 2 == b / 2 }
      assert(byteTier.isEmpty,
        s"byte tier unexpectedly paired: ${byteTier.take(5).mkString(",")}")
    }
  }
}
