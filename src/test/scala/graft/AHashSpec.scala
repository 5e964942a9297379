package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.MultimodalQueries

/** q195's reason to exist, held as a spec: the perceptual audio tier
  * pairs re-mastered (gain-scaled) copies of the same sound that the
  * byte-level tier provably cannot — on the shared fixture the ×2-gain
  * couples share not a single PCM byte pattern, yet their energy-delta
  * hashes are identical.
  */
class AHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("ahash pairs every (2g, 2g+1) same-sound couple at Hamming 0; " +
    "their payloads are byte-disjoint so exact dedup can never pair " +
    "them") {
    graft.core.CacheScope.withScope {
      val pairs = MultimodalQueries.queries("q195_audio_neardup")(
        spark, sf).collect()
      val nDocs = graft.core.Tables.documents(spark, sf).count()
      assert(pairs.nonEmpty)
      val truePairs = pairs.filter(r => r.getLong(0) / 2 == r.getLong(1) / 2)
      assert(truePairs.length == (nDocs / 2).toInt,
        s"found ${truePairs.length} of ${nDocs / 2} couples")
      assert(truePairs.forall(_.getLong(2) == 0L))
      val fps = MultimodalQueries.ahashFixtureMedia(spark, sf).toDF()
        .select(expr("doc_id div 2").as("g"), md5(col("payload")).as("fp"))
        .groupBy("g")
        .agg(countDistinct(col("fp")).as("n"), count(lit(1)).as("c"))
        .collect()
      assert(fps.forall(r => r.getLong(1) == r.getLong(2)),
        "some couple shares identical payload bytes")
    }
  }

  test("the byte-window MinHash tier (q89's engine) finds NONE of the " +
    "same-sound pairs — the class of near-duplicate only the " +
    "perceptual audio tier can see") {
    graft.core.CacheScope.withScope {
      val media = MultimodalQueries.ahashFixtureMedia(spark, sf).toDF()
      val byteTier = MultimodalQueries.mediaNearDupPairs(media)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter { case (a, b) => a / 2 == b / 2 }
      assert(byteTier.isEmpty,
        s"byte tier unexpectedly paired: ${byteTier.take(5).mkString(",")}")
    }
  }

  test("amplitude-scale invariance is exact: the x2-gain member decodes " +
    "to double the energy in every frame yet the same 64-bit hash") {
    graft.core.CacheScope.withScope {
      import graft.multimodal.MediaPipeline
      val hashes = MediaPipeline
        .ahash64(MultimodalQueries.ahashFixtureMedia(spark, sf))
        .select(expr("doc_id div 2").as("g"), col("ah"))
        .groupBy("g")
        .agg(countDistinct(col("ah")).as("n_hashes"))
        .collect()
      assert(hashes.forall(_.getLong(1) == 1L),
        "a gain-scaled couple hashed differently")
    }
  }
}
