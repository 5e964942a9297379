package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.BucketPairs

/** Skew-guard contract of the bucket-local pair enumerator shared by the
  * LSH (q32) and n-gram Jaccard (q34) queries.
  */
class BucketPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("normal buckets: all in-bucket pairs, ordered a < b, once each") {
    val df = Seq(("k1", 3L), ("k1", 1L), ("k1", 2L), ("k2", 9L), ("k2", 7L),
      ("k3", 5L)).toDF("k", "id")
    val pairs = BucketPairs.boundedPairs(df, Seq(col("k")), col("id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (7L, 9L)))
  }

  test("adversarial corpus: a hot bucket (stop-shingle) is dropped, " +
    "normal buckets unaffected") {
    // one shingle shared by 10k docs — uncapped this is ~50M pairs in ONE
    // task; capped it contributes nothing
    val hot = (0 until 10000).map(i => ("the end", i.toLong))
    val good = Seq(("rare phrase one", 1L), ("rare phrase one", 2L))
    val df = (hot ++ good).toDF("k", "id")
    val pairs = BucketPairs.boundedPairs(df, Seq(col("k")), col("id"))
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("duplicate payloads inside a bucket never produce self-pairs") {
    val df = Seq(("k", 5L), ("k", 5L), ("k", 7L)).toDF("k", "id")
    val pairs = BucketPairs.boundedPairs(df, Seq(col("k")), col("id"))
      .as[(Long, Long)].collect().toSeq
    assert(!pairs.contains((5L, 5L)))
    assert(pairs.sorted === Seq((5L, 7L), (5L, 7L))) // cross-pairs remain
  }

  test("cap boundary: bucket of exactly cap enumerates, cap+1 drops") {
    val cap = BucketPairs.DefaultCap
    val atCap = (0 until cap).map(i => ("at", i.toLong))
    val over = (0 until cap + 1).map(i => ("over", i.toLong))
    val df = (atCap ++ over).toDF("k", "id")
    val n = BucketPairs.boundedPairs(df, Seq(col("k")), col("id")).count()
    assert(n === cap.toLong * (cap - 1) / 2)
  }

  test("property: on seeded random corpora, pairs are exactly the " +
    "per-bucket combinations of sub-cap buckets (a < b, once each)") {
    val gen = org.scalacheck.Gen.listOfN(400,
      org.scalacheck.Gen.zip(org.scalacheck.Gen.choose(0, 30),
        org.scalacheck.Gen.choose(0L, 120L)))
    (1 to 5).foreach { i =>
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(1000L + i)).get
        .map { case (k, id) => (s"k$k", id) }.distinct
      val df = rows.toDF("k", "id")
      val cap = 8
      val got = BucketPairs.boundedPairs(df, Seq(col("k")), col("id"), cap)
        .as[(Long, Long)].collect()
      // reference model computed in plain Scala
      val expected = rows.groupBy(_._1).values
        .map(_.map(_._2).sorted)
        .filter(ids => ids.size > 1 && ids.size <= cap)
        .flatMap(ids => ids.combinations(2).map(p => (p(0), p(1))))
        .toSeq
      // multiset compare: the SAME pair may arise from several buckets
      // (that repetition is exactly what q32's n_shared_bands counts)
      assert(got.sorted.toSeq === expected.toSeq.sorted, s"seed ${1000 + i}")
      assert(got.forall { case (a, b) => a < b })
    }
  }

  test("capped result equals uncapped enumeration when no bucket is hot") {
    val df = (0 until 300).map(i => (s"k${i % 50}", i.toLong)).toDF("k", "id")
    val capped = BucketPairs.boundedPairs(df, Seq(col("k")), col("id"))
      .as[(Long, Long)].collect().toSet
    val uncapped = BucketPairs
      .boundedPairs(df, Seq(col("k")), col("id"), cap = Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(capped === uncapped)
    assert(capped.size === 50 * 6 * 5 / 2)
  }
}
