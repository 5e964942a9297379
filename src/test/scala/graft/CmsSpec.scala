package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.CorpusStatsQueries

/** The count-min sketch's contract, held where the fixture vocabulary
  * is too small to exercise it: a 5000-key synthetic stream over the
  * 4×512 sketch FORCES bucket collisions, and the estimates must be
  * overestimates-only — never under — with the sketch itself bounded
  * at d·w rows regardless of key cardinality.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("5000 distinct keys through the 4x512 sketch: estimates never " +
    "underestimate, at least one strictly overestimates (collisions " +
    "are real), and the sketch stays within d*w rows") {
    import spark.implicits._
    graft.core.CacheScope.withScope {
      // skewed multiplicities so exact counts differ across keys
      val toks = graft.core.CacheScope.track(
        (0 until 5000).flatMap(k => Seq.fill(k % 7 + 1)(s"key_$k"))
          .toDF("tok").persist())
      val sketch = CorpusStatsQueries.cmsSketch(toks)
      assert(sketch.count() <= 4L * 512L)
      val qset = toks.select("tok").distinct()
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      val joined = CorpusStatsQueries.cmsEstimates(qset, sketch)
        .join(exact, "tok")
        .select(col("tok"), col("exact_n"), col("cms_n"))
        .collect()
      assert(joined.length == 5000)
      assert(joined.forall(r => r.getLong(2) >= r.getLong(1)),
        "an estimate UNDERSHOT the exact count — not a count-min sketch")
      assert(joined.exists(r => r.getLong(2) > r.getLong(1)),
        "no collisions at 5000 keys over 512 buckets — hashing is broken")
    }
  }
}
