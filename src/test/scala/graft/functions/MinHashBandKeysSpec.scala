package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.DedupTextQueries

/** The parity contract behind streaming LSH: the per-row expression must
  * produce EXACTLY the band keys the batch signature pipeline (q31+q32,
  * oracle-locked against DuckDB) produces, or the streaming tier and the
  * batch admission pass disagree about what is a duplicate.
  */
class MinHashBandKeysSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("per-row band keys equal the batch signature pipeline's band " +
    "frame, row for row, over the test corpus") {
    val batch = DedupTextQueries
      .bandFrame(DedupTextQueries.minhashSignature(
        DedupTextQueries.shingleRows(spark, sf)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    val perRow = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        posexplode(MinHashBandKeys.bandKeys(col("text"))).as(Seq("band", "bkey")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(perRow.nonEmpty)
    assert(perRow == batch)
  }

  test("fewer than 3 tokens -> no shingles -> empty key array (batch " +
    "pipeline drops such docs the same way)") {
    import spark.implicits._
    val keys = Seq("one two", "", "   ").toDF("text")
      .select(MinHashBandKeys.bandKeys(col("text")).as("k"))
      .collect().map(_.getSeq[String](0))
    assert(keys.forall(_.isEmpty))
  }

  test("identical texts collide in every band; band count and key shape " +
    "hold") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val ks = Seq(t, t).toDF("text")
      .select(MinHashBandKeys.bandKeys(col("text")).as("k"))
      .collect().map(_.getSeq[String](0))
    assert(ks(0) == ks(1))
    assert(ks(0).length == MinHashBandKeys.Bands)
    assert(ks(0).forall(_.matches("[0-9a-f]{32}")))
  }
}
