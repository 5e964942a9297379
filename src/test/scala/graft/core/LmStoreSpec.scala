package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{DedupTextQueries, LmStore}

/** The LM-store contract: the persisted `(head, next, cnt, total)`
  * table equals the inline bigram aggregation exactly (integer counts —
  * no tolerance), so the store-fed q84/q90 keep their recomputing
  * DuckDB oracles.
  */
class LmStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("store-read equals inline bigram aggregation exactly") {
    val fromStore = LmStore.table(spark, sf)
      .orderBy("head", "next").collect()
    val recomputed = DedupTextQueries.bigramRows(spark, sf)
      .groupBy("head", "next").agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy("head")))
      .orderBy("head", "next").collect()
    assert(fromStore.length == recomputed.length && fromStore.nonEmpty)
    fromStore.zip(recomputed).foreach { case (a, b) => assert(a == b) }
  }

  test("the marginal is consistent: total = sum of cnt within each head") {
    val bad = LmStore.table(spark, sf)
      .groupBy("head", "total").agg(sum("cnt").as("s"))
      .filter(col("s") =!= col("total"))
    assert(bad.isEmpty)
  }
}
