package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.functions.VectorFunctions.cosineSimilarity

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-group top-k matches the window-rank formulation") {
    import spark.implicits._
    val data = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.7), ("a", 3L, 0.95), ("a", 4L, 0.1),
      ("b", 5L, 0.5), ("b", 6L, 0.6)).toDF("g", "id", "score")
    val topk = udaf(new TopKAggregator(2))
    val got = data
      .groupBy("g")
      .agg(topk(col("id"), col("score")).as("top"))
      .orderBy("g")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(t => (t.getLong(0), t.getDouble(1))))
      .toMap
    assert(got("a") == Seq((3L, 0.95), (1L, 0.9)))
    assert(got("b") == Seq((6L, 0.6), (5L, 0.5)))
  }

  test("global top-10 similarity equals the orderBy/limit plan (q40)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val scored = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        cosineSimilarity(col("embedding"), col("q_emb")).as("sim"))
    val viaSort = scored.orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val topk = udaf(new TopKAggregator(10))
    val viaAgg = scored.agg(topk(col("vec_id"), col("sim")).as("top"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(t => (t.getLong(0), t.getDouble(1)))
    assert(viaAgg == viaSort)
  }

  test("q44 registered per-label top-3 equals the row_number window form") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val w = Window.partitionBy("label").orderBy(col("sim").desc, col("vec_id").asc)
    val viaWindow = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("label"), col("vec_id"),
        cosineSimilarity(col("embedding"), col("q_emb")).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("label", "rank", "vec_id", "sim")
      .orderBy("label", "rank")
      .collect().toSeq
    val viaAgg = graft.queries.SimilarityQueries
      .q44TopkPerLabel(spark, TestSpark.Sf0001).collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("ties break toward the smaller id deterministically") {
    import spark.implicits._
    val data = Seq((9L, 1.0), (3L, 1.0), (5L, 1.0)).toDF("id", "score")
    val topk = udaf(new TopKAggregator(2))
    val got = data.agg(topk(col("id"), col("score")))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(t => t.getLong(0))
    assert(got == Seq(3L, 5L))
  }

  test("NaN and -0.0 scores rank exactly like the row_number window " +
    "(Spark total order: NaN greatest, -0.0 == 0.0)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val data = Seq(
      ("g", 1L, 0.9), ("g", 2L, Double.NaN), ("g", 3L, 1.5),
      ("g", 4L, Double.NaN), ("g", 5L, -0.0), ("g", 6L, 0.0),
      ("g", 7L, 0.2)).toDF("g", "id", "score").repartition(5)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = data.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4).orderBy("rank")
      .select("id").collect().map(_.getLong(0)).toSeq
    val viaNative = data.groupBy("g")
      .agg(TopKAggregate.topK(col("id"), col("score"), 4).as("top"))
      .head.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
    val viaTyped = {
      val topk = udaf(new TopKAggregator(4))
      data.groupBy("g").agg(topk(col("id"), col("score")).as("top"))
        .head.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
    }
    assert(viaNative == viaWindow)
    assert(viaTyped == viaWindow)
  }

  test("native TopKAggregate matches the typed Aggregator on every group " +
    "(ties, nulls, sub-k groups, many partitions exercising merge)") {
    import spark.implicits._
    // deterministic synthetic corpus: heavy tie mass, some null scores,
    // one group smaller than k
    val rows = (0 until 4000).map { i =>
      val g = s"g${i % 7}"
      val score: java.lang.Double =
        if (i % 29 == 0) null else (i % 13) / 10.0
      (g, i.toLong, score)
    } :+ (("tiny", 999999L, java.lang.Double.valueOf(0.5)))
    val df = rows.toDF("g", "id", "score").repartition(16)
    val typed = udaf(new TopKAggregator(5))
    val viaTyped = df.filter(col("score").isNotNull)
      .groupBy("g").agg(typed(col("id"), col("score")).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(t => (t.getLong(0), t.getDouble(1)))).toMap
    val viaNative = df
      .groupBy("g").agg(TopKAggregate.topK(col("id"), col("score"), 5).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(t => (t.getLong(0), t.getDouble(1)))).toMap
    assert(viaNative == viaTyped)
    assert(viaNative("tiny") == Seq((999999L, 0.5)))
  }
}
