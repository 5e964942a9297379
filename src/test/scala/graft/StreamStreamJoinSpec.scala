package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.StreamingQueries

/** q183/q184 — join-on-ingest ≡ join-at-rest, in-JVM at sf0.001 (the
  * oracle gate replays the same contract against DuckDB at sf0.01; this
  * spec holds it at a second scale factor and adds the anti-join
  * cross-check the grouped report can't express on its own).
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  private def side(t: String, pre: String) =
    graft.core.Tables.events(spark, d)
      .filter(col("event_type") === t)
      .select(col("user_id").as(s"${pre}_uid"), col("ts").as(s"${pre}_ts"),
        col("event_id").as(s"${pre}_eid"))

  private def cond =
    col("v_uid") === col("p_uid") &&
      col("p_ts") >= col("v_ts") &&
      col("p_ts") <= col("v_ts") + expr("INTERVAL 1800 SECONDS")

  test("q183 stream-stream inner join equals the batch interval join") {
    val streamed =
      StreamingQueries.queries("q183_stream_stream_join")(spark, d).collect()
    val batch = side("view", "v").join(side("purchase", "p"), cond)
      .groupBy(col("v_uid").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("v_eid")).as("n_views_matched"),
        sum(unix_millis(col("p_ts")) - unix_millis(col("v_ts")))
          .as("sum_lead_ms"))
      .orderBy("user_id").collect()
    assert(streamed.nonEmpty, "inner join produced no matched pairs")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("q184 stream-stream left join equals the batch left interval " +
    "join, and its unmatched counts equal the anti-join's") {
    val streamed = StreamingQueries
      .queries("q184_stream_stream_left_join")(spark, d).collect()
    val batch = side("view", "v").join(side("purchase", "p"), cond, "left")
      .groupBy(col("v_uid").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("p_eid")).as("n_matched"),
        (count(lit(1)) - count(col("p_eid"))).as("n_unmatched"))
      .orderBy("user_id").collect()
    assert(streamed.toSeq == batch.toSeq)
    // every user with any view emits — the null rows are what the
    // watermark machinery exists to flush
    val viewUsers = side("view", "v").select("v_uid").distinct().count()
    assert(streamed.length == viewUsers)
    // grouped unmatched counts cross-checked against the anti-join
    val anti = side("view", "v")
      .join(side("purchase", "p"), cond, "left_anti")
      .groupBy(col("v_uid").as("user_id"))
      .agg(count(lit(1)).as("n_unmatched"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamed.foreach { r =>
      val expected = anti.getOrElse(r.getLong(0), 0L)
      assert(r.getLong(3) == expected,
        s"user ${r.getLong(0)}: unmatched ${r.getLong(3)} vs anti $expected")
    }
  }
}
