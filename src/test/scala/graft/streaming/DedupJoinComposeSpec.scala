package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q209's composition claim, held from both directions: WITH the dedup
  * stage the duplicated feed joins to exactly the batch answer (the
  * oracle gate holds that); WITHOUT it the at-least-once copies must
  * multiply pairs — proving the dedup stage is load-bearing, not
  * decorative.
  */
class DedupJoinComposeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("the duplicated feed carries real duplicates, and dedup-then-join " +
    "returns strictly fewer pairs than join-without-dedup") {
    val sp = graft.queries.StreamingQueries.dupEventSpool(spark, sf)
    val feed = spark.read.parquet(sp.dir)
      .filter(col("user_id") =!= sp.sentinelUid)
    val copies = feed.count()
    val distinctIds = feed.select("event_id").distinct().count()
    assert(copies > distinctIds,
      s"feed has no duplicates ($copies rows, $distinctIds ids)")

    val deduped = graft.queries.StreamingQueries
      .queries("q209_dedup_join_compose")(spark, sf)
      .agg(sum(col("n_pairs"))).head().getLong(0)
    // the batch join over the RAW duplicated feed — what the stream
    // would emit without the dedup stage (inner joins are
    // delivery-multiplicative: k_v copies x k_p copies per true pair)
    val raw = {
      val v = feed.filter(col("event_type") === "view")
        .select(col("user_id").as("v_uid"), col("ts").as("v_ts"))
      val p = feed.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_uid"), col("ts").as("p_ts"))
      v.join(p, col("v_uid") === col("p_uid") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"))
        .count()
    }
    assert(deduped < raw,
      s"dedup stage had no effect: $deduped pairs with dedup, $raw without")
  }
}
