package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Tables.events]] must read BOTH physical layouts the driver has
  * shipped for `events.parquet`: TIMESTAMP(NANOS) (rounds 1-10 — Spark
  * reads it only as a raw long under `nanosAsLong`) and plain
  * TIMESTAMP(MICROS) (the round-11 regeneration). The round-11 lesson:
  * a testdata regeneration flipped the type and silently broke 16
  * queries — this spec keeps both branches executable whatever the
  * current testdata carries.
  */
class EventsSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the current driver testdata reads with a timestamp ts column " +
    "and non-zero rows") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }

  test("the NANOS-era layout (ts arrives as a raw long of epoch " +
    "nanoseconds) still converts: floor-divided to exact microseconds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev_nanos")
    // 2024-01-02T03:04:05.123456 UTC, as epoch NANOS in a long column —
    // exactly what the nanosAsLong read of the old files produced
    val micros = 1704164645123456L
    Seq((1L, micros * 1000L, 7L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir.toString)
    assert(ev.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = ev.select(org.apache.spark.sql.functions
      .unix_micros(org.apache.spark.sql.functions.col("ts")))
      .head().getLong(0)
    assert(got == micros, s"expected $micros got $got")
  }

  test("the MICROS-era layout passes through bit-exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ev_micros")
    val micros = 1704164645123456L
    Seq((1L, new java.sql.Timestamp(0), 7L, "click", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.lit(micros)))
      .write.parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir.toString)
      .select(org.apache.spark.sql.functions
        .unix_micros(org.apache.spark.sql.functions.col("ts")))
      .head().getLong(0)
    assert(got == micros, s"expected $micros got $got")
  }
}
