package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.QuakeQueries.{FixtureJson, FixtureNowMs}
import graft.quakes.QuakeModel.QuakeConfig
import graft.quakes.QuakePipeline

class GeoNetSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def load() = spark.read
    .format("graft.sources.GeoNetTableProvider")
    .option("body", FixtureJson).load()

  test("reads a FeatureCollection body as flat rows") {
    val df = load()
    assert(df.schema == GeoNetSource.FlatSchema)
    assert(df.count() == 6)
    val r = df.filter("publicID = '2026p000001'").head
    assert(r.getDouble(r.fieldIndex("lon")) == 174.27)
    assert(r.getInt(r.fieldIndex("mmi")) == 6)
  }

  test("mmi >= filter is pushed into the scan (F1, task.ts:176)") {
    val df = load().filter(col("mmi") >= 5)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("mmiPushed=5"), scanDesc.take(2000))
    // rows filtered at the source: mmi 6, 5, 10 survive; 3, 4, -1 do not
    assert(df.select("publicID").collect.map(_.getString(0)).sorted.toSeq ==
      Seq("2026p000001", "2026p000003", "2026p000005"))
  }

  test("strict > pushes as >= v+1 on the integral mmi") {
    val df = load().filter(col("mmi") > 5)
    assert(df.queryExecution.executedPlan.toString.contains("mmiPushed=6"))
    assert(df.count() == 2) // mmi 6 and 10
  }

  test("non-mmi predicates stay with Spark, conjunction still correct") {
    val df = load().filter(col("mmi") >= 5 && col("quality") === "best")
    assert(df.queryExecution.executedPlan.toString.contains("mmiPushed=5"))
    assert(df.count() == 3)
  }

  test("column pruning reaches the parser") {
    val df = load().select("publicID", "magnitude")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns=publicID,magnitude"), scanDesc.take(2000))
    assert(df.count() == 6)
  }

  test("end-to-end: geonet source -> nest -> pipeline matches from_json path") {
    val viaSource = QuakePipeline.transform(
      GeoNetSource.nest(load()), QuakeConfig(), FixtureNowMs)
    val viaJson = QuakePipeline.transform(
      QuakePipeline.parseFeatureCollection(spark, FixtureJson),
      QuakeConfig(), FixtureNowMs)
    assert(viaSource.collect().toSet == viaJson.collect().toSet)
  }
}
