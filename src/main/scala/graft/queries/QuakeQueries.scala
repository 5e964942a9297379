package graft.queries

import java.time.Instant

import org.apache.spark.sql.functions._

import graft.quakes.QuakeModel.QuakeConfig
import graft.quakes.QuakePipeline

/** The reference pipeline itself (task.ts:160-261) as a registered query,
  * run over the checked-in fixture FeatureCollection (FIXTURES.md §2) with
  * a pinned `now`. No DuckDB oracle — the input is GeoJSON, not a parquet
  * table — so the driver records a rows-only check; byte-level golden
  * verification lives in the scalatest suite (QuakePipelineSpec).
  */
object QuakeQueries {

  /** FIXTURES.md §2.1 — covers every filter/lookup branch. */
  val FixtureJson: String =
    """{"type":"FeatureCollection","features":[
      | {"type":"Feature","properties":{"publicID":"2026p000001","time":"2026-08-06T23:30:00.000Z","depth":12.3,"magnitude":5.17,"mmi":6,"locality":"15 km east of Seddon","quality":"best"},"geometry":{"type":"Point","coordinates":[174.27,-41.67]}},
      | {"type":"Feature","properties":{"publicID":"2026p000002","time":"2026-08-06T23:59:00.000Z","depth":5.0,"magnitude":3.95,"mmi":3,"locality":"10 km south of Taupo","quality":"preliminary"},"geometry":{"type":"Point","coordinates":[176.08,-38.80]}},
      | {"type":"Feature","properties":{"publicID":"2026p000003","time":"2026-07-01T00:00:00.000Z","depth":33.0,"magnitude":4.50,"mmi":5,"locality":"old event beyond max age","quality":"best"},"geometry":{"type":"Point","coordinates":[173.00,-42.00]}},
      | {"type":"Feature","properties":{"publicID":"2026p000004","time":"2026-08-06T22:00:00.000Z","depth":8.0,"magnitude":4.10,"mmi":4,"locality":"reclassified quarry blast","quality":"deleted"},"geometry":{"type":"Point","coordinates":[175.50,-40.50]}},
      | {"type":"Feature","properties":{"publicID":"2026p000005","time":"2026-08-06T12:00:00.000Z","depth":120.5,"magnitude":6.82,"mmi":10,"locality":"deep, off-dictionary mmi","quality":"best"},"geometry":{"type":"Point","coordinates":[178.10,-37.90]}},
      | {"type":"Feature","properties":{"publicID":"2026p000006","time":"2026-01-15T03:00:00.000Z","depth":7.0,"magnitude":5.05,"mmi":-1,"locality":"NZDT-era event, dict key -1","quality":"best"},"geometry":{"type":"Point","coordinates":[172.60,-43.50]}}
      |]}""".stripMargin

  /** Pinned run clock (FIXTURES.md §2.1). */
  val FixtureNowMs: Long = Instant.parse("2026-08-07T00:00:00Z").toEpochMilli

  /** q50 — full pipeline on the fixture, output flattened for the dump.
    * Expected kept set with defaults: publicIDs 1, 2, 5 (3 is over max
    * age, 4 is quality='deleted', 6 is over max age).
    */
  val q50QuakePipeline: Q = (s, _) => {
    val features = QuakePipeline.parseFeatureCollection(s, FixtureJson)
    QuakePipeline.transform(features, QuakeConfig(), FixtureNowMs)
      .select(col("id"),
        col("properties.callsign").as("callsign"),
        col("properties.icon").as("icon"),
        col("properties.stale").as("stale"),
        col("properties.metadata.intensity").as("intensity"),
        col("properties.metadata.timeLocal").as("time_local"),
        col("properties.remarks").as("remarks"),
        col("geometry.coordinates").getItem(0).as("lon"),
        col("geometry.coordinates").getItem(1).as("lat"),
        col("geometry.coordinates").getItem(2).as("alt"))
      .orderBy("id")
  }

  /** q51 — the same pipeline fed by the `geonet` DataSource V2 connector
    * with the MMI≥5 predicate pushed into the source scan (F1 semantics,
    * task.ts:176). Rows-only check; the source itself is covered by
    * GeoNetSourceSpec.
    */
  val q51GeonetSource: Q = (s, _) => {
    val flat = s.read.format("geonet").option("body", FixtureJson).load()
      .filter(col("mmi") >= 5)
    QuakePipeline.transform(graft.sources.GeoNetSource.nest(flat),
        QuakeConfig(), FixtureNowMs)
      .select(col("id"), col("properties.callsign").as("callsign"),
        col("properties.metadata.intensity").as("intensity"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q50_quake_pipeline" -> q50QuakePipeline,
    "q51_geonet_source" -> q51GeonetSource)
  val oracle: Map[String, String] = Map.empty
}
