package graft.quakes

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quakes.QuakeModel._
import graft.quakes.QuakeFunctions._

/** The GeoNet → CoT pipeline (reference task.ts:160-261), Spark-first.
  *
  * Logical plan: Filter(age) ∘ Filter(quality) ∘ BroadcastJoin(icon dim) ∘
  * Project(P1-P11). Catalyst reorders filters below the join/projection
  * (PushDownPredicates) and folds every constant subexpression — the three
  * manual optimizations the reference hand-codes (SURVEY.md §4) fall out
  * automatically.
  *
  * `now` is captured ONCE per run and injected as a literal — matching the
  * reference's single `Date.now()` at task.ts:184 (we deliberately collapse
  * its second clock read at task.ts:221 into the same instant for
  * determinism; divergence is timing-only).
  *
  * At scale: the input is one API snapshot today, but the plan is scale-free
  * — the icon/intensity dictionaries are broadcast (11 rows), there is no
  * shuffle anywhere (filter+project+broadcast-join only), so the same code
  * runs unchanged over a 100 TB backfill of historical feature archives
  * partitioned by event date.
  */
object QuakePipeline {

  /** Parse a GeoNet API response body (a FeatureCollection JSON string)
    * into one row per feature (reference task.ts:183 + loop at 187).
    */
  def parseFeatureCollection(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(json)).toDF("body")
      .select(from_json(col("body"), FeatureCollectionSchema).as("fc"))
      .select(explode(col("fc.features")).as("feature"))
      .select(col("feature.*"))
  }

  /** The MMI→icon dictionary as an 11-row broadcastable dimension — the
    * idiomatic, SQL-expressible form of the reference's `Record<number,
    * string>` lookup (task.ts:6-18; J1 in SURVEY.md §2.6).
    */
  def iconDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    MmiIcons.toSeq.toDF("mmi_key", "icon_value")
  }

  /** Intensity dictionary as a 10-row dimension (task.ts:21-32). */
  def intensityDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    MmiIntensity.toSeq.toDF("mmi_key", "intensity_value")
  }

  /** F1 — the reference pushes `MMI >= mmi` into the source URL
    * (task.ts:176). Against a materialized table the same predicate is a
    * plain filter that Catalyst pushes into the parquet scan.
    */
  def mmiFilter(cfg: QuakeConfig): Column = col("properties.mmi") >= cfg.mmi

  /** Full transform: GeoNet feature rows → CoT feature rows.
    *
    * @param features one row per GeoNet feature, schema [[GeoNetFeatureSchema]]
    * @param cfg      validated env config (task.ts:162-172)
    * @param nowMs    run timestamp, epoch millis (task.ts:184)
    */
  def transform(features: DataFrame, cfg: QuakeConfig, nowMs: Long): DataFrame = {
    val now = lit(nowMs)
    val p = col("properties")
    val eventTs = to_timestamp(p("time"))

    val filtered = features
      // F2 (task.ts:190-193): keep iff ageMinutes <= maxAge (strict `>` drops)
      .filter(ageMinutes(eventTs, now) <= cfg.maxAgeMinutes)
      // F3 (task.ts:195-204): GeoNet reclassified events are excluded
      .filter(p("quality") =!= "deleted")

    // J1/P4: icon lookup as a broadcast left join + default on miss
    val spark = features.sparkSession
    val withIcon = filtered
      .join(broadcast(iconDim(spark)), p("mmi") === col("mmi_key"), "left")
      .withColumn("icon", coalesce(col("icon_value"), lit(DefaultIcon)))

    // P5: intensity lookup via the constant-folded map-literal form
    val intensity =
      lookupWithDefault(p("mmi"), MmiIntensity, DefaultIntensity)

    val timeLocal = nzLocal(eventTs, now)
    val staleIso = toIso(timestamp_millis(now + lit(5L * 60 * 1000)))

    // P9 (task.ts:233-242): 8 formatted lines joined with '\n'
    val remarks = concat_ws("\n",
      format_string("Magnitude: %.2f", p("magnitude")),
      concat(lit("MMI: "), p("mmi").cast("string")),
      concat(lit("Intensity: "), intensity),
      concat(lit("Location: "), p("locality")),
      concat(lit("Time (UTC): "), p("time")),
      concat(lit("Time (NZ): "), timeLocal),
      format_string("Depth: %.1f km", p("depth")),
      concat(lit("Information Quality: "), p("quality")))

    withIcon.select(
      // P1 (task.ts:213)
      concat(lit("earthquake-"), p("publicID")).as("id"),
      lit("Feature").as("type"),
      struct(
        // P2 (task.ts:216) — JS toFixed(1) ≈ JVM %.1f; divergence only at
        // shortest-decimal half-boundaries (SURVEY.md §7.4 risk 1)
        format_string("M%.1f %s", p("magnitude"), p("locality")).as("callsign"),
        lit(CotType).as("type"),
        col("icon"),
        p("time").as("time"),
        p("time").as("start"),
        staleIso.as("stale"),
        // P8 (task.ts:222-232) — field order is the published contract
        struct(
          p("magnitude").as("magnitude"),
          p("mmi").as("mmi"),
          intensity.as("intensity"),
          p("locality").as("locality"),
          p("depth").as("depth"),
          p("quality").as("quality"),
          p("publicID").as("publicID"),
          p("time").as("timeUTC"),
          timeLocal.as("timeLocal")
        ).as("metadata"),
        remarks.as("remarks")
      ).as("properties"),
      // P10/P11 (task.ts:206-208,244-247): [lon, lat, -depth] — CoT altitude
      // is up-positive HAE, quake depth is km down, hence the negation
      struct(
        lit("Point").as("type"),
        array(
          col("geometry.coordinates").getItem(0),
          col("geometry.coordinates").getItem(1),
          -p("depth")
        ).as("coordinates")
      ).as("geometry")
    )
  }

  /** K1 (task.ts:251-256): assemble the run's snapshot FeatureCollection as
    * a single JSON payload. Driver-side single row — the POST itself is an
    * external side effect outside the engine.
    */
  def toFeatureCollectionJson(cot: DataFrame): String = snapshot(cot)._1

  /** K1 payload + feature count in one action (the count feeds the
    * reference's `ok - fetched N earthquakes` log line, task.ts:255).
    */
  def snapshot(cot: DataFrame): (String, Long) = {
    val (json, n, _) = snapshotWithIds(cot)
    (json, n)
  }

  /** [[snapshot]] plus the snapshot's feature ids, still ONE action: the
    * streaming expiry sink needs the id set, and a `foreachBatch` frame
    * is recomputed per action — a separate ids collect would run the
    * whole micro-batch twice.
    */
  def snapshotWithIds(cot: DataFrame): (String, Long, Seq[String]) = {
    val row = cot.agg(collect_list(struct(col("id"), col("type"),
      col("properties"), col("geometry"))).as("features"))
      .select(
        to_json(struct(lit("FeatureCollection").as("type"), col("features"))),
        size(col("features")).cast("long"),
        expr("transform(features, f -> f.id)"))
      .head()
    (row.getString(0), row.getLong(1), row.getSeq[String](2))
  }

  /** J2 (task.ts:195-203 comment): the snapshot sink's expiry semantics —
    * ids present in the previous snapshot but absent from the current one
    * are expired. A left-anti join computes the expired set.
    */
  def expiredIds(previous: DataFrame, current: DataFrame): DataFrame =
    previous.select("id").join(current.select("id"), Seq("id"), "left_anti")
}
