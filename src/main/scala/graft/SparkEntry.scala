package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine surface is organized in packs (one object per SURVEY.md §2
  * area); this object is the flat registry the driver consumes. Every
  * query with SQL-expressible semantics has a DuckDB oracle entry with
  * matching column names/aliases; rows-only queries (the GeoJSON quake
  * pipeline) intentionally omit theirs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema revenue join (broadcast dims + one fact-fact shuffle).
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q02StarRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++
      TpcdsShapeQueries.queries ++
      FaultGateQueries.queries ++
      PlanGateQueries.queries ++
      RelationalQueries.queries ++
      EventQueries.queries ++
      DedupTextQueries.queries ++
      CorpusStatsQueries.queries ++
      IngestQueries.queries ++
      SimilarityQueries.queries ++
      MultimodalQueries.queries ++
      StreamingQueries.queries ++
      GraphQueries.queries ++
      SearchQueries.queries ++
      QuakeQueries.queries

  /** Dev-loop subset filter shared by Bench and Verify: parse
    * SPARK_GRAFT_ONLY, warn about unknown names, and ERROR when
    * nothing matches — a typo'd filter must never read as a clean
    * empty run (the driver never sets the variable).
    */
  private[graft] def parseOnlyFilter(tag: String): Option[Set[String]] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach { o =>
      val unknown = o -- queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[$tag] WARNING: SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
      if (o.intersect(queries.keySet).isEmpty)
        sys.error(s"SPARK_GRAFT_ONLY matched zero registered queries: $o")
    }
    only
  }

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    TpchQueries.oracle ++
      TpcdsShapeQueries.oracle ++
      FaultGateQueries.oracle ++
      PlanGateQueries.oracle ++
      RelationalQueries.oracle ++
      EventQueries.oracle ++
      DedupTextQueries.oracle ++
      CorpusStatsQueries.oracle ++
      IngestQueries.oracle ++
      SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++
      StreamingQueries.oracle ++
      GraphQueries.oracle ++
      SearchQueries.oracle ++
      QuakeQueries.oracle
}
