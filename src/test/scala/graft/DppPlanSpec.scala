package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The physical claims behind q230 that its hash gate cannot hold:
  * with a selective predicate on a dimension NON-key column, the
  * optimizer must inject a `dynamicpruning#` subquery into the
  * partitioned fact scan's `PartitionFilters` (static pruning cannot
  * know which partitions the filtered dim names), and the scan must
  * then READ only the pruned partition count — asserted from the
  * scan's own `number of partitions read` metric after execution, not
  * from the plan string. At 100 TB this is the difference between
  * listing 2 partitions into tasks and scanning the whole lake.
  */
class DppPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"graft_dpp_spec_$tag")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    p
  }

  // 4 langs with distinct frequencies so lang_rank is deterministic:
  // dd(6) < cc(12) < bb(18) < aa(24) → rank<=2 selects {dd, cc}
  private def fixture = {
    import spark.implicits._
    (1L to 60L).map { i =>
      val lang = (i % 10) match {
        case 0 => "dd"
        case 1 | 2 => "cc"
        case 3 | 4 | 5 => "bb"
        case _ => "aa"
      }
      (i, lang, s"text$i")
    }.toDF("doc_id", "lang", "text")
  }

  /** Collect every file scan, recursing through the AQE leaf wrappers
    * (query stages, nested adaptive plans, reused exchanges) that a
    * plain `collect` treats as leaves.
    */
  private def allScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        allScans(r.child)
    }.flatten.distinct

  private def factScans(plan: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    allScans(plan).filter(
      _.relation.partitionSchema.fieldNames.contains("lang"))

  /** Unwrap AQE so the walk sees the FINAL physical plan. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("a selective dim predicate injects a dynamicpruning subquery into " +
    "the fact scan's PartitionFilters, and the scan reads only the " +
    "pruned partitions (its own metric, after execution)") {
    val dir = freshDir("gate")
    fixture.write.partitionBy("lang").parquet(s"$dir/fact")
    fixture.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("lang_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_docs"), col("lang"))))
      .write.parquet(s"$dir/dim")
    val df = spark.read.parquet(s"$dir/fact")
      .join(
        broadcast(spark.read.parquet(s"$dir/dim")
          .filter(col("lang_rank") <= 2)),
        Seq("lang"))
      .groupBy("lang").agg(count(lit(1)).as("n"))
    // execute FIRST: DPP filters resolve at runtime and the partition
    // metric only exists after the scan actually listed its input
    val rows = df.collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("dd" -> 6L, "cc" -> 12L))
    val scans = factScans(finalPlan(df))
    assert(scans.size == 1, s"expected one fact scan:\n${finalPlan(df)}")
    val scan = scans.head
    assert(scan.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      s"fact scan carries no dynamicpruning PartitionFilter: " +
        s"${scan.partitionFilters}")
    // the metric is the engine's own count of partitions READ — the
    // pruned 2, not the lake's 4
    val partsRead = scan.metrics.get("numPartitions")
      .orElse(scan.metrics.get("partitionsRead"))
    assert(partsRead.isDefined,
      s"no partition-count metric on the scan: ${scan.metrics.keys}")
    assert(partsRead.get.value == 2,
      s"expected 2 partitions read (of 4), got ${partsRead.get.value}")
  }

  test("q230's registered query itself carries the dynamicpruning " +
    "PartitionFilter (the gate shape, not a lookalike)") {
    val df = IngestQueries.queries("q230_dynamic_partition_pruning")(
      spark, graft.TestSpark.Sf0001)
    df.collect()
    val scans = factScans(finalPlan(df))
    assert(scans.nonEmpty, s"no partitioned fact scan:\n${finalPlan(df)}")
    assert(scans.exists(_.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning"))),
      s"q230's fact scan carries no dynamicpruning PartitionFilter:\n" +
        scans.map(_.partitionFilters).mkString("\n"))
  }
}
