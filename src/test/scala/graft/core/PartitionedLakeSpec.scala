package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The physical claims behind q228 that its hash gate cannot hold:
  * dynamic partition overwrite must leave SIBLING partitions' files
  * byte-untouched (the rewrite never rewrote them — at 100 TB that is
  * the difference between a partition-grain backfill and a full-table
  * rewrite), and a partition-column filter must prune at SCAN level
  * (`PartitionFilters`, with the partition column served from the
  * directory layout rather than read from files).
  */
class PartitionedLakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(tag: String): org.apache.hadoop.fs.Path = {
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"graft_partlake_spec_$tag")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    p
  }

  private def frame = {
    import spark.implicits._
    (1L to 60L).map(i => (i, if (i % 3 == 0) "aa" else if (i % 3 == 1) "bb"
      else "cc", s"text$i")).toDF("doc_id", "lang", "text")
  }

  /** (name, length, mtime) of every data file under one partition. */
  private def files(dir: org.apache.hadoop.fs.Path, part: String)
      : Set[(String, Long, Long)] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir, s"lang=$part"))
      .filter(_.getPath.getName.startsWith("part-"))
      .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
      .toSet
  }

  test("dynamic partition overwrite rewrites ONLY the partitions the " +
    "incoming frame contains: sibling files untouched, static mode " +
    "would have truncated them") {
    val dir = freshDir("dyn")
    frame.write.partitionBy("lang").parquet(dir.toString)
    val bbBefore = files(dir, "bb")
    val ccBefore = files(dir, "cc")
    assert(bbBefore.nonEmpty && ccBefore.nonEmpty)
    frame.filter(col("lang") === "aa")
      .withColumn("text", concat(lit("x"), col("text")))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang").parquet(dir.toString)
    // siblings: identical file sets, byte lengths AND mtimes — never
    // rewritten, not merely rewritten-equal
    assert(files(dir, "bb") == bbBefore)
    assert(files(dir, "cc") == ccBefore)
    val back = spark.read.parquet(dir.toString)
    assert(back.filter(col("lang") === "aa" &&
      col("text").startsWith("x")).count() == 20)
    assert(back.filter(col("lang") =!= "aa" &&
      col("text").startsWith("x")).count() == 0)
    assert(back.count() == 60)
  }

  test("a partition-column filter prunes at scan level: PartitionFilters " +
    "carries the predicate and the partition column never enters " +
    "ReadSchema") {
    val dir = freshDir("prune")
    frame.write.partitionBy("lang").parquet(dir.toString)
    val plan = spark.read.parquet(dir.toString)
      .filter(col("lang") === "bb")
      .select(col("doc_id"))
      .queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size == 1, plan.toString)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"expected a lang partition filter, got: ${scan.partitionFilters}")
    // the partition column is served from the directory layout — the
    // files themselves are read with doc_id only
    assert(scan.requiredSchema.fieldNames.toSeq == Seq("doc_id"),
      scan.requiredSchema.treeString)
    // and the pruning is real: only the bb directory's files are listed
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    val listed = scan.metadata.get("Location").toSeq.mkString
    assert(!listed.contains("lang=aa") || listed.contains("..."),
      s"scan location unexpectedly lists sibling partitions: $listed")
  }
}
