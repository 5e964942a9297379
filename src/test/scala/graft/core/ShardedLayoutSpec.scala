package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.CorpusStatsQueries

/** The sharded-corpus write is the physical form of q74's manifest: a
  * trainer streaming each shard directory in file order must see exactly
  * the manifest's `pos` order — no read-time sort, no reconciliation.
  */
class ShardedLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("writeShardedCorpus: one file per shard; file row order equals " +
    "the q74 manifest's pos order") {
    val out = Files.createTempDirectory("graft_sharded").toString
    CorpusStatsQueries.writeShardedCorpus(spark, sf, out)

    val manifest = CorpusStatsQueries
      .queries("q74_shard_manifest")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getLong(0))) // shard, pos, doc
      .groupBy(_._1)
      .map { case (s, rows) => s -> rows.sortBy(_._2).map(_._3).toSeq }

    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == manifest.size, "every shard materialized")

    shardDirs.foreach { dir =>
      val shard = dir.getName.stripPrefix("shard=").toLong
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"shard $shard: one task owns a shard, so one file; got ${files.length}")
      // a single small parquet file reads back as one split, preserving
      // the writer's row order
      val got = spark.read.parquet(files.head.getPath)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      assert(got == manifest(shard),
        s"shard $shard file order must equal manifest pos order")
    }
  }
}
