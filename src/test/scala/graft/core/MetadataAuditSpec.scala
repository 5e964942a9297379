package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** q234's negative path — the claim a hash gate over a healthy lake
  * cannot hold: when the filesystem DOES drift from the write contract
  * (here: an orphan data file appearing inside a shard directory), the
  * audit's physical columns must flip. A reconciliation that stays
  * green under tampering is a dashboard, not an audit.
  */
class MetadataAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  test("healthy lake: every shard audits 1 file / 1 listed, paths and " +
    "sizes reconcile, and content counts cover the corpus") {
    val out = Files.createTempDirectory("graft_audit_ok").toString
    CorpusStatsQueries.writeShardedCorpus(spark, sf, out)
    val rows = CorpusStatsQueries.auditShardedLake(spark, out).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 1L)
      assert(r.getAs[Long]("n_listed") == 1L)
      assert(r.getAs[Boolean]("path_ok"))
      assert(r.getAs[Boolean]("size_ok"))
    }
    val corpus = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
  }

  test("an orphan file inside a shard directory flips that shard's " +
    "one-file contract; untampered shards stay green") {
    val out = Files.createTempDirectory("graft_audit_bad").toString
    CorpusStatsQueries.writeShardedCorpus(spark, sf, out)
    // tamper: duplicate shard 0's data file under a new name — the
    // classic half-cleaned-retry orphan; both the scan and the listing
    // now see two files where the write contract says one
    val shard0 = Paths.get(out).resolve("shard=0")
    val dataFile = Files.list(shard0).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(dataFile, shard0.resolve("part-orphan.parquet"),
      StandardCopyOption.COPY_ATTRIBUTES)

    val rows = CorpusStatsQueries.auditShardedLake(spark, out).collect()
      .map(r => r.getAs[Long]("shard") -> r).toMap
    assert(rows(0L).getAs[Long]("n_files") == 2L,
      "the scan must see the orphan")
    assert(rows(0L).getAs[Long]("n_listed") == 2L,
      "the listing must see the orphan")
    rows.filterKeys(_ != 0L).values.foreach { r =>
      assert(r.getAs[Long]("n_files") == 1L)
      assert(r.getAs[Long]("n_listed") == 1L)
      assert(r.getAs[Boolean]("path_ok") && r.getAs[Boolean]("size_ok"))
    }
  }
}
