package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of-generation reads ([[RunStore.asOfGeneration]]): the demoted
  * generation a compaction retains under [[RunStore.sweepGraceMs]] is a
  * readable snapshot; indexing is backward from the COMMITTED current
  * location, so a crashed compaction's uncommitted write-aside never
  * resolves; asking past retained history refuses loudly.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(tag: String): String = {
    val t = s"graft_tt_spec_$tag"
    RunStore.dropWithLocation(spark, t)
    t
  }

  private def frame(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("build -> compact -> fold: back=1 reads the pre-fold snapshot, " +
    "back=0 the folded store, back=2 refuses (history exhausted)") {
    val t = freshTable("happy")
    graft.core.Tables.writeBucketed(frame(1L -> 10L, 2L -> 20L), t, 2, "k")
    DedupTextQueries.compactStore(spark, t)
    DedupTextQueries.foldAdmittedVia(identity)(spark, t, frame(3L -> 30L))
    val prev = RunStore.asOfGeneration(spark, t, back = 1)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(prev.toSeq == Seq(1L -> 10L, 2L -> 20L)) // no fold leak-back
    val cur = RunStore.asOfGeneration(spark, t, back = 0)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cur.toSeq == Seq(1L -> 10L, 2L -> 20L, 3L -> 30L))
    intercept[IllegalArgumentException] {
      RunStore.asOfGeneration(spark, t, back = 2)
    }
    RunStore.dropWithLocation(spark, t)
  }

  test("crash BEFORE the commit: the written-but-uncommitted generation " +
    "is invisible — back=0 serves the old location, back=1 refuses") {
    val t = freshTable("precommit")
    graft.core.Tables.writeBucketed(frame(1L -> 10L), t, 2, "k")
    val boom = intercept[RuntimeException] {
      DedupTextQueries.compactStoreSeams(spark, t) {
        case "written" => throw new RuntimeException("crash at written")
        case _ => ()
      }
    }
    assert(boom.getMessage.contains("crash at written"))
    // the write-aside dir exists on disk but was never committed: it
    // must not count as history in either direction
    assert(RunStore.asOfGeneration(spark, t, back = 0).count() == 1)
    intercept[IllegalArgumentException] {
      RunStore.asOfGeneration(spark, t, back = 1)
    }
    RunStore.dropWithLocation(spark, t)
  }

  test("crash right AFTER the commit: the swap already happened — " +
    "back=0 serves the new generation, back=1 the demoted one, " +
    "contents identical (compaction changes layout, not data)") {
    val t = freshTable("postcommit")
    graft.core.Tables.writeBucketed(frame(1L -> 10L, 2L -> 20L), t, 2, "k")
    intercept[RuntimeException] {
      DedupTextQueries.compactStoreSeams(spark, t) {
        case "committed" => throw new RuntimeException("crash at committed")
        case _ => ()
      }
    }
    val cur = RunStore.asOfGeneration(spark, t, back = 0)
      .orderBy("k").collect().toSeq
    val prev = RunStore.asOfGeneration(spark, t, back = 1)
      .orderBy("k").collect().toSeq
    assert(cur == prev, s"cur=$cur prev=$prev")
    assert(cur.size == 2)
    RunStore.dropWithLocation(spark, t)
  }

  test("crashed compaction then successful RETRY: the unmarked debris " +
    "older than the current generation never serves as history — " +
    "asOf(1) reads the committed demotion, not the half-written dir") {
    val t = freshTable("retry")
    graft.core.Tables.writeBucketed(frame(1L -> 10L, 2L -> 20L), t, 2, "k")
    intercept[RuntimeException] {
      DedupTextQueries.compactStoreSeams(spark, t) {
        case "written" => throw new RuntimeException("crash at written")
        case _ => ()
      }
    }
    // grow the live store so debris and truth are distinguishable
    DedupTextQueries.foldAdmittedVia(identity)(spark, t, frame(3L -> 30L))
    DedupTextQueries.compactStore(spark, t) // retry succeeds
    // the debris write-aside (2 rows, no demotion marker) sits between
    // the demoted default dir and the current generation by ordinal;
    // history must skip it: asOf(1) = the 3-row snapshot the retry
    // demoted, and nothing deeper is retained
    val prev = RunStore.asOfGeneration(spark, t, back = 1)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(prev == Seq(1L, 2L, 3L), prev.toString)
    intercept[IllegalArgumentException] {
      RunStore.asOfGeneration(spark, t, back = 2)
    }
    RunStore.dropWithLocation(spark, t)
  }

  test("two compactions retain two demoted generations: back indexes " +
    "through the full retained history in order") {
    val t = freshTable("deep")
    graft.core.Tables.writeBucketed(frame(1L -> 10L), t, 2, "k")
    DedupTextQueries.compactStore(spark, t) // demotes gen0 (1 row)
    DedupTextQueries.foldAdmittedVia(identity)(spark, t, frame(2L -> 20L))
    DedupTextQueries.compactStore(spark, t) // demotes gen1 (2 rows)
    DedupTextQueries.foldAdmittedVia(identity)(spark, t, frame(3L -> 30L))
    assert(RunStore.asOfGeneration(spark, t, 0).count() == 3)
    assert(RunStore.asOfGeneration(spark, t, 1).count() == 2)
    assert(RunStore.asOfGeneration(spark, t, 2).count() == 1)
    RunStore.dropWithLocation(spark, t)
  }

  test("a RETIRED-tombstoned demotion leaves as-of history (round-15 " +
    "advisory: dropWithLocation's rename-failed fallback): back=0 " +
    "still serves, the tombstoned snapshot never resolves") {
    val t = freshTable("retired")
    graft.core.Tables.writeBucketed(frame(1L -> 10L, 2L -> 20L), t, 2, "k")
    DedupTextQueries.compactStore(spark, t)
    assert(RunStore.asOfGeneration(spark, t, back = 1).count() == 2)
    // simulate the fallback: the demoted generation (the pre-compaction
    // default dir) could not be renamed out of the namespace, so the
    // tombstone was written in place instead
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val demoted = new org.apache.hadoop.fs.Path(
      wh, t.toLowerCase(java.util.Locale.ROOT))
    val fs = demoted.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(demoted), s"expected demoted default dir $demoted")
    fs.create(new org.apache.hadoop.fs.Path(
      demoted, RunStore.RetiredMarker), true).close()
    assert(RunStore.asOfGeneration(spark, t, back = 0).count() == 2)
    intercept[IllegalArgumentException] {
      RunStore.asOfGeneration(spark, t, back = 1) // history shortened
    }
    RunStore.dropWithLocation(spark, t)
  }
}
