package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.QuakeQueries.{FixtureJson, FixtureNowMs}
import graft.quakes.QuakeModel.QuakeConfig

/** File-source streaming wrapper: landed FeatureCollection snapshots are
  * micro-batches through the same pipeline (scheduled-batch semantics via
  * Trigger.AvailableNow + foreachBatch snapshot sink, which supports
  * checkpoint recovery across restarts).
  */
class QuakeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("landed snapshot files stream through the pipeline exactly once") {
    val dir = Files.createTempDirectory("quakes").toFile
    val checkpoint = Files.createTempDirectory("quakes-ckpt").toFile
    val seen = mutable.ListBuffer.empty[Seq[String]]

    def runOnce(): Unit = {
      val out = QuakeStream.cotStream(spark, dir.getAbsolutePath,
        QuakeConfig(), FixtureNowMs)
      assert(out.isStreaming)
      val q = out.select("id")
        .writeStream
        .option("checkpointLocation", checkpoint.getAbsolutePath)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.collect().map(_.getString(0)).sorted.toSeq
          seen.synchronized { seen += ids }
          () // K1 semantics: here the snapshot would POST / replace the layer
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // run 1: one landed file -> one snapshot batch, filters applied
    Files.writeString(new java.io.File(dir, "snap1.json").toPath, FixtureJson)
    runOnce()
    assert(seen.flatten.sorted == Seq("earthquake-2026p000001",
      "earthquake-2026p000002", "earthquake-2026p000005"))

    // run 2 (restart from checkpoint): only the newly landed file is
    // processed — the file source's checkpoint gives exactly-once per file
    seen.clear()
    Files.writeString(new java.io.File(dir, "snap2.json").toPath,
      FixtureJson.replace("2026p000001", "2026p000099"))
    runOnce()
    assert(seen.flatten.sorted == Seq("earthquake-2026p000002",
      "earthquake-2026p000005", "earthquake-2026p000099"))
  }
}
