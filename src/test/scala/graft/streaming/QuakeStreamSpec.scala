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

  test("snapshot expiry is cumulative across micro-batches AND restarts: " +
    "an id expires in the batch where it first goes missing (J2 streaming)") {
    val dir = Files.createTempDirectory("quakes-exp").toFile
    val checkpoint = Files.createTempDirectory("quakes-exp-ckpt").toFile
    val transport = new graft.sources.FakeTransport(
      _ => graft.sources.HttpResponse(200, "OK", ""))
    val expiredByBatch = mutable.ListBuffer.empty[(Long, Seq[String])]

    // every run is a FRESH AvailableNow invocation — the reference's cron
    // schedule — so any in-memory "previous snapshot" is lost between
    // snapshots and only the persisted expiry state can carry the live set
    def runOnce(): Unit = {
      val out = QuakeStream.cotStream(spark, dir.getAbsolutePath,
        QuakeConfig(), FixtureNowMs)
      val q = QuakeStream.submitWithExpiry(out, "https://sink.example/cot",
        transport, checkpoint.getAbsolutePath,
        onExpired = (b, ids) => expiredByBatch.synchronized {
          expiredByBatch += ((b, ids))
        })
      q.awaitTermination(60000)
    }

    // batch 0: live {1,2,5} (post-filter), nothing to expire
    Files.writeString(new java.io.File(dir, "s1.json").toPath, FixtureJson)
    runOnce()
    // batch 1 (restart): 1 replaced by 99 -> 1 expires HERE, despite the
    // previous snapshot living only in persisted state
    Files.writeString(new java.io.File(dir, "s2.json").toPath,
      FixtureJson.replace("2026p000001", "2026p000099"))
    runOnce()
    // batch 2 (restart): 2 replaced by 98 -> exactly {2} expires (99 and 5
    // still live; 1 does NOT re-expire)
    Files.writeString(new java.io.File(dir, "s3.json").toPath,
      FixtureJson.replace("2026p000001", "2026p000099")
        .replace("2026p000002", "2026p000098"))
    runOnce()
    // batch 3 (restart): 5 — live since batch 0, never the "previous
    // batch's delta" — goes missing and expires in THIS batch
    Files.writeString(new java.io.File(dir, "s4.json").toPath,
      FixtureJson.replace("2026p000001", "2026p000099")
        .replace("2026p000002", "2026p000098")
        .replace("2026p000005", "2026p000097"))
    runOnce()

    assert(expiredByBatch.toList == List(
      0L -> Seq.empty,
      1L -> Seq("earthquake-2026p000001"),
      2L -> Seq("earthquake-2026p000002"),
      3L -> Seq("earthquake-2026p000005")))
    // the snapshot POST leg still fired once per batch
    assert(transport.posts.size == 4)
    assert(transport.posts.forall(_._1 == "https://sink.example/cot"))
    // state pruning: one micro-batch per run -> at most the current and
    // previous batch's .ids files survive (unbounded growth guard)
    val stateFiles = new java.io.File(checkpoint, "expiry-state")
      .listFiles().map(_.getName).filter(_.endsWith(".ids")).sorted
    assert(stateFiles.toSeq == Seq("2.ids", "3.ids"))
  }

  test("a multi-snapshot BACKLOG drains one file per batch, so ids " +
    "dropped between pending snapshots still expire (a downtime gap " +
    "must not merge snapshots into one union id-set)") {
    val dir = Files.createTempDirectory("quakes-bl").toFile
    val checkpoint = Files.createTempDirectory("quakes-bl-ckpt").toFile
    val transport = new graft.sources.FakeTransport(
      _ => graft.sources.HttpResponse(200, "OK", ""))
    val expiredByBatch = mutable.ListBuffer.empty[(Long, Seq[String])]

    // BOTH snapshots land before the consumer comes back up; modTimes
    // pin the file source's processing order
    val f1 = new java.io.File(dir, "s1.json")
    val f2 = new java.io.File(dir, "s2.json")
    Files.writeString(f1.toPath, FixtureJson)
    Files.writeString(f2.toPath,
      FixtureJson.replace("2026p000001", "2026p000099"))
    f1.setLastModified(System.currentTimeMillis() - 60000)
    f2.setLastModified(System.currentTimeMillis() - 30000)

    val out = QuakeStream.cotStream(spark, dir.getAbsolutePath,
      QuakeConfig(), FixtureNowMs)
    val q = QuakeStream.submitWithExpiry(out, "https://sink.example/cot",
      transport, checkpoint.getAbsolutePath,
      onExpired = (b, ids) => expiredByBatch.synchronized {
        expiredByBatch += ((b, ids))
      })
    q.awaitTermination(60000)

    assert(expiredByBatch.toList == List(
      0L -> Seq.empty,
      1L -> Seq("earthquake-2026p000001")))
    assert(transport.posts.size == 2)
  }
}
