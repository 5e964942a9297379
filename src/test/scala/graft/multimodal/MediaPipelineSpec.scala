package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media =
    MediaPipeline.toMediaRows(Tables.documents(spark, TestSpark.Sf0001))

  test("media rows: binary payload + mime metadata for every document") {
    assert(media.count() == 500)
    val r = media.filter(_.doc_id == 0).head()
    assert(r.mime == "image/png")
    assert(r.payload.nonEmpty)
  }

  test("partition-wise decode stub produces deterministic typed metadata") {
    val meta = MediaPipeline.decodeMeta(media)
    assert(meta.count() == 500)
    val m = meta.filter(_.doc_id == 0).head()
    assert(m.byte_len > 0)
    assert(m.width == m.byte_len % 640 + 1)
    assert(m.header_hex.length == 8)
    // deterministic across runs
    assert(MediaPipeline.decodeMeta(media).filter(_.doc_id == 0).head() == m)
  }

  test("frame sampling yields frames only for video payloads") {
    val frames = MediaPipeline.sampleFrames(media, everyK = 16)
    assert(frames.count() > 0)
    val ids = frames.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // mime = video/mp4 iff doc_id % 3 == 2
    assert(ids.forall(_ % 3 == 2))
  }
}
