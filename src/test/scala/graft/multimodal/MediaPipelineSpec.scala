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

  test("a REAL PNG payload routes through the real javax.imageio codec: " +
    "decoded dimensions are the encoded ones, not the stub formula") {
    import spark.implicits._
    val png = MediaPipeline.encodePng(13, 7)
    val rows = Seq(MediaPipeline.MediaRow(1L, "image/png", png)).toDS()
    val m = MediaPipeline.decodeMeta(rows).head()
    assert((m.width, m.height, m.n_frames) == (13, 7, 1))
    assert(m.header_hex == "89504E47", "PNG magic, not text bytes")
    // the stub formula would have produced different dims for this size
    assert(m.width != m.byte_len % 640 + 1 || m.height != (m.byte_len * 7) % 480 + 1)
  }

  test("the decode probe recovers the encoded pixel formula from the " +
    "bytes (encoder -> binary column -> decoder roundtrip)") {
    import spark.implicits._
    val rows = Seq(
      MediaPipeline.MediaRow(5L, "image/png", MediaPipeline.encodePng(20, 11)),
      MediaPipeline.MediaRow(6L, "image/png", MediaPipeline.encodePng(9, 16))
    ).toDS()
    val got = MediaPipeline.decodePngProbe(rows).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSeq
    assert(got == Seq(
      (5L, 20, 11, 1, 10 * 31 + 5 * 7),
      (6L, 9, 16, 1, 4 * 31 + 8 * 7)))
  }

  test("nearest-neighbor resize samples exactly src(x*w/ow, y*h/oh) — " +
    "odd dimensions included — and the feature probe aggregates the " +
    "RESIZED pixels, not the source") {
    import spark.implicits._
    // 13x7 source: ow=6, oh=3 — odd/even mix exercises the flooring
    val rows = Seq(MediaPipeline.MediaRow(9L, "image/png",
      MediaPipeline.encodePng(13, 7))).toDS()
    val got = MediaPipeline.resizeFeatureProbe(rows).head()
    assert((got.getInt(1), got.getInt(2)) == (6, 3))
    def src(x: Int, y: Int) = (x * 13 / 6) * 31 + (y * 7 / 3) * 7
    assert(got.getInt(3) == src(3, 1), "resized center must be the " +
      "nearest-neighbor source pixel")
    val expectedBlue = (for (y <- 0 until 3; x <- 0 until 6)
      yield src(x, y) % 256).sum.toLong
    assert(got.getLong(4) == expectedBlue,
      "sum_blue must aggregate the resized image's pixels")
  }

  test("a REAL WAV payload decodes through javax.sound.sampled: " +
    "container metadata and the PCM sample sum both recovered from " +
    "the bytes") {
    import spark.implicits._
    val rows = Seq(MediaPipeline.MediaRow(4L, "audio/wav",
      MediaPipeline.encodeWav(channels = 2, rate = 9000, frames = 25))).toDS()
    val got = MediaPipeline.decodeWavProbe(rows).head()
    assert((got.getInt(1), got.getInt(2), got.getInt(3)) == (2, 9000, 25))
    val expected = (0 until 50).map(i => (i * 131 + 7) % 4001 - 2000L).sum
    assert(got.getLong(4) == expected,
      "the sample sum must come from the decoded PCM frames")
  }

  test("a REAL WAV payload routes through javax.sound.sampled in " +
    "decodeMeta — channels/rate/frames from the fmt chunk, CONTENT-" +
    "dispatched (round-11 verdict #1: mime routing left real WAVs on " +
    "the stub)") {
    import spark.implicits._
    val wav = MediaPipeline.encodeWav(channels = 2, rate = 11000, frames = 40)
    // mime deliberately claims png: the RIFF magic must win
    val rows = Seq(MediaPipeline.MediaRow(7L, "image/png", wav)).toDS()
    val m = MediaPipeline.decodeMeta(rows).head()
    assert((m.channels, m.sample_rate, m.n_frames) == (2, 11000, 40))
    assert((m.width, m.height) == (0, 0))
    assert(m.header_hex == "52494646", "RIFF magic")
    assert(m.width != m.byte_len % 640 + 1, "not the stub formula")
  }

  test("AviCodec roundtrip: encodeAvi -> parse recovers dimensions, " +
    "declared frame count, and every frame stream byte-for-byte " +
    "(even-padding included)") {
    val frames = (0 until 5).map(f => MediaPipeline.encodePngOffset(11, 9, f * 13))
    val avi = AviCodec.encodeAvi(11, 9, frames)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val parsed = AviCodec.parse(avi)
    assert((parsed.width, parsed.height, parsed.totalFrames) == (11, 9, 5))
    assert(parsed.frames.length == 5)
    parsed.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want),
        "frame streams must survive the container byte-for-byte")
    }
    // a truncated container is an explicit error, not garbage metadata
    intercept[IllegalArgumentException] {
      AviCodec.parse(avi.take(40) ++ Array.fill[Byte](20)(1))
    }
  }

  test("AviCodec even-padding: ODD-length frame bodies round-trip " +
    "byte-for-byte and the pad byte never leaks into the next chunk") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7),
      Array[Byte](8))
    val parsed = AviCodec.parse(AviCodec.encodeAvi(3, 3, frames))
    assert(parsed.frames.length == 3)
    parsed.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want),
        s"frame bodies must round-trip exactly: " +
          s"${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("AviCodec roundtrip PROPERTY: random dimension/frame-count/" +
    "frame-size combinations (empty videos, 1x1 frames, odd sizes) all " +
    "survive encode -> parse byte-for-byte") {
    val rnd = new scala.util.Random(1942)
    (0 until 50).foreach { _ =>
      val w = rnd.nextInt(40) + 1
      val h = rnd.nextInt(30) + 1
      val n = rnd.nextInt(8) // 0 frames included
      val frames = (0 until n).map { _ =>
        Array.fill[Byte](rnd.nextInt(200) + 1)(rnd.nextInt(256).toByte)
      }
      val parsed = AviCodec.parse(AviCodec.encodeAvi(w, h, frames))
      assert((parsed.width, parsed.height, parsed.totalFrames) == (w, h, n))
      assert(parsed.frames.length == n)
      parsed.frames.zip(frames).foreach { case (got, want) =>
        assert(java.util.Arrays.equals(got, want),
          s"${w}x$h n=$n: frame bodies must round-trip exactly")
      }
    }
  }

  test("MJPEG-in-AVI works through the same container machinery: " +
    "JPEG-compressed frames round-trip the chunk walk byte-for-byte " +
    "and decode to the right dimensions (q113 ships Motion-PNG only " +
    "because the hash oracle needs lossless pixels — the container is " +
    "codec-agnostic)") {
    import spark.implicits._
    def jpegFrame(w: Int, h: Int, f: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 7 + f * 13) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = (0 until 4).map(f => jpegFrame(16, 12, f))
    val avi = AviCodec.encodeAvi(16, 12, frames)
    val parsed = AviCodec.parse(avi)
    assert(parsed.frames.length == 4)
    parsed.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want),
        "JPEG frame streams must survive the container byte-for-byte")
    }
    // the extraction path decodes JPEG frames too (ImageIO sniffs the
    // stream); dims and stride are exact — only pixel VALUES are
    // lossy, which is why the oracle-gated q113 uses PNG frames
    val rows = Seq(MediaPipeline.MediaRow(21L, "video/avi", avi)).toDS()
    val got = MediaPipeline.sampleAviFrames(rows, everyK = 2)
      .orderBy("frame_no").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == Seq((0, 16, 12), (2, 16, 12)),
      s"JPEG frames must decode through the same extraction path " +
        s"(even-indexed frames, true dimensions): $got")
  }

  test("a REAL AVI payload routes through the container parser in " +
    "decodeMeta: dimensions and frame count from the avih walk") {
    import spark.implicits._
    val frames = (0 until 3).map(f => MediaPipeline.encodePngOffset(14, 10, f * 13))
    val rows = Seq(MediaPipeline.MediaRow(8L, "video/mp4",
      AviCodec.encodeAvi(14, 10, frames))).toDS()
    val m = MediaPipeline.decodeMeta(rows).head()
    assert((m.width, m.height, m.n_frames) == (14, 10, 3))
    assert((m.channels, m.sample_rate) == (0, 0))
    assert(m.header_hex == "52494646")
  }

  test("sampleAviFrames extracts every k-th REAL frame: container walk " +
    "+ javax.imageio decode recover the per-frame pixel formula") {
    import spark.implicits._
    val frames = (0 until 6).map(f => MediaPipeline.encodePngOffset(13, 7, f * 13))
    val rows = Seq(MediaPipeline.MediaRow(12L, "video/avi",
      AviCodec.encodeAvi(13, 7, frames))).toDS()
    val got = MediaPipeline.sampleAviFrames(rows, everyK = 2)
      .orderBy("frame_no").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
    val center = 6 * 31 + 3 * 7
    assert(got == Seq((0, 13, 7, center), (2, 13, 7, center + 26),
      (4, 13, 7, center + 52)),
      "sampled frames must be the even-indexed REAL frames, pixels " +
        "recovered from the decoded streams")
  }

  test("an UNKNOWN mime is an explicit NotImplementedError — the codec " +
    "seam is reachable only for mimes with no decoder, never a silent stub") {
    import spark.implicits._
    val rows = Seq(MediaPipeline.MediaRow(2L, "model/gltf+json",
      Array[Byte](1, 2, 3))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      MediaPipeline.decodeMeta(rows).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[NotImplementedError]),
      s"expected a NotImplementedError cause, got $e")
  }

  test("a text-payload 'image/png' stand-in (no PNG magic) still takes " +
    "the deterministic stub — the corpus fixtures keep their metadata") {
    import spark.implicits._
    val rows = Seq(MediaPipeline.MediaRow(3L, "image/png",
      "not a png at all".getBytes("UTF-8"))).toDS()
    val m = MediaPipeline.decodeMeta(rows).head()
    assert(m.width == m.byte_len % 640 + 1, "stub formula expected")
  }

  test("byte-window sampling yields windows only for video payloads") {
    val frames = MediaPipeline.sampleByteWindows(media, everyK = 16)
    assert(frames.count() > 0)
    val ids = frames.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    // mime = video/mp4 iff doc_id % 3 == 2
    assert(ids.forall(_ % 3 == 2))
  }
}
