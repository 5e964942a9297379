package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (BASELINE.json north_star).
  *
  * Media payloads travel as opaque `binary` columns with typed metadata
  * alongside — the layout that scales: the 100 TB of bytes stay columnar
  * in parquet (never deserialized by Catalyst), while pruning/filtering
  * happens on the cheap metadata columns.
  *
  * Decode runs partition-wise via `mapPartitions` (the Scala analog of
  * `mapInPandas`): one decoder instantiation per partition, streamed
  * iterator-to-iterator so Spark can spill, never materializing a
  * partition of payloads in memory. The codec call itself is STUBBED —
  * this container has no image/audio libs — with a deterministic fake
  * deriving metadata from the payload bytes; `decodeReal` marks the seam
  * where a real codec plugs in.
  */
object MediaPipeline {

  /** An opaque media payload + its sidecar metadata. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decoder output: typed metadata per payload. */
  final case class MediaMeta(doc_id: Long, mime: String, byte_len: Int,
      header_hex: String, width: Int, height: Int, n_frames: Int)

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (stand-in for image/audio bytes), mime derived from doc_id.
    */
  def toMediaRows(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        element_at(typedlit(Seq("image/png", "audio/wav", "video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** The real-codec seam: would link libpng/ffmpeg/etc. Deliberately
    * unimplemented in this container.
    */
  private def decodeReal(mime: String, payload: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "real media codecs are not available in this environment")

  /** Deterministic stub standing in for [[decodeReal]]: metadata derived
    * from payload size/header so tests and oracles are stable.
    */
  private def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length
    val header = r.payload.take(4).map("%02X".format(_)).mkString
    MediaMeta(r.doc_id, r.mime, n, header,
      width = n % 640 + 1, height = (n * 7) % 480 + 1, n_frames = n % 30 + 1)
  }

  /** Partition-wise decode: iterator-in, iterator-out — no per-row task
    * overhead, no partition materialization, codec state reusable across
    * the partition.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would go here (open codec once)
      it.map(decodeStub)
    }
  }

  /** Deterministic frame sampling over a "video" payload: every k-th byte
    * window as a frame stand-in — exercises the explode/array shape a real
    * frame extractor would produce.
    */
  def sampleFrames(media: Dataset[MediaRow], everyK: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.mime == "video/mp4")
      .flatMap { r =>
        r.payload.grouped(everyK).zipWithIndex.collect {
          case (chunk, i) if i % everyK == 0 =>
            (r.doc_id, i, new String(chunk, StandardCharsets.UTF_8))
        }
      }
      .toDF("doc_id", "frame_no", "frame_bytes")
  }
}
