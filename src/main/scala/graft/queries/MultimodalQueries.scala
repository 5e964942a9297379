package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._

/** Multimodal-column plumbing (BASELINE.json north_star): media payloads
  * are opaque `binary` columns with typed metadata alongside. The real
  * decode path (image/audio libs) is stubbed — see
  * [[graft.multimodal.MediaPipeline]] for the partition-wise decoder
  * plumbing — but the Spark-side schema/expression surface here is real:
  * encode to bytes, measure, slice headers, derive deterministic metadata.
  */
object MultimodalQueries {

  /** q43 — binary column metadata extraction: byte length, 4-byte header
    * hex (the "magic number" sniff), and deterministic fake decode outputs
    * (width/height/frame count) derived from the payload size.
    */
  val q43MultimodalMeta: Q = (s, d) =>
    documents(s, d)
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("byte_len"),
        hex(encode(substring(col("text"), 1, 4), "UTF-8")).as("header_hex"))
      .withColumn("width", (col("byte_len") % 640 + 1).cast("int"))
      .withColumn("height", ((col("byte_len") * 7) % 480 + 1).cast("int"))
      .withColumn("n_frames", (col("byte_len") % 30 + 1).cast("int"))
      .orderBy("doc_id")

  val q43Sql: String =
    """SELECT doc_id,
      | octet_length(encode(text)) AS byte_len,
      | hex(encode(substr(text, 1, 4))) AS header_hex,
      | CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      | CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INTEGER) AS height,
      | CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q52 — frame sampling through the typed `mapPartitions` plumbing
    * ([[graft.multimodal.MediaPipeline.sampleFrames]]): "video" payloads
    * (every third doc) are cut into 16-byte frame windows and every 16th
    * window is kept — the decode-side shape (binary in, exploded typed
    * frames out) a real extractor produces. The oracle replays the same
    * windowing relationally (the corpus is ASCII, so byte and character
    * offsets coincide — asserted by the `byte_len = length(text)` parity
    * in q43).
    */
  val q52FrameSample: Q = (s, d) => {
    import graft.multimodal.MediaPipeline
    val media = MediaPipeline.toMediaRows(documents(s, d))
    MediaPipeline.sampleFrames(media, 16)
      .orderBy("doc_id", "frame_no")
  }

  val q52Sql: String =
    """WITH vids AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 + 1 = 3),
      |frames AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS frame_no,
      |         substr(text, CAST(i * 16 + 1 AS INTEGER), 16) AS frame_bytes
      |  FROM vids, unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS t(i)
      |  WHERE i % 16 = 0)
      |SELECT doc_id, frame_no, frame_bytes FROM frames
      |ORDER BY doc_id, frame_no""".stripMargin

  val queries: Map[String, Q] = Map(
    "q43_multimodal_meta" -> q43MultimodalMeta,
    "q52_frame_sample" -> q52FrameSample)
  val oracle: Map[String, String] = Map(
    "q43_multimodal_meta" -> q43Sql,
    "q52_frame_sample" -> q52Sql)
}
