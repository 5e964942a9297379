package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Map-side corpus transforms are stream-ready by construction — no
  * aggregation, no sort, no state — so the SAME code path must produce
  * the SAME rows whether the documents arrive as a table or as
  * micro-batches. Pinned here for chunking (q67's transform), the
  * pattern every map-only op in the suite follows.
  */
class StreamReadyTransformsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunkTokens emits identical rows on a batch frame and on a " +
    "micro-batched stream of the same documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, Array.tabulate(100)(i => s"w$i").mkString(" ")), // 3 chunks
      (2L, "short doc only"),                               // 1 chunk
      (3L, "")                                              // 0 chunks
    )
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet

    val batch = rows(graft.queries.IngestQueries
      .chunkTokens(docs.toDF("doc_id", "text")))

    val source = MemoryStream[(Long, String)]
    val q = graft.queries.IngestQueries
      .chunkTokens(source.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    try {
      source.addData(docs(0))
      q.processAllAvailable()
      source.addData(docs(1), docs(2))
      q.processAllAvailable()
      assert(rows(spark.table("chunks")) == batch)
      assert(batch.map(_._1) == Set(1L, 2L)) // doc 3 chunk-free, doc 1 split
      assert(batch.count(_._1 == 1L) == 3)
    } finally q.stop()
  }
}
