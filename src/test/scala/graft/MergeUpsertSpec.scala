package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.queries.IngestQueries

/** q175's MERGE core on a hand fixture covering every CDC edge case:
  * plain update, delete, delete-then-UPDATE (resurrection — the case
  * that distinguishes upsert from update), update-then-DELETE (delete
  * wins), insert under a fresh key, and an untouched base row. The
  * compaction is last-writer-wins by seq; the classification must
  * follow the elected op only.
  */
class MergeUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("last-writer-wins compaction: resurrection, late delete, insert, " +
    "plain update and untouched rows all classify correctly") {
    import spark.implicits._
    val base = Seq(
      (1L, "alpha"),   // untouched
      (2L, "bravo"),   // plain update
      (3L, "charlie"), // plain delete
      (4L, "delta"),   // delete@2 then update@3 -> resurrected (updated)
      (5L, "echo")     // update@1 then delete@2 -> deleted
    ).toDF("doc_id", "text")
    val feed = Seq(
      (2L, 1L, "U", "bravo v2"),
      (3L, 2L, "D", null.asInstanceOf[String]),
      (4L, 2L, "D", null.asInstanceOf[String]),
      (4L, 3L, "U", "delta v3"),
      (5L, 1L, "U", "echo v2"),
      (5L, 2L, "D", null.asInstanceOf[String]),
      (9L, 1L, "U", "ins 9")   // fresh key -> inserted
    ).toDF("doc_id", "seq", "op", "new_text")
    val out = IngestQueries.applyMerge(base, feed)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md5of = (t: String) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      (1L, "unchanged", md5of("alpha")),
      (2L, "updated", md5of("bravo v2")),
      (3L, "deleted", "gone"),
      (4L, "updated", md5of("delta v3")),
      (5L, "deleted", "gone"),
      (9L, "inserted", md5of("ins 9"))))
  }
}
