package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema evolution on the store fold ([[DedupTextQueries.foldWidenedVia]]):
  * a delta carrying an added nullable column widens the catalog schema and
  * appends O(delta); base files are never rewritten and read back
  * NULL-padded; readers that resolved the store BEFORE the widen keep
  * working against the old schema.
  */
class StoreWidenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshTable(tag: String): String = {
    val t = s"graft_widen_spec_$tag"
    RunStore.dropWithLocation(spark, t)
    t
  }

  private def baseFrame = {
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
  }

  private def deltaFrame = {
    import spark.implicits._
    Seq((4L, 40L, "a"), (5L, 50L, "b")).toDF("k", "v", "tag")
  }

  test("widen-on-fold: catalog gains the column, base rows read back " +
    "NULL-padded, delta rows carry their values, bucket spec unchanged") {
    val t = freshTable("pad")
    graft.core.Tables.writeBucketed(baseFrame, t, 2, "k")
    DedupTextQueries.foldWidenedVia(identity)(spark, t, deltaFrame)
    val after = spark.table(t)
    assert(after.schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    assert(after.filter(col("tag").isNull).count() == 3) // exactly base
    assert(after.filter(col("tag").isNotNull).count() == 2)
    assert(after.filter(col("k") === 4L).select("tag").head().getString(0)
      == "a")
    // the widen must not touch the bucket spec — the next fold (and the
    // serve-time exchange elision) depend on it
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t)).bucketSpec
    assert(spec.exists(b => b.numBuckets == 2 &&
      b.bucketColumnNames == Seq("k")), spec.toString)
    RunStore.dropWithLocation(spark, t)
  }

  test("pre-widen readers keep working: a DataFrame resolved before the " +
    "widen still serves its old schema without error") {
    val t = freshTable("reader")
    graft.core.Tables.writeBucketed(baseFrame, t, 2, "k")
    val preWiden = spark.table(t) // resolved against the 2-column schema
    val preRows = preWiden.count()
    DedupTextQueries.foldWidenedVia(identity)(spark, t, deltaFrame)
    // the old reader's plan is bound to (k, v): it must keep collecting
    // (projecting away the new column) — an analysis/read failure here
    // would mean widening broke every open reader of the store
    assert(preWiden.schema.fieldNames.toSeq == Seq("k", "v"))
    val served = preWiden.collect()
    assert(served.length >= preRows, s"pre-widen reader lost rows: " +
      s"${served.length} < $preRows")
    assert(served.forall(_.length == 2))
    RunStore.dropWithLocation(spark, t)
  }

  test("a same-schema delta is refused (use foldAdmittedVia), and a type " +
    "CHANGE still refuses after the widen path too") {
    val t = freshTable("guard")
    graft.core.Tables.writeBucketed(baseFrame, t, 2, "k")
    intercept[IllegalArgumentException] {
      DedupTextQueries.foldWidenedVia(identity)(spark, t, baseFrame)
    }
    import spark.implicits._
    // v arrives as STRING: adding 'tag' is legal but the v mismatch must
    // throw BEFORE the catalog is touched — the refusal is atomic
    val bad = Seq((9L, "nope", "x")).toDF("k", "v", "tag")
    intercept[IllegalArgumentException] {
      DedupTextQueries.foldWidenedVia(identity)(spark, t, bad)
    }
    // nothing appended AND nothing widened: the failed attempt must not
    // strand a spurious empty 'tag' column on the store
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v"))
    assert(spark.table(t).count() == 3)
    RunStore.dropWithLocation(spark, t)
  }

  test("case-variant column names resolve like Spark does (round-15 " +
    "advisory): a case-only rename is an overlap not an added column, " +
    "and a widen alongside one still lands atomically") {
    val t = freshTable("case")
    graft.core.Tables.writeBucketed(baseFrame, t, 2, "k")
    import spark.implicits._
    // 'V' differs only in case from the store's 'v': under the default
    // case-insensitive resolver this delta adds NOTHING — the refusal
    // must be the clear "adds no columns" one, not an ALTER
    // duplicate-column failure after the catalog was already touched
    val caseOnly = Seq((9L, 90L)).toDF("k", "V")
    val e = intercept[IllegalArgumentException] {
      DedupTextQueries.foldWidenedVia(identity)(spark, t, caseOnly)
    }
    assert(e.getMessage.contains("adds no columns"), e.getMessage)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v"))
    // a GENUINE widen whose delta also carries a case-variant overlap:
    // the ALTER adds only 'tag', and the append must not then strand it
    // by treating 'V' as missing — rows land, spelled the store's way
    val mixed = Seq((6L, 60L, "c")).toDF("k", "V", "tag")
    DedupTextQueries.foldWidenedVia(identity)(spark, t, mixed)
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    assert(spark.table(t).filter(col("k") === 6L)
      .select("v", "tag").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq(60L -> "c"))
    RunStore.dropWithLocation(spark, t)
  }
}
