package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.StoreLeases

/** The guard claims behind q249 that its green-path hash cannot hold:
  * [[RunStore.vacuumRetain]] is a retention POLICY, never a license to
  * delete under a reader — a live lease defers the prune entirely, and
  * the [[RunStore.sweepGraceMs]] age gate protects cross-process
  * readers of freshly-demoted history even when policy says prune.
  */
class VacuumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf0001

  /** A two-generation store (demoted default dir + current `__c`). */
  private def buildStore(tag: String): String = {
    val t = RunStore.tableName(s"graft_vacspec_$tag", sf)
    RunStore.dropWithLocation(spark, t)
    val docs = graft.core.Tables.documents(spark, sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    graft.core.Tables.writeBucketed(docs, t, 4, "lang")
    DedupTextQueries.compactStore(spark, t)
    t
  }

  test("a live lease defers the vacuum; after release the same call " +
    "prunes") {
    val t = buildStore("lease")
    val saved = RunStore.sweepGraceMs
    RunStore.sweepGraceMs = 0L
    try {
      StoreLeases.acquire("vacspec-reader", Set(t))
      try {
        assert(RunStore.vacuumRetain(spark, t, keepHistory = 0).isEmpty,
          "a live lease must defer the prune")
        assert(RunStore.asOfGeneration(spark, t, back = 1).count() > 0,
          "the deferred generation must still read")
      } finally StoreLeases.release("vacspec-reader")
      assert(RunStore.vacuumRetain(spark, t, keepHistory = 0).size == 1,
        "after release the same policy prunes the one history entry")
      intercept[IllegalArgumentException] {
        RunStore.asOfGeneration(spark, t, back = 1).count()
      }
    } finally RunStore.sweepGraceMs = saved
  }

  test("the age gate keeps freshly-demoted history even when policy " +
    "says prune") {
    val t = buildStore("age")
    // default sweepGraceMs (minutes) - the just-built history is young
    assert(RunStore.vacuumRetain(spark, t, keepHistory = 0).isEmpty,
      "history younger than sweepGraceMs must survive keepHistory=0")
    assert(RunStore.asOfGeneration(spark, t, back = 1).count() > 0)
  }
}
