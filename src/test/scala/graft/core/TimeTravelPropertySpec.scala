package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized state-machine property for the store lifecycle under
  * time travel: for ANY interleaving of folds and compactions, the
  * generation history must read back as exactly the content snapshots
  * the swaps demoted — asOf(0) is always the cumulative fold state,
  * asOf(k) the state at the k-th-most-recent compaction. A fixed seed
  * keeps the walk deterministic (the repo's randomized-spec
  * convention); 2 walks × ~10 ops keep the spec inside test budget.
  */
class TimeTravelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, i * 10)).toDF("k", "v")
  }

  test("random fold/compact interleavings: every retained generation " +
    "reads back as the exact snapshot its swap demoted") {
    val rnd = new scala.util.Random(42)
    for (walk <- 1 to 2) {
      val t = s"graft_ttprop_$walk"
      RunStore.dropWithLocation(spark, t)
      var next = 0L
      def take(n: Int): Seq[Long] = { val r = (next until next + n); next += n; r }
      var current = take(3)
      graft.core.Tables.writeBucketed(rows(current), t, 2, "k")
      // content snapshots demoted by compactions, most recent first
      var demoted = List.empty[Seq[Long]]
      val ops = 8 + rnd.nextInt(3)
      for (_ <- 1 to ops) {
        if (rnd.nextBoolean()) {
          val delta = take(1 + rnd.nextInt(2))
          DedupTextQueries.foldAdmittedVia(identity)(spark, t, rows(delta))
          current = current ++ delta
        } else {
          DedupTextQueries.compactStore(spark, t)
          demoted = current +: demoted
        }
        // asOf(0) = cumulative folds, whatever happened
        val live = RunStore.asOfGeneration(spark, t, 0)
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        assert(live == current.sorted, s"walk $walk live: $live vs $current")
        // every retained demotion reads back as its exact snapshot
        demoted.zipWithIndex.foreach { case (snap, i) =>
          val got = RunStore.asOfGeneration(spark, t, i + 1)
            .select("k").collect().map(_.getLong(0)).sorted.toSeq
          assert(got == snap.sorted,
            s"walk $walk asOf(${i + 1}): $got vs $snap")
        }
        // beyond history refuses
        intercept[IllegalArgumentException] {
          RunStore.asOfGeneration(spark, t, demoted.size + 1)
        }
      }
      RunStore.dropWithLocation(spark, t)
    }
  }
}
