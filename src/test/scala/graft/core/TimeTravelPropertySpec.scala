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

  test("random fold/compact/widen interleavings: every retained " +
    "generation reads back as the exact snapshot its swap demoted, " +
    "and pre-widen generations keep their narrow schema") {
    val rnd = new scala.util.Random(42)
    for (walk <- 1 to 2) {
      val t = s"graft_ttprop_$walk"
      RunStore.dropWithLocation(spark, t)
      var next = 0L
      def take(n: Int): Seq[Long] = { val r = (next until next + n); next += n; r }
      var current = take(3)
      graft.core.Tables.writeBucketed(rows(current), t, 2, "k")
      // content snapshots demoted by compactions, most recent first,
      // with the column count each snapshot was written under
      var demoted = List.empty[(Seq[Long], Int)]
      var widened = false
      val ops = 8 + rnd.nextInt(3)
      for (_ <- 1 to ops) {
        val dice = rnd.nextInt(widened match { case true => 2; case false => 3 })
        if (dice == 0) {
          val delta = take(1 + rnd.nextInt(2))
          if (widened) {
            import spark.implicits._
            DedupTextQueries.foldAdmittedVia(identity)(spark, t,
              delta.map(i => (i, i * 10, s"t$i")).toDF("k", "v", "tag"))
          } else DedupTextQueries.foldAdmittedVia(identity)(spark, t,
            rows(delta))
          current = current ++ delta
        } else if (dice == 1) {
          DedupTextQueries.compactStore(spark, t)
          demoted = (current, if (widened) 3 else 2) +: demoted
        } else {
          // schema evolution mid-history: later generations carry the
          // widened schema, earlier retained ones keep the narrow one
          import spark.implicits._
          val delta = take(1)
          DedupTextQueries.foldWidenedVia(identity)(spark, t,
            delta.map(i => (i, i * 10, s"t$i")).toDF("k", "v", "tag"))
          current = current ++ delta
          widened = true
        }
        // asOf(0) = cumulative folds, whatever happened
        val live = RunStore.asOfGeneration(spark, t, 0)
          .select("k").collect().map(_.getLong(0)).sorted.toSeq
        assert(live == current.sorted, s"walk $walk live: $live vs $current")
        // every retained demotion reads back as its exact snapshot,
        // under the schema it was written with
        demoted.zipWithIndex.foreach { case ((snap, ncols), i) =>
          val gen = RunStore.asOfGeneration(spark, t, i + 1)
          assert(gen.schema.size == ncols,
            s"walk $walk asOf(${i + 1}) schema: ${gen.schema.fieldNames.toSeq}")
          val got = gen.select("k").collect().map(_.getLong(0)).sorted.toSeq
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
