package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucket-local candidate-pair enumeration — the shared shape of LSH band
  * joins (q32) and blocked n-gram Jaccard (q34).
  *
  * One shuffle on the bucket key, then pairs are enumerated INSIDE each
  * bucket with an array transform — no self-join, so the upstream pipeline
  * (tokenize → shingle → hash) is evaluated exactly once instead of once
  * per join side.
  *
  * The `cap` is the skew guard: a degenerate bucket (a stop-shingle like
  * "the end", an LSH band key hit by an adversarial corpus) would
  * otherwise collect every matching id into ONE task and enumerate
  * O(bucket²) pairs — the classic single-task OOM at 100 TB. Buckets over
  * `cap` are dropped, which is also the standard LSH/blocking semantics:
  * a key shared by that many documents carries no discriminating signal.
  * Oracles must apply the same cap (a windowed COUNT(*) filter) so results
  * stay bit-identical.
  */
object BucketPairs {

  /** Largest bucket that still enumerates pairs. 64 ⇒ ≤2016 pairs per
    * bucket, far above anything a non-adversarial corpus produces (the
    * sf0.1 max bucket is 5) and small enough that one task's work stays
    * trivially bounded.
    */
  val DefaultCap = 64

  /** Enumerate unordered pairs `(a, b)` with `a < b` (by the payload's
    * natural/struct order) within each bucket of `keys`, skipping buckets
    * larger than `cap`.
    *
    * @param df      input, one row per (bucket, member)
    * @param keys    bucket key columns
    * @param payload member value (any orderable type incl. struct)
    */
  def boundedPairs(df: DataFrame, keys: Seq[Column], payload: Column,
      cap: Int = DefaultCap): DataFrame =
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(payload)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= cap)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      // contract guard: duplicate payloads within a bucket would pair
      // with themselves under the sorted-slice enumeration — a self-pair
      // is never valid candidate evidence, so drop it here rather than
      // trusting every caller to dedupe upstream
      .filter(not(col("p.a") <=> col("p.b")))
      .select(col("p.a").as("a"), col("p.b").as("b"))
}
