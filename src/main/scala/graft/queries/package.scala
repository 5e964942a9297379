package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Shared conventions for the oracle-checked query suite.
  *
  * Oracle-parity rules (SURVEY.md §7.4):
  *  - Money aggregates go through DECIMAL(18,2): decimal sums are exact and
  *    order-independent, so Spark's parallel partial aggregation and
  *    DuckDB's serial sum agree bit-for-bit; the final value is cast to
  *    DOUBLE (exact for these magnitudes) so output schemas match without
  *    decimal precision/scale mismatches between engines.
  *  - No `round()` on doubles whose shortest decimal representation could
  *    sit on a rounding boundary (Spark rounds the shortest repr HALF_UP,
  *    DuckDB rounds the binary value) — averages are only taken over
  *    integer-valued columns, where both engines sum exactly.
  *  - Timestamps are compared as epoch millis (BIGINT), never as raw
  *    timestamp columns, sidestepping ns/µs precision differences between
  *    the parquet writers.
  *  - Every query ends in a total ORDER BY on a unique key.
  *  - `now` is a fixed literal (task.ts:184 semantics: one clock read per
  *    run), pinned just after the events table's max timestamp.
  *  - Hashing is md5-derived on both engines (`conv(substr(md5 ...)` ⟷
  *    `('0x'||substr(md5 ...))::BIGINT`); uniform [0,1) values divide the
  *    60-bit slice by 16^15 (q49).
  *  - Floating-point CONSTANTS shared by both engines (q46's hyperplanes)
  *    are generated once in Scala and embedded verbatim in the SQL —
  *    shortest-repr Double.toString round-trips exactly through DuckDB's
  *    parser, and double dot-products accumulate in index order on both
  *    sides, so even sign-threshold comparisons agree bit-for-bit.
  *  - Non-parquet inputs (q50's GeoJSON fixture) are held as structured
  *    Scala data that GENERATES both the JSON body and the oracle's
  *    VALUES rows. NZ local time renders via DuckDB's ICU `timezone`
  *    (instant → naive local); the NZST/NZDT name falls out of the
  *    offset (`epoch_ms(local) - epoch_ms(instant)`) on both engines.
  *  - Skew caps (BucketPairs) appear in the oracle as a windowed
  *    `COUNT(*) OVER (PARTITION BY bucket) <= cap` filter, keeping capped
  *    semantics bit-identical.
  *  - DuckDB widens `SUM(BIGINT)` — including window SUM — to HUGEINT,
  *    which Spark has no counterpart for; the driver's hash is
  *    TYPE-sensitive even when every value fits in 64 bits (r3: q61
  *    `n_docs`, q62 `bin`). Any oracle output column derived from a SUM
  *    must be wrapped in `CAST(... AS BIGINT)`. dev/compare.py enforces
  *    this by diffing DuckDB result types against the Spark dump's types.
  */
package object queries {
  /** A named engine query: (session, sf-dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Fixed "now" for age/time-ago queries: 2024-01-31T00:00:00Z, just past
    * `events.ts` max (2024-01-30T23:57Z).
    */
  val NowMs: Long = 1706659200000L

  /** Exact money arithmetic: see package doc. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** THE tokenization contract, shared by every token-consuming query
    * (dedup, quality, packing): whitespace split with empties dropped.
    * Spark `split` keeps trailing empty strings while DuckDB's
    * `string_split_regex` may not; the filter makes both sides identical.
    * One definition — a tweak here changes every consumer in lockstep,
    * never one module silently drifting from another.
    */
  def tokens(c: Column): Column =
    org.apache.spark.sql.functions.filter(
      org.apache.spark.sql.functions.split(c, "\\s+"),
      x => org.apache.spark.sql.functions.length(x) > org.apache.spark.sql.functions.lit(0))

  /** DuckDB mirror of [[tokens]] over the `text` column. */
  val tokensSql: String =
    "list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0)"

  /** THE md5-uniform construction: a deterministic, retry-stable uniform
    * [0,1) draw per row — the first 60 bits of `md5(salt || id)` divided
    * by 16¹⁵. Different salts give independent decisions for the same
    * id (split vs sample vs mixture). The constant and substring bounds
    * are a cross-engine parity contract shared by every sampling/split
    * query — single-sourced here with [[mdUniformSql]] so no copy can
    * drift.
    */
  def mdUniform(salt: String, id: Column): Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 15), 16, 10)
      .cast("long") / lit(1152921504606846976.0) // / 16^15
  }

  /** DuckDB mirror of [[mdUniform]]; `idExpr` is a SQL expression. */
  def mdUniformSql(salt: String, idExpr: String): String =
    s"('0x' || substr(md5('$salt' || CAST($idExpr AS VARCHAR)), 1, 15))::BIGINT" +
      " / 1152921504606846976.0"

  /** THE train/val/test split contract — salt `split:`, 90/5/5 — shared
    * by the split profile (q49), the training manifest (q66) and the
    * split-leakage gate (q80), single-sourced with [[splitAssignSql]] so
    * retuning the holdout fraction cannot leave one consumer checking a
    * different split than the one shipped.
    */
  def splitAssign(id: Column): Column = {
    import org.apache.spark.sql.functions._
    val u = mdUniform("split:", id)
    when(u < 0.9, "train").when(u < 0.95, "val").otherwise("test")
  }

  /** DuckDB mirror of [[splitAssign]]. The md5-uniform draw renders once
    * per comparison (it is deterministic, so single-vs-double evaluation
    * cannot diverge).
    */
  def splitAssignSql(idExpr: String): String = {
    val u = mdUniformSql("split:", idExpr)
    s"CASE WHEN $u < 0.9 THEN 'train' WHEN $u < 0.95 THEN 'val' ELSE 'test' END"
  }
}
