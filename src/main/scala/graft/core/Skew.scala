package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (builder prompt: "skewed keys → salting or
  * AQE skew-join").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; these
  * helpers cover the two cases it does not: heavy-hitter AGGREGATION keys
  * (one reducer owns the hot key) and hash joins where the hot key's rows
  * must be spread across many tasks. Both trade a bounded replication /
  * extra partial phase for even task sizes — at 100 TB a single hot key
  * (the empty document, a default user id, a null-ish sentinel) otherwise
  * turns one task into the job's critical path.
  */
object Skew {

  /** Two-phase salted sum: groupBy(key, salt) partial-aggregates the hot
    * key across `buckets` reducers, then a second cheap aggregate over at
    * most `buckets` rows per key merges the partials. Correct for any
    * commutative-associative aggregate; exact here via DECIMAL.
    *
    * The salt is derived from a second column (any roughly-uniform column
    * works — row identity, a hash of the payload) so it is deterministic,
    * unlike `rand()`-based salting which breaks retry idempotence.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltBy: Column,
      buckets: Int): DataFrame =
    df.select(key.as("k"), value.cast("decimal(18,2)").as("v"),
        pmod(hash(saltBy), lit(buckets)).as("_salt"))
      .groupBy("k", "_salt")
      .agg(sum(col("v")).as("pv"), count(lit(1)).as("pn"))
      .groupBy("k")
      .agg(sum(col("pv")).cast("double").as("total"),
        sum(col("pn")).as("n"))

  /** Salted equi-join of a skewed fact against a non-broadcastable dim:
    * the fact side gets a deterministic salt in [0, buckets); the dim side
    * is replicated `buckets` times with every salt value; joining on
    * (key, salt) spreads each hot key over `buckets` tasks. Replication
    * cost is buckets × |dim| — use only when the dim is too big to
    * broadcast but far smaller than the fact.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSaltBy: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(hash(factSaltBy), lit(buckets)))
    val saltedDim = dim.withColumn("_salt",
        explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
