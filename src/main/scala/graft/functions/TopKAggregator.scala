package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k accumulator (SURVEY.md §2.9/§7.3): keeps the k highest
  * scores in a bounded buffer through `reduce`/`merge`, so a global or
  * per-group top-k costs one aggregation pass with map-side combine —
  * each partition ships at most k candidates to the shuffle, the
  * `Aggregator` analog of `TakeOrderedAndProject`. Useful where the
  * top-k is per GROUP (TakeOrderedAndProject only handles the global
  * case) or feeds further typed computation.
  *
  * Ties break toward the smaller id, making results deterministic.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  // Spark's double total order (NaN greatest, -0.0 == 0.0) so the typed
  // and native ([[TopKAggregate]]) variants rank identically, NaN included
  private def ranksBefore(a: (Long, Double), b: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2 + 0.0, b._2 + 0.0)
    c > 0 || (c == 0 && a._1 < b._1)
  }

  private def trim(b: List[(Long, Double)]): List[(Long, Double)] =
    b.sortWith(ranksBefore).take(k)

  override def zero: List[(Long, Double)] = Nil

  override def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] =
    // avoid resorting when the candidate can't enter a full buffer
    if (b.sizeIs >= k && ranksBefore(b.last, a)) b else trim(a :: b)

  override def merge(b1: List[(Long, Double)], b2: List[(Long, Double)]): List[(Long, Double)] =
    trim(b1 ::: b2)

  override def finish(r: List[(Long, Double)]): Seq[(Long, Double)] = r

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
