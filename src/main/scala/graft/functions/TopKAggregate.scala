package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (id, score) entries, kept sorted by
  * (score desc, id asc) — insertion is a short shift in a primitive
  * array, no boxing, no re-sort.
  *
  * Score comparison follows SPARK's total order for doubles — NaN
  * greatest, -0.0 == 0.0 — so the buffer agrees with the
  * `row_number() OVER (ORDER BY score DESC)` window form even on NaN
  * scores (a bare `>` would let one NaN break the sorted invariant: it
  * never "beats" anything, so later entries pile up unsorted behind it).
  */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  @inline private def beats(s: Double, id: Long, i: Int): Boolean = {
    // + 0.0 collapses -0.0 to 0.0; Double.compare then matches Spark's
    // ordering (NaN > every non-NaN) instead of IEEE's NaN-incomparable
    val c = java.lang.Double.compare(s + 0.0, scores(i) + 0.0)
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(id: Long, score: Double): Unit = {
    if (n == k && !beats(score, id, n - 1)) return
    var p = n
    while (p > 0 && beats(score, id, p - 1)) p -= 1
    if (p >= k) return
    var i = math.min(n, k - 1)
    while (i > p) { ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1 }
    ids(p) = id; scores(p) = score
    if (n < k) n += 1
  }
}

/** Native per-group top-k aggregate (q44): the bounded-buffer shape of
  * [[TopKAggregator]] — each map-side partial ships at most k rows per
  * group through the shuffle — but expressed as a Catalyst
  * `TypedImperativeAggregate` over `InternalRow`, so it runs inside
  * `ObjectHashAggregate` with NO Deserialize/SerializeFromObject
  * boundary. The typed `groupByKey`/`Aggregator` skin (round-2 audit)
  * boxed every scored row into Scala tuples and severed whole-stage
  * codegen around the aggregation; this keeps the columnar pipeline
  * intact end to end — the scoring projection above it stays codegen'd,
  * and only the k-slot buffer update runs as an imperative call.
  *
  * Semantics match the window `row_number() OVER (ORDER BY score DESC,
  * id ASC) <= k` form exactly (ties → smaller id; NULL ids/scores
  * skipped, standard aggregate semantics) — proven row-identical in
  * TopKAggregatorSpec. Output is array<struct<id,score>> in rank order.
  */
case class TopKAggregate(
    id: Expression,
    score: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "top_k needs k > 0")

  override def children: Seq[Expression] = Seq(id, score)

  // fail at analysis, not with a ClassCastException mid-job: update()
  // decodes exactly (Long, Double)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (id.dataType, score.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (i, sc) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k expects (bigint id, double score), got (${i.sql}, ${sc.sql})")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val idv = id.eval(input)
    val sv = score.eval(input)
    if (idv != null && sv != null)
      buffer.insert(idv.asInstanceOf[Long], sv.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) { buffer.insert(other.ids(i), other.scores(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData((0 until buffer.n).map(i =>
      InternalRow(buffer.ids(i), buffer.scores(i))).toArray[Any])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putLong(buffer.ids(i)); bb.putDouble(buffer.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    // entries arrive already rank-ordered; insert preserves that order
    while (i < n) { buf.insert(bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(id = newChildren(0), score = newChildren(1))
}

object TopKAggregate {
  /** `top_k(id, score, k)` as a DSL aggregate Column. */
  def topK(id: Column, score: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAggregate(ExpressionUtils.expression(id),
        ExpressionUtils.expression(score), k).toAggregateExpression())

  /** Unpack a [[topK]] result into one row per entry with its 1-based
    * `rank` — THE output convention shared by every consumer (q44, q68),
    * single-sourced so the rank base and struct field names cannot drift
    * between call sites. Emits (group, rank, id, score); callers alias.
    */
  def explodeTopK(df: org.apache.spark.sql.DataFrame, group: Column,
      topk: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, posexplode}
    df.select(group.as("g"), posexplode(topk).as(Seq("i", "e")))
      .select(col("g").as("group"),
        (col("i") + 1).cast("long").as("rank"),
        col("e.id").as("id"), col("e.score").as("score"))
  }
}
