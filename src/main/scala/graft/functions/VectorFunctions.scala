package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math.
  *
  * Cosine similarity over `array<float>` / `array<double>` columns is the
  * hot inner loop of similarity search and embedding near-dup at 100 TB
  * scale: a 64-dim dot product per candidate pair. A custom
  * `BinaryExpression` with `doGenCode` keeps it inside whole-stage codegen
  * — one fused primitive loop per row, no boxing, no UDF serialization —
  * beating both a Scala UDF and the `zip_with`+`aggregate` higher-order
  * formulation (which allocates an intermediate array per row).
  *
  * Semantics: accumulate x·y, x·x, y·y in IEEE double in index order, then
  * xy / (sqrt(xx)·sqrt(yy)). Index-ordered accumulation makes the result
  * bit-reproducible and oracle-comparable.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects array columns, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(a.numElements(), b.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, lt); val y = get(b, i, rt)
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    val denom = math.sqrt(xx) * math.sqrt(yy)
    if (denom == 0.0) null else java.lang.Double.valueOf(xy / denom)
  }

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Every local is freshName'd: two instances of this expression can
    // land in ONE codegen scope (e.g. an ADC score and an exact re-rank
    // score in the same projection) — fixed names would collide and
    // silently demote the whole function to the interpreted path.
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
    val yy = ctx.freshName("yy")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val denom = ctx.freshName("denom")
    def getter(v: String, t: DataType) = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0, $xx = 0.0, $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, lt)};
         |  double $y = ${getter(b, rt)};
         |  $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $xy / $denom; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 (Euclidean) distance, same codegen strategy as [[CosineSimilarity]]. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val x = lt match { case FloatType => a.getFloat(i).toDouble; case _ => a.getDouble(i) }
      val y = rt match { case FloatType => b.getFloat(i).toDouble; case _ => b.getDouble(i) }
      val d = x - y; s += d * d; i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName'd locals — see CosineSimilarity.doGenCode.
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val s = ctx.freshName("s"); val d = ctx.freshName("d")
    def getter(v: String, t: DataType) = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(a, lt)} - ${getter(b, rt)};
         |  $s += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product, index-ordered double accumulation — the primitive behind
  * the LSH sign test (q46): `sign(dot(v,h)) == sign(cos(v,h))` but
  * without the two norm accumulators and two sqrts per evaluation that
  * [[CosineSimilarity]] would waste in a 36-hyperplane banding stage.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double>, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = math.min(a.numElements(), b.numElements())
    var xy = 0.0; var i = 0
    while (i < n) {
      val x = lt match { case FloatType => a.getFloat(i).toDouble; case _ => a.getDouble(i) }
      val y = rt match { case FloatType => b.getFloat(i).toDouble; case _ => b.getDouble(i) }
      xy += x * y; i += 1
    }
    java.lang.Double.valueOf(xy)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName'd locals — see CosineSimilarity.doGenCode.
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val xy = ctx.freshName("xy")
    def getter(v: String, t: DataType) = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case _ => s"$v.getDouble($i)"
    }
    val lt = elemType(left); val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $xy += ${getter(a, lt)} * ${getter(b, rt)};
         |}
         |${ev.value} = $xy;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points + SQL registration. */
object VectorFunctions {

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2Distance(a: Column, b: Column): Column =
    ExpressionUtils.column(L2Distance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `cosine_sim` / `l2_dist` for `spark.sql(...)` use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_dist", es => L2Distance(es.head, es(1)), "built-in")
  }
}
