package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** `interval_overlap(s1, e1, s2, e2)` — the strict interval-overlap
  * predicate `s1 < e2 AND s2 < e1`, as ONE recognizable expression.
  *
  * Semantically it is just that conjunction (same null behavior:
  * three-valued AND over the two comparisons), and it evaluates fine
  * anywhere. Its reason to exist is the JOIN path:
  * [[graft.plans.IntervalOverlapJoinRewrite]] treats it as the
  * EXPLICIT marker that a join condition is an interval join — the
  * crisscross auto-detection must refuse ambiguous conditions (two
  * LessThan pairs can produce a catastrophic mis-pairing: tiling
  * user-id against a millisecond column explodes millions of tiles
  * per row), but the marker names the four roles outright, the way
  * Databricks' RANGE_JOIN hint does — except as a first-class
  * predicate that keeps working (just slower) when the rule is not
  * installed. The rewrite replaces the marker with the plain
  * comparisons, so the optimized plan stays whole-stage-codegen'd;
  * the `CodegenFallback` here only ever runs in un-rewritten plans.
  */
case class IntervalOverlap(s1: Expression, e1: Expression,
    s2: Expression, e2: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(s1, e1, s2, e2)

  override def dataType: DataType = BooleanType

  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "interval_overlap expects four BIGINT (epoch-ms) arguments")

  /** Exactly `(s1 < e2) AND (s2 < e1)` with SQL three-valued logic. */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    def lt(a: Expression, b: Expression): Any = {
      val x = a.eval(input); val y = b.eval(input)
      if (x == null || y == null) null
      else java.lang.Boolean.valueOf(
        x.asInstanceOf[Long] < y.asInstanceOf[Long])
    }
    val p = lt(s1, e2); val q = lt(s2, e1)
    (p, q) match {
      case (java.lang.Boolean.FALSE, _) => false
      case (_, java.lang.Boolean.FALSE) => false
      case (null, _) | (_, null) => null
      case _ => true
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(s1 = newChildren(0), e1 = newChildren(1),
      s2 = newChildren(2), e2 = newChildren(3))
}

object IntervalOverlap {
  /** Column form: `intervalOverlap($"s1", $"e1", $"s2", $"e2")`. */
  def intervalOverlap(s1: Column, e1: Column, s2: Column, e2: Column)
      : Column =
    ExpressionUtils.column(IntervalOverlap(
      ExpressionUtils.expression(s1), ExpressionUtils.expression(e1),
      ExpressionUtils.expression(s2), ExpressionUtils.expression(e2)))
}
