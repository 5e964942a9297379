package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** `NearestCentroid(vec)` — index of the closest centroid by squared L2,
  * ties to the smaller index. The coarse-quantizer assignment of IVF
  * (q45) and each Lloyd iteration of [[graft.ml.KMeans]].
  *
  * The centroid matrix travels as a CONSTRUCTOR value surfaced to
  * generated code through `ctx.addReferenceObj`, NOT as literal child
  * expressions: the k-literals formulation (`array_min(array(struct(
  * l2_dist(v, lit(c0)), 0), ...))`) makes the plan tree O(k·dim) — at
  * k=16/dim=64 the optimizer re-walks ~1k literal nodes per Lloyd
  * iteration, and at a production k (thousands of cells) planning simply
  * explodes. Here the plan holds ONE node regardless of k, and the
  * generated loop reads the matrix array directly.
  *
  * Contract: the matrix is non-empty with uniform dimensionality
  * (enforced at construction); a shorter input vector is scored over the
  * shared prefix (the caller owns the data contract that vectors match
  * the training dimensionality).
  */
case class NearestCentroid(child: Expression,
    centroids: Array[Array[Double]]) extends UnaryExpression {

  require(centroids.nonEmpty, "nearest_centroid needs at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "nearest_centroid centroids must share one dimensionality")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid expects array<float|double>, got ${other.sql}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val float = isFloat
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var dist = 0.0
      var i = 0
      val n = math.min(v.numElements(), c.length)
      while (i < n) {
        val x = if (float) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - c(i)
        dist += diff * diff
        i += 1
      }
      if (dist < bestD) { bestD = dist; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val getter = if (isFloat) "(double) %s.getFloat(i)" else "%s.getDouble(i)"
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |int best = 0;
         |double bestD = Double.MAX_VALUE;
         |for (int j = 0; j < $matRef.length; j++) {
         |  double[] c = $matRef[j];
         |  double dist = 0.0;
         |  int n = java.lang.Math.min($v.numElements(), c.length);
         |  for (int i = 0; i < n; i++) {
         |    double diff = ${getter.format(v)} - c[i];
         |    dist += diff * diff;
         |  }
         |  if (dist < bestD) { bestD = dist; best = j; }
         |}
         |${ev.value} = best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(vec), centroids))
}
