package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion
  * (org.apache.spark.sql.classic.ExpressionUtils, columnNodeSupport.scala).
  * Spark 4 moved classic Column internals behind ColumnNode; placing this
  * object under `org.apache.spark.sql` is the standard pattern third-party
  * Catalyst extensions use to lift a custom `Expression` into the public
  * Column DSL.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
