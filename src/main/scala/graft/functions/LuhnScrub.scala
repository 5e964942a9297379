package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `luhn_scrub(text)` — checksum-validated credit-card detection +
  * redaction as ONE native codegen'd pass (round-11 verdict #6: q112's
  * regex detectors prove the scrub shape, but a card number is a
  * pattern a regex alone cannot express — candidate digit runs must
  * pass the Luhn mod-10 check before they may be redacted, or the
  * scrub both misses nothing-burgers and mangles order numbers).
  *
  * Semantics, deliberately regex-free and single-pass:
  *  - a CANDIDATE is a maximal ASCII digit run of length exactly 16
  *    (the dominant PAN length; maximality means a 17-digit run is NOT
  *    a candidate — it cannot be a spaced-out card);
  *  - a candidate whose digits satisfy the Luhn checksum (double every
  *    second digit from the right, subtract 9 above 9, sum % 10 == 0)
  *    is a CARD: replaced by `<CARD>` in the output text;
  *  - failing candidates pass through untouched.
  *
  * Returns `struct(n_candidates int, n_cards int, redacted string)` —
  * detector telemetry and the scrubbed text from one scan. Like
  * [[WordShingles]], `doGenCode` emits a single static call so the
  * expression stays inside whole-stage codegen; at 100 TB this is a
  * pure map-side projection with no exchange, the q112 scrub shape
  * with a validator a regex engine cannot run.
  */
case class LuhnScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LuhnScrub.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"luhn_scrub expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    LuhnScrub.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LuhnScrub.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LuhnScrub {

  val schema: StructType = StructType(Seq(
    StructField("n_candidates", IntegerType, nullable = false),
    StructField("n_cards", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  /** The Luhn mod-10 check over `s[from, until)` (ASCII digits only —
    * the caller guarantees it): double every second digit from the
    * RIGHT, subtract 9 when doubling overflows a digit, valid iff the
    * sum is divisible by 10.
    */
  private[functions] def luhnValid(s: String, from: Int, until: Int): Boolean = {
    var sum = 0
    var pos = 0
    var k = until - 1
    while (k >= from) {
      var d = s.charAt(k) - '0'
      if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      pos += 1
      k -= 1
    }
    sum % 10 == 0
  }

  /** Static entry point shared by eval and generated code: one scan,
    * counting candidates/cards and building the redacted text.
    */
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var nCandidates = 0
    var nCards = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        if (j - i == 16) {
          nCandidates += 1
          if (luhnValid(s, i, j)) {
            nCards += 1
            sb.append("<CARD>")
          } else sb.append(s, i, j)
        } else sb.append(s, i, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](nCandidates, nCards,
      UTF8String.fromString(sb.toString)))
  }

  def luhnScrub(c: Column): Column =
    ExpressionUtils.column(LuhnScrub(ExpressionUtils.expression(c)))
}
