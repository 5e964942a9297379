package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_shingles(text[, n])` — whitespace-tokenize and emit the n-word
  * shingle array (default 3; q55 uses n=2 for bigrams) in ONE pass, as a
  * native expression. The SQL registration exposes the 1-arg n=3 form.
  *
  * This is the hot leading edge of every dedup query (q31/q32/q34/q53).
  * The built-in compositions all pay something extra:
  *  - nested array lambdas: interpreted, tokenizer re-inlined per element
  *    (~40× — see shingleRows history);
  *  - posexplode + window lead: shuffles the whole token stream;
  *  - zip-of-slices: shuffle-free but projection collapse re-inlines the
  *    tokenizer into each of the three `slice` children (3× tokenize +
  *    three array copies + a zip).
  * Here the split runs once and shingles assemble directly; `doGenCode`
  * emits a single static call, so the expression stays inside the
  * whole-stage-codegen pipeline (no eval fallback).
  *
  * Token semantics match the oracle convention exactly: Java regex
  * `\s+` split with empties dropped (= `list_filter(string_split_regex
  * (text,'\s+'), x -> length(x)>0)` in DuckDB).
  */
case class WordShingles(child: Expression, n: Int = 3)
    extends UnaryExpression {

  require(n >= 1, "word_shingles needs n >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `char_trigrams(text)` — all overlapping 3-character windows (code
  * points, matching SQL `substring` semantics on both engines) in one
  * pass. q39's round-1 formulation, `explode(sequence(1, length-2))` +
  * `substring(txt, i, 3)`, forces the Generate operator to copy the FULL
  * document text onto every exploded row — ~n_chars× row-width
  * amplification between Generate and the projection. Emitting the
  * trigram array directly keeps the per-row payload at 3 characters.
  */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_trigrams expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharTrigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharTrigrams.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharTrigrams {

  /** Code-point-aware sliding window (a surrogate pair is ONE character,
    * as in `substring`).
    */
  def compute(text: UTF8String): ArrayData = {
    val s = text.toString
    // char offsets of each code-point boundary
    val bounds = new java.util.ArrayList[Integer](s.length + 1)
    var off = 0
    while (off < s.length) {
      bounds.add(off)
      off += Character.charCount(s.codePointAt(off))
    }
    bounds.add(s.length)
    val nCp = bounds.size - 1
    if (nCp < 3) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](nCp - 2)
      var i = 0
      while (i < nCp - 2) {
        out(i) = UTF8String.fromString(s.substring(bounds.get(i), bounds.get(i + 3)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def charTrigrams(c: Column): Column =
    ExpressionUtils.column(CharTrigrams(ExpressionUtils.expression(c)))
}

object WordShingles {

  private val Whitespace = Pattern.compile("\\s+")

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val raw = Whitespace.split(text.toString)
    // leading whitespace yields one leading empty token; drop it (Java
    // split already drops trailing empties at limit 0)
    val toks = if (raw.nonEmpty && raw(0).isEmpty) raw.drop(1) else raw
    val count = toks.length - n + 1
    if (count <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        // exact presize: token lengths + (n-1) separators — this loop
        // runs once per shingle per document corpus-wide, so a default
        // 16-char buffer would reallocate on nearly every shingle
        var cap = n - 1
        var j = 0
        while (j < n) { cap += toks(i + j).length; j += 1 }
        val sb = new java.lang.StringBuilder(cap)
        j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def wordShingles(c: Column, n: Int = 3): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(c), n))
}
