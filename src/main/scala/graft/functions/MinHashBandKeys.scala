package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_band_keys(text)` — the ENTIRE MinHash+LSH signature pipeline
  * for one document as a single map-side expression: 3-word shingles →
  * 60-bit md5 base hash per shingle → P permutation minima → `Bands`
  * band keys (md5 of each band's comma-joined minima). Output is an
  * array of `Bands` hex strings; the array position IS the band index.
  * A document with fewer than 3 tokens has no shingles and yields an
  * EMPTY array (the batch pipeline drops such docs before signing —
  * same semantics).
  *
  * Why it exists: the batch shape (q31/q32 — explode shingles, groupBy
  * doc with P min() aggregates) relies on a mid-query aggregation, which
  * a STREAM cannot run before a second stateful operator without
  * chaining stateful stages. Per-row banding makes LSH available to
  * Structured Streaming ([[graft.streaming.StreamingNearDup]]) and to
  * any map-only context (a delta shard signed at ingest, q64's
  * signature store). Built-in HOF compositions were rejected for the
  * usual reason (see WordShingles): lambda transforms fall out of
  * codegen and projection collapse re-inlines the shingle+md5 chain into
  * every one of the P minima. Here `doGenCode` is one static call.
  *
  * THE ARITHMETIC IS THE PARITY CONTRACT: base hash = first 15 hex
  * digits of md5 (60 bits, high nibble first) mod p; permutation i is
  * `(hashA(i)·h + hashB(i)) mod p` with p = 1e9+7 (products stay under
  * 2⁶³). These constants are THE definition — the batch pipeline
  * (DedupTextQueries) and its DuckDB oracles alias them, and
  * MinHashBandKeysSpec pins per-row output equal to the batch band
  * frame row-for-row, so the two paths cannot drift apart.
  */
case class MinHashBandKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_band_keys expects a string column, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    MinHashBandKeys.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBandKeys.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandKeys {

  /** MinHash permutations. */
  val P = 16

  /** LSH bands (rows per band = P / Bands = 4). */
  val Bands = 4

  /** Permutation modulus: 1e9+7 keeps `hashA·h` overflow-free in a Long. */
  val Mod = 1000000007L

  def hashA(i: Int): Long = (1103515245L * (i + 1)) % Mod
  def hashB(i: Int): Long = 12345L * (i + 1) + 1

  private val As = Array.tabulate(P)(hashA)
  private val Bs = Array.tabulate(P)(hashB)

  /** Static entry point shared by eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val shingles = WordShingles.compute(text, 3)
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val sig = Array.fill(P)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val digest = md.digest(shingles.getUTF8String(i).getBytes)
      md.reset()
      // first 15 hex digits = 7 bytes + the high nibble of byte 7,
      // most-significant first — exactly conv(substr(md5(s),1,15),16,10)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
      h = ((h << 4) | ((digest(7) & 0xf0L) >> 4)) % Mod
      var p = 0
      while (p < P) {
        val v = (As(p) * h + Bs(p)) % Mod
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    val rows = P / Bands
    val out = new Array[Any](Bands)
    var bd = 0
    while (bd < Bands) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < rows) {
        if (j > 0) sb.append(',')
        sb.append(sig(bd * rows + j))
        j += 1
      }
      val dg = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      md.reset()
      val hex = new java.lang.StringBuilder(32)
      var k = 0
      while (k < 16) {
        hex.append(Character.forDigit((dg(k) & 0xf0) >> 4, 16))
        hex.append(Character.forDigit(dg(k) & 0x0f, 16))
        k += 1
      }
      out(bd) = UTF8String.fromString(hex.toString)
      bd += 1
    }
    new GenericArrayData(out)
  }

  def bandKeys(c: Column): Column =
    ExpressionUtils.column(MinHashBandKeys(ExpressionUtils.expression(c)))
}
