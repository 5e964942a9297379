package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The VARIANT charset regression q212's gate found: Spark's variant
  * builder converts through the JVM DEFAULT charset, so under the
  * container's C/ASCII locale every non-ASCII byte decoded to U+FFFD
  * (from_json / get_json_object use explicit UTF-8 and were immune).
  * build.sbt pins -Dfile.encoding=UTF-8 for every forked JVM; this spec
  * holds the fix — if the pin is ever dropped, the é below shreds into
  * two replacement chars and both asserts fire.
  */
class VariantCharsetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("non-ASCII survives JSON -> VARIANT -> typed extraction") {
    assert(java.nio.charset.Charset.defaultCharset().name() == "UTF-8",
      "forked JVMs must pin -Dfile.encoding=UTF-8 (see build.sbt)")
    import spark.implicits._
    val out = Seq("""{"m":"café 日本"}""").toDF("j")
      .select(
        expr("variant_get(parse_json(j), '$.m', 'string')").as("vg"),
        expr("to_json(parse_json(j))").as("rt"))
      .collect()(0)
    assert(out.getString(0) == "café 日本", out.getString(0))
    assert(!out.getString(1).contains("�"), out.getString(1))
  }
}
