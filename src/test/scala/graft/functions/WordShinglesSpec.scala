package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.WordShingles.wordShingles

class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: String*): Seq[Seq[String]] =
    texts.toDF("text").select(wordShingles(col("text")).as("s"))
      .as[Seq[String]].collect().toSeq

  test("basic shingling, whitespace runs, leading/trailing space") {
    assert(run("a b c d") === Seq(Seq("a b c", "b c d")))
    assert(run("  a\t\tb \n c  ") === Seq(Seq("a b c")))
    assert(run("one two") === Seq(Seq.empty))
    assert(run("") === Seq(Seq.empty))
    assert(run("   ") === Seq(Seq.empty))
  }

  test("n parameter: bigrams (q55's path), unigrams, count boundary") {
    def runN(n: Int, texts: String*): Seq[Seq[String]] =
      texts.toDF("text").select(wordShingles(col("text"), n).as("s"))
        .as[Seq[String]].collect().toSeq
    assert(runN(2, "a b c") === Seq(Seq("a b", "b c")))
    assert(runN(2, "one two") === Seq(Seq("one two"))) // count = len-n+1 = 1
    assert(runN(2, "solo") === Seq(Seq.empty))
    assert(runN(1, "x y z") === Seq(Seq("x", "y", "z")))
    assert(runN(4, "a b c d e") === Seq(Seq("a b c d", "b c d e")))
  }

  test("matches the built-in split+filter composition on the real corpus") {
    def tokens(c: org.apache.spark.sql.Column) =
      filter(split(c, "\\s+"), x => length(x) > 0)
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val w = tokens(col("text"))
    val n = greatest(size(w) - 2, lit(0))
    val viaBuiltins = docs.select(col("doc_id"),
        arrays_zip(slice(w, lit(1), n).as("t0"), slice(w, lit(2), n).as("t1"),
          slice(w, lit(3), n).as("t2")).as("z"))
      .select(col("doc_id"),
        expr("transform(z, t -> concat(t.t0, ' ', t.t1, ' ', t.t2))").as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val viaExprMap = docs.select(col("doc_id"), wordShingles(col("text")).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaExprMap === viaBuiltins)
  }

  test("char_trigrams: code-point windows, unicode and short-input edges") {
    import graft.functions.CharTrigrams.charTrigrams
    def runT(texts: String*): Seq[Seq[String]] =
      texts.toDF("text").select(charTrigrams(col("text")).as("s"))
        .as[Seq[String]].collect().toSeq
    assert(runT("abcd") === Seq(Seq("abc", "bcd")))
    assert(runT("ab") === Seq(Seq.empty))
    assert(runT("") === Seq(Seq.empty))
    // é is one code point; the emoji is a surrogate pair but ONE character
    assert(runT("héllo") === Seq(Seq("hél", "éll", "llo")))
    assert(runT("a😀bc") === Seq(Seq("a😀b", "😀bc")))
  }

  test("char_trigrams matches the sequence+substring composition on the corpus") {
    import graft.functions.CharTrigrams.charTrigrams
    val docs = spark.read
      .parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("txt"))
    val viaBuiltins = docs.filter(length(col("txt")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("txt")) - 2)).as("i"), col("txt"))
      .select(col("doc_id"), expr("substring(txt, i, 3)").as("tri"))
      .groupBy("doc_id").agg(sort_array(collect_list("tri")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val viaExprT = docs
      .select(col("doc_id"), explode(charTrigrams(col("txt"))).as("tri"))
      .groupBy("doc_id").agg(sort_array(collect_list("tri")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(viaExprT === viaBuiltins)
  }

  test("stays inside whole-stage codegen (no eval fallback)") {
    val df = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(explode(wordShingles(col("text"))).as("s"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p.take(2000)) // codegen span marker
  }
}
