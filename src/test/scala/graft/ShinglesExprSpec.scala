package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Equivalence pin for the r15 native [[graft.functions.ShinglesExpr]]:
  * element-for-element identity against the composed higher-order-function
  * formulation it replaced (the pre-r15 `TextFunctions.shingles`/`ngrams`
  * bodies, reconstructed verbatim here), over an adversarial string matrix
  * and the real sf0.01 documents corpus. The dedup/corpus oracle queries
  * hash their results, so ANY divergence — order, distinctness, empty/null
  * conventions, unicode lowering, whitespace classes — is a correctness
  * regression, not a performance detail.
  */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  // the pre-r15 composed formulation, kept bit-for-bit (see the r14 file
  // history of TextFunctions.scala)
  private def oldTokens(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")
  private def oldShingles(text: Column, n: Int): Column =
    element_at(
      transform(array(oldTokens(text)), tk =>
        when(size(tk) >= n,
          array_distinct(filter(
            transform(sequence(lit(0), size(tk) - n),
              i => array_join(slice(tk, i + 1, lit(n)), " ")),
            s => length(s) > 0)))
          .otherwise(lit(Array.empty[String]))),
      1)
  private def oldNgrams(text: Column, n: Int): Column =
    element_at(
      transform(array(oldTokens(text)), tk =>
        when(size(tk) >= n,
          filter(
            transform(sequence(lit(0), size(tk) - n),
              i => array_join(slice(tk, i + 1, lit(n)), " ")),
            s => length(s) > 0))
          .otherwise(lit(Array.empty[String]))),
      1)

  private val tricky: Seq[String] = Seq(
    null,
    "",
    " ",
    "\t",
    "  \t \n ",
    "one",
    "one two",
    "one two three",
    "one two three four five",
    "One TWO Three",
    "a  b   c\td\ne",                    // collapsing runs of mixed whitespace
    "\tleading tab stays a token boundary",
    "trailing space ",
    " leading space",
    "dup dup dup dup",                   // distinct vs multiplicity
    "x y x y x y",                       // repeated bigrams
    "ÅNGSTRÖM Straße İstanbul ǅungla",   // unicode lowering incl. special casing
    "emoji 🦀 mixed 🦀 tokens",
    "punct,uation! kept? as-is",
    "a b c d",                      // NBSP is NOT \s — stays inside a token
    "ends with newline\n",
    "\u000bvertical\u000ctab\rforms",
    "ss ß SS ẞ",                         // sharp s lowering
    "word " * 60)                        // long doc

  private def check(n: Int): Unit = {
    val df = tricky.toDF("text")
    val both = df.select(
      TextFunctions.shingles(col("text"), n).as("new_sh"),
      oldShingles(col("text"), n).as("old_sh"),
      TextFunctions.ngrams(col("text"), n).as("new_ng"),
      oldNgrams(col("text"), n).as("old_ng"),
      col("text"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"shingles($n) diverged for ${Option(r.getString(4))}")
      assert(r.getSeq[String](2) == r.getSeq[String](3),
        s"ngrams($n) diverged for ${Option(r.getString(4))}")
    }
  }

  test("native shingles/ngrams == composed form on the adversarial matrix") {
    Seq(1, 2, 3, 5).foreach(check)
  }

  test("native shingles/ngrams == composed form on the sf0.01 corpus") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    Seq(2, 3).foreach { n =>
      val diff = docs.select(
        TextFunctions.shingles(col("text"), n).as("a"),
        oldShingles(col("text"), n).as("b"),
        TextFunctions.ngrams(col("text"), n).as("c"),
        oldNgrams(col("text"), n).as("d"))
        .filter(col("a") =!= col("b") || col("c") =!= col("d"))
        .count()
      assert(diff == 0L, s"n=$n: $diff corpus rows diverged")
    }
  }

  test("interpreted eval path matches codegen path") {
    // force the interpreted path the way Catalyst does for non-codegen
    // contexts: direct Expression.eval
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = graft.functions.ShinglesExpr(
      Literal(UTF8String.fromString("A b  c\td"),
        org.apache.spark.sql.types.StringType), 2, distinct = true)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got == Seq("a b", "b c", "c d"))
  }
}
