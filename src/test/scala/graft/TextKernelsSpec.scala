package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Equivalence pins for the r16 native text kernels
  * ([[graft.functions.CharRunsExpr]], [[graft.functions.TopTokenRatioExpr]],
  * [[graft.functions.AlphaTokenFractionExpr]],
  * [[graft.functions.WordListCountsExpr]], [[graft.functions.WinnowFpExpr]])
  * against the composed higher-order-function formulations they replaced
  * (the pre-r16 TextFunctions/DocDedup bodies, reconstructed verbatim
  * here), over an adversarial string matrix and the real sf0.01 corpus.
  * The text/corpus oracle queries hash their results, so ANY divergence —
  * float accumulation order, run boundaries, null conventions, token
  * membership — is a correctness regression, not a performance detail. */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------- pre-r16 composed forms, kept bit-for-bit

  private def oldTopTokenRatio(text: Column): Column =
    element_at(
      transform(array(TextFunctions.tokens(text)), tk => {
        val best = aggregate(sort_array(tk),
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
          (acc, t) => {
            val run = when(t === acc.getField("prev"),
              acc.getField("run") + 1L).otherwise(lit(1L))
            struct(t.as("prev"), run.as("run"),
              greatest(acc.getField("best"), run).as("best"))
          },
          acc => acc.getField("best"))
        best.cast("double") / greatest(size(tk), lit(1)).cast("double")
      }),
      1)

  private def oldCharEntropy(text: Column): Column = {
    def runTerm(r: Column): Column =
      when(r > 0L, r.cast("double") * log2(r.cast("double"))).otherwise(lit(0.0))
    val h = element_at(
      transform(array(sort_array(split(text, ""))), cs => {
        val s = aggregate(cs,
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("acc")),
          (st, c) => {
            val same = c === st.getField("prev")
            struct(c.as("prev"),
              when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
              when(same, st.getField("acc"))
                .otherwise(st.getField("acc") + runTerm(st.getField("run")))
                .as("acc"))
          },
          st => st.getField("acc") + runTerm(st.getField("run")))
        log2(size(cs).cast("double")) - s / size(cs).cast("double")
      }),
      1)
    when(length(text) > 0, h).otherwise(lit(0.0))
  }

  private def oldCharEntropyMb(text: Column): Column = {
    def qTerm(r: Column): Column =
      when(r > 0L, r * round(log2(r.cast("double")) * 1e6).cast("long"))
        .otherwise(lit(0L))
    val mb = element_at(
      transform(array(sort_array(split(text, ""))), cs => {
        val s = aggregate(cs,
          struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
          (st, c) => {
            val same = c === st.getField("prev")
            struct(c.as("prev"),
              when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
              when(same, st.getField("acc"))
                .otherwise(st.getField("acc") + qTerm(st.getField("run")))
                .as("acc"))
          },
          st => st.getField("acc") + qTerm(st.getField("run")))
        val n = size(cs).cast("long")
        floor((n * round(log2(n.cast("double")) * 1e6).cast("long") - s)
          .cast("double") / (n.cast("double") * lit(1000.0))).cast("long")
      }),
      1)
    when(length(text) > 0, mb).otherwise(lit(0L))
  }

  private def oldStopwordRatio(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    size(filter(toks, t => t.isInCollection(TextFunctions.enStopwords)))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  private def oldAlphaTokenFraction(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  private def oldGopherStopCount(text: Column): Column =
    size(filter(TextFunctions.tokens(text),
      t => t.isInCollection(TextFunctions.gopherStops)))

  private def oldLangId(text: Column): Column = {
    val langs = TextFunctions.langMarkers.toSeq.sortBy(_._1)
    val names = lit(langs.map(_._1).toArray)
    val scores = aggregate(TextFunctions.tokens(text),
      lit(Array.fill(langs.size)(0)),
      (acc, t) => zip_with(acc,
        array(langs.map { case (_, ws) =>
          when(t.isInCollection(ws), 1).otherwise(0) }: _*),
        (a, d) => a + d))
    val best = array_min(zip_with(scores, names,
      (s, l) => struct((-s).as("neg"), l.as("lang"))))
    when(best.getField("neg") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  private def oldWinnowFps(text: Column, n: Int, w: Int): Column = {
    val hs = transform(TextFunctions.ngrams(text, n),
      s => TextFunctions.hash60(s))
    element_at(transform(array(hs), h =>
      when(size(h) >= w,
        array_distinct(transform(sequence(lit(0), size(h) - w),
          i => array_min(slice(h, i + 1, lit(w))))))
        .otherwise(when(size(h) > 0, array(array_min(h)))
          .otherwise(array().cast("array<bigint>")))), 1)
  }

  private def newWinnowFps(text: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.WinnowFpExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(text), n, w))

  private val tricky: Seq[String] = Seq(
    null,
    "",
    " ",
    "\t",
    "  \t \n ",
    "one",
    "one two",
    "the and of to is in that it for with",  // all-stopword text
    "el la der die le les est und",           // mixed language markers
    "la la la la",                             // marker in two languages
    "One TWO Three",
    "a  b   c\td\ne",
    "dup dup dup dup",
    "x y x y x y",
    "ÅNGSTRÖM Straße İstanbul ǅungla",
    "emoji 🦀 mixed 🦀 tokens",               // non-BMP codepoints
    "punct,uation! kept? as-is",
    "a b c d",                            // NBSP inside tokens
    "ends with newline\n",
    "verticaltab\rforms",
    "ss ß SS ẞ",
    "0123 456 !!! ???",                        // no alpha tokens
    "aaaaaaaaaa",                              // single-char runs
    "abcdefghij",                              // all-distinct chars
    "word " * 60)

  test("charEntropy / charEntropyMb == composed form (matrix)") {
    val df = tricky.toDF("text")
    df.select(col("text"),
        TextFunctions.charEntropy(col("text")).as("nh"),
        oldCharEntropy(col("text")).as("oh"),
        TextFunctions.charEntropyMb(col("text")).as("nm"),
        oldCharEntropyMb(col("text")).as("om"))
      .collect().foreach { r =>
        // bit-exact double compare (java equals on the boxed values keeps
        // NaN == NaN and distinguishes ±0.0, exactly what a result hash sees)
        assert(r.get(1) == r.get(2), s"charEntropy diverged for ${Option(r.get(0))}: ${r.get(1)} vs ${r.get(2)}")
        assert(r.get(3) == r.get(4), s"charEntropyMb diverged for ${Option(r.get(0))}: ${r.get(3)} vs ${r.get(4)}")
      }
  }

  test("topTokenRatio / stopwordRatio / alphaTokenFraction / gopherStopCount / langId == composed forms (matrix)") {
    val df = tricky.toDF("text")
    df.select(col("text"),
        TextFunctions.topTokenRatio(col("text")).as("n1"),
        oldTopTokenRatio(col("text")).as("o1"),
        TextFunctions.stopwordRatio(col("text")).as("n2"),
        oldStopwordRatio(col("text")).as("o2"),
        TextFunctions.alphaTokenFraction(col("text")).as("n3"),
        oldAlphaTokenFraction(col("text")).as("o3"),
        TextFunctions.gopherStopCount(col("text")).as("n4"),
        oldGopherStopCount(col("text")).as("o4"),
        TextFunctions.langId(col("text")).as("n5"),
        oldLangId(col("text")).as("o5"))
      .collect().foreach { r =>
        (1 to 9 by 2).foreach { i =>
          assert(r.get(i) == r.get(i + 1),
            s"col $i diverged for ${Option(r.get(0))}: ${r.get(i)} vs ${r.get(i + 1)}")
        }
      }
  }

  test("winnow fingerprints == composed form (matrix)") {
    val df = tricky.toDF("text")
    Seq((2, 1), (2, 4), (3, 4), (6, 8)).foreach { case (n, w) =>
      df.select(col("text"),
          newWinnowFps(col("text"), n, w).as("nf"),
          oldWinnowFps(col("text"), n, w).as("of"))
        .collect().foreach { r =>
          assert(r.getSeq[Long](1) == r.getSeq[Long](2),
            s"winnow(n=$n,w=$w) diverged for ${Option(r.get(0))}")
        }
    }
  }

  test("all kernels == composed forms on the sf0.01 corpus") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val diff = docs.select(
        TextFunctions.charEntropy(col("text")).as("a1"),
        oldCharEntropy(col("text")).as("b1"),
        TextFunctions.charEntropyMb(col("text")).as("a2"),
        oldCharEntropyMb(col("text")).as("b2"),
        TextFunctions.topTokenRatio(col("text")).as("a3"),
        oldTopTokenRatio(col("text")).as("b3"),
        TextFunctions.stopwordRatio(col("text")).as("a4"),
        oldStopwordRatio(col("text")).as("b4"),
        TextFunctions.alphaTokenFraction(col("text")).as("a5"),
        oldAlphaTokenFraction(col("text")).as("b5"),
        TextFunctions.gopherStopCount(col("text")).as("a6"),
        oldGopherStopCount(col("text")).as("b6"),
        TextFunctions.langId(col("text")).as("a7"),
        oldLangId(col("text")).as("b7"),
        newWinnowFps(col("text"), 4, 4).as("a8"),
        oldWinnowFps(col("text"), 4, 4).as("b8"))
      // null-safe inequality: a plain =!= is null for (null, non-null)
      // pairs and the filter would silently drop exactly the divergence
      // it is supposed to catch
      .filter((1 to 8).map(i =>
        not(col(s"a$i") <=> col(s"b$i"))).reduce(_ || _))
      .count()
    assert(diff == 0L, s"$diff corpus rows diverged")
  }

  test("interpreted eval path matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val lit = Literal(UTF8String.fromString("the la banana banana"), StringType)
    val runs = graft.functions.CharRunsExpr(lit).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(runs.sum == 20L) // 20 codepoints
    val ttr = graft.functions.TopTokenRatioExpr(lit).eval(null)
    assert(ttr == 0.5) // banana x2 of 4 tokens
    val wlc = graft.functions.WordListCountsExpr(lit,
      Seq(Seq("the", "banana"), Seq("la")), withTotal = true).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
    assert(wlc == Seq(3, 1, 4))
  }
}
