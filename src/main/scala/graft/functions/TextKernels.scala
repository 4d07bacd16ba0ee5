package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the per-document text-statistics hot paths (r16).
  *
  * The prior formulations composed Spark higher-order functions —
  * `aggregate(sort_array(split(text, "")), ...)` for character entropy,
  * `aggregate(sort_array(tokens), ...)` for the top-token run,
  * `filter(tokens, isInCollection)` / `aggregate(tokens, zip_with(...))`
  * for the word-list scores. HOFs are CodegenFallback, so every CHARACTER
  * (entropy) or TOKEN (scores) paid an interpreted expression-tree walk
  * with struct boxing. These kernels do the same work in one codegen'd
  * native pass per document.
  *
  * EXACT-EQUIVALENCE CONTRACT (pinned by `TextKernelsSpec`): outputs are
  * bit-identical to the composed forms. Where a float op remains (the
  * top-token division), the kernel performs the IDENTICAL single IEEE op;
  * the entropy kernels return only the RUN LENGTHS and leave every float/
  * integer log2/round/floor op to the same Spark expressions as before,
  * so no libm/rounding behavior is re-implemented. Tokenization reuses
  * [[Shingles.normalizeTokens]], the already-pinned twin of
  * `split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")`.
  */
object TextKernels {
  private val oneRun = new GenericArrayData(Array[Any](java.lang.Long.valueOf(1L)))

  /** Run lengths of `sort_array(split(text, ""))`, in sorted order.
    *
    * Spark's `split(text, "")` (UTF8String.split, verified against the
    * shipped jars) yields one element per CODEPOINT — surrogate pairs stay
    * together, there is NO trailing empty element (unlike
    * java.lang.String#split), and the empty string yields `[""]`.
    * `sort_array` compares strings as UTF-8 bytes, which for single
    * codepoints is exactly ascending codepoint order (the empty string,
    * when present, sorts first — it only occurs alone). So the run
    * lengths of the sorted array are the per-codepoint occurrence counts
    * in ascending codepoint order, computed here by sort + RLE. */
  def charRuns(text: UTF8String): ArrayData = {
    val s = text.toString
    val sl = s.length
    if (sl == 0) return oneRun // split("", "") = [""]: one empty element
    val cps = new Array[Int](s.codePointCount(0, sl))
    var i = 0
    var k = 0
    while (i < sl) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    java.util.Arrays.sort(cps)
    var nRuns = 1
    i = 1
    while (i < cps.length) {
      if (cps(i) != cps(i - 1)) nRuns += 1
      i += 1
    }
    val out = new Array[Any](nRuns)
    var run = 1L
    var j = 0
    i = 1
    while (i < cps.length) {
      if (cps(i) == cps(i - 1)) run += 1
      else { out(j) = java.lang.Long.valueOf(run); j += 1; run = 1L }
      i += 1
    }
    out(j) = java.lang.Long.valueOf(run)
    new GenericArrayData(out)
  }

  /** Most-frequent-token count over total tokens —
    * [[TextFunctions.topTokenRatio]] semantics: the longest equal-token
    * run of the SORTED token array equals the max per-token multiplicity
    * (no sort needed for a max), and the composed form's one float op is
    * reproduced exactly (long→double cast, int→double cast, one IEEE
    * division). */
  def topTokenRatio(text: UTF8String): Double = {
    val toks = Shingles.normalizeTokens(text)
    val m = new java.util.HashMap[String, Int](Math.min(toks.length * 2, 1 << 16))
    var best = 0
    var i = 0
    while (i < toks.length) {
      val c = m.merge(toks(i), 1, Integer.sum)
      if (c > best) best = c
      i += 1
    }
    best.toLong.toDouble / Math.max(toks.length, 1).toDouble
  }

  /** Tokens containing at least one `[a-z]` character, over total tokens —
    * [[TextFunctions.alphaTokenFraction]] semantics (`rlike("[a-z]")` on
    * the already-lowercased tokens reduces to a char-range scan). */
  def alphaTokenFraction(text: UTF8String): Double = {
    val toks = Shingles.normalizeTokens(text)
    var cnt = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var j = 0
      var hit = false
      while (!hit && j < t.length) {
        val c = t.charAt(j)
        if (c >= 'a' && c <= 'z') hit = true
        j += 1
      }
      if (hit) cnt += 1
      i += 1
    }
    cnt.toDouble / Math.max(toks.length, 1).toDouble
  }
}

/** Codegen'd run-length encoding of the sorted character array (see
  * [[TextKernels.charRuns]]). Null text → null, like the composed
  * `sort_array(split(null, ""))` chain. */
case class CharRunsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextKernels.charRuns(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charRuns($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_runs"
}

/** Codegen'd top-token ratio (see [[TextKernels.topTokenRatio]]). */
case class TopTokenRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextKernels.topTokenRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.topTokenRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "top_token_ratio"
}

/** Codegen'd alpha-token fraction (see
  * [[TextKernels.alphaTokenFraction]]). */
case class AlphaTokenFractionExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextKernels.alphaTokenFraction(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.alphaTokenFraction($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "alpha_token_fraction"
}

/** Per-word-list token occurrence counts in ONE tokenize pass: element i
  * is the number of token occurrences contained in `lists(i)` (exactly
  * `size(filter(tokens(text), _.isInCollection(lists(i))))`); with
  * `withTotal` a trailing element carries the total token count. A token
  * may belong to several lists (each list counts it independently, like
  * the composed per-list filters). Null text → null. */
case class WordListCountsExpr(child: Expression, lists: Seq[Seq[String]],
    withTotal: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val lookup: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]
    lists.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  def count(text: UTF8String): ArrayData = {
    val toks = Shingles.normalizeTokens(text)
    val n = lists.size
    val counts = new Array[Int](if (withTotal) n + 1 else n)
    var i = 0
    while (i < toks.length) {
      val slots = lookup.get(toks(i))
      if (slots != null) {
        var j = 0
        while (j < slots.length) { counts(slots(j)) += 1; j += 1 }
      }
      i += 1
    }
    if (withTotal) counts(n) = toks.length
    val boxed = new Array[Any](counts.length)
    i = 0
    while (i < counts.length) { boxed(i) = java.lang.Integer.valueOf(counts(i)); i += 1 }
    new GenericArrayData(boxed)
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordListCounts", this,
      classOf[WordListCountsExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_list_counts"
}

/** Winnowing fingerprint set (see
  * [[graft.pipeline.DocDedup.winnowedFingerprints]]): hash60 of every
  * word-n-gram in document order, then the distinct (first-occurrence
  * order) minima of each sliding window of `w` hashes — computed with a
  * monotonic deque in one O(#ngrams) pass instead of the composed
  * `array_distinct(transform(sequence(...), i => array_min(slice(hs, i+1,
  * w))))`, whose interpreted window walk was O(#ngrams · w). Short docs
  * (0 < #ngrams < w) yield the single global min; empty/null docs yield
  * an empty array — the composed `when` chain's convention. */
case class WinnowFpExpr(child: Expression, n: Int, w: Int)
    extends UnaryExpression {
  require(w >= 1, "winnow window must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  def fps(text: UTF8String): ArrayData = {
    val grams = Shingles.eval(text, n, distinct = false)
    val len = grams.numElements()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) {
      hs(i) = Hash60.hash60(grams.getUTF8String(i))
      i += 1
    }
    if (len < w) {
      var mn = hs(0)
      i = 1
      while (i < len) { if (hs(i) < mn) mn = hs(i); i += 1 }
      return new GenericArrayData(Array[Any](java.lang.Long.valueOf(mn)))
    }
    // monotonic deque of indices: front = min of the current window
    val deque = new Array[Int](len)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    i = 0
    while (i < len) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(java.lang.Long.valueOf(hs(deque(head))))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    fps(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFp", this,
      classOf[WinnowFpExpr].getName)
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.fps(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}
