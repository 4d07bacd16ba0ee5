package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram computation — the single hottest per-row kernel of
  * the dedup/corpus families (every MinHash signature, inverted shingle
  * index, n-gram Jaccard, coverage and decontamination pass starts by
  * shingling the corpus).
  *
  * Replaces the composed higher-order-function form in
  * [[TextFunctions.shingles]]/[[TextFunctions.ngrams]]
  * (`transform(sequence(...), i => array_join(slice(tokens, ...)))`):
  * higher-order functions are CodegenFallback, so that form walks an
  * interpreted expression tree PER SHINGLE POSITION — measured at 7-12 s
  * of task time per corpus pass at sf0.1 warm, and ~80 s cold (the
  * interpreted tree is also what the JIT has to warm through). This
  * expression does one linear pass per document inside whole-stage
  * codegen.
  *
  * EXACT-EQUIVALENCE CONTRACT (pinned by `ShinglesExprSpec`): output is
  * element-for-element identical to the composed form, including token
  * order, first-occurrence distinct order, the empty-string filter, the
  * null→empty-array convention, and the normalization pipeline
  * `regexp_replace(lower(trim(text)), "\\s+", " ")` — reproduced with the
  * same UTF8String trim/toLowerCase kernels and the same java.util.regex
  * pattern Spark's own StringTrim/Lower/RegExpReplace use.
  */
object Shingles {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  private val emptyArr = new GenericArrayData(Array.empty[Any])

  /** The engine's token pipeline ([[TextFunctions.tokens]] semantics):
    * trim (ASCII spaces, like StringTrim) then lower (UTF8String kernel,
    * like Lower) then collapse runs of \s to one space (same pattern
    * semantics as RegExpReplace on the UTF-16 form), then split on " "
    * with limit -1 (Java regex split, trailing empties kept). */
  def normalizeTokens(text: UTF8String): Array[String] =
    ws.matcher(text.trim().toLowerCase().toString).replaceAll(" ")
      .split(" ", -1)

  /** n-gram array of the normalized text; `distinct` keeps the first
    * occurrence of each n-gram ([[TextFunctions.shingles]] semantics),
    * otherwise multiplicity is preserved ([[TextFunctions.ngrams]]).
    * Null text yields an EMPTY array (the composed form's convention). */
  def eval(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    if (text == null) return emptyArr
    val toks = normalizeTokens(text)
    if (toks.length < n) return emptyArr
    val m = toks.length - n + 1
    val sb = new java.lang.StringBuilder
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](Math.min(m, 1 << 16))
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        if (sb.length > 0) seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new java.util.ArrayList[Any](m)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}

/** Catalyst expression for [[Shingles.eval]]: interpreted eval plus
  * hand-rolled codegen calling the static helper — stays inside
  * whole-stage codegen spans (no UDF boundary). Never null: null input
  * maps to an empty array, matching the composed form. */
case class ShinglesExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    Shingles.eval(child.eval(input).asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.Shingles.eval(${c.isNull} ? null : ${c.value}, $n, $distinct);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = if (distinct) "shingles" else "word_ngrams"
}
