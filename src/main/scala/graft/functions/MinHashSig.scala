package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature kernel (r16 — the round's headline target):
  * all `numPerms` permutation minima of a document's distinct word-n-gram
  * hashes, computed in ONE codegen'd pass per document.
  *
  * Replaces the exploded formulation in
  * [[graft.pipeline.DocDedup.signatures]] —
  * `explode(shingles) → pmod(hash60(s), p) → groupBy(id).agg(32 × min(pmod
  * (h·a+b, p)))` — which paid, per SHINGLE row, a hash-aggregate probe
  * plus 32 expression-tree min-updates through UnsafeRow state, and then
  * one full Exchange of the signature partials. The kernel runs the
  * identical integer arithmetic in a register loop, and because the
  * output is per-ROW, the signature frame needs NO shuffle at all — one
  * fewer Exchange in every MinHash/LSH query at any scale.
  *
  * EXACT-EQUIVALENCE CONTRACT (pinned by `MinHashSigSpec`):
  *  - identical arithmetic: h = hash60(shingle) mod prime (hash60 ≥ 0, so
  *    pmod = %), then min over shingles of (h·a_j + b_j) mod prime — all
  *    exact in 64-bit (h·a < 2^62, +b < 2^63: the MinHashParams 31-bit
  *    prime guarantee);
  *  - identical inputs: the same distinct-shingle array
  *    ([[Shingles.eval]], the pinned twin of `TextFunctions.shingles`);
  *  - identical empty/null convention: a doc with no shingles (null/short
  *    text) yields a NULL signature array — the twin of explode_outer's
  *    all-null aggregated row (band keys then skip the nulls in
  *    concat_ws, exactly as before).
  *
  * PRECONDITION (like the composed form's groupBy(id), stated rather than
  * implied): callers feed one row per document id. With duplicate ids the
  * old form merged the duplicates' shingle sets into one signature, while
  * this per-row kernel signs each row separately — every engine caller
  * (documents / batch corpora) has unique ids. */
object MinHashSig {
  /** abs = flat [a0, b0, a1, b1, ...]; mins returned boxed for
    * GenericArrayData. */
  def sig(text: UTF8String, n: Int, abs: Array[Long], prime: Long): ArrayData = {
    val grams = Shingles.eval(text, n, distinct = true)
    val m = grams.numElements()
    if (m == 0) return null
    val numPerms = abs.length / 2
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = Hash60.hash60(grams.getUTF8String(i)) % prime
      var j = 0
      while (j < numPerms) {
        val v = (h * abs(2 * j) + abs(2 * j + 1)) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](numPerms)
    var k = 0
    while (k < numPerms) { out(k) = java.lang.Long.valueOf(mins(k)); k += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen'd MinHash signature (see [[MinHashSig.sig]]). Null text or a
  * shingle-less document yields NULL (whole-array), the twin of the
  * exploded form's all-null aggregate row. */
case class MinHashSigExpr(child: Expression, n: Int, abs: Seq[(Long, Long)],
    prime: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val flatAbs: Array[Long] =
    abs.flatMap { case (a, b) => Seq(a, b) }.toArray

  def run(text: UTF8String): ArrayData =
    if (text == null) null else MinHashSig.sig(text, n, flatAbs, prime)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    run(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this,
      classOf[MinHashSigExpr].getName)
    val c = child.genCode(ctx)
    val res = ctx.freshName("mhSig")
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $res =
          $ref.run(${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = ($res == null);
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $res;
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
