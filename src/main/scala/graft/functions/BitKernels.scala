package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native kernels for the binary (sign-bit) embedding path (r16).
  *
  * The composed forms — `transform(sequence(...), w =>
  * aggregate(zip_with(slice(v, w·32+1, 32), powers, ...), 0L, OR))` for
  * packing and `aggregate(zip_with(bits, q_bits, bit_count(xor)), 0, +)`
  * for the distance — are CodegenFallback higher-order functions: every
  * vector ELEMENT (packing) and every WORD PER PAIR (Hamming, on the
  * queries × corpus scan) paid an interpreted tree walk. These kernels
  * run the identical bit math in one codegen'd loop.
  *
  * EXACT-EQUIVALENCE CONTRACT (pinned by `BitKernelsSpec`): bit-identical
  * to the composed forms, including the conventions — sign-pack: bit j of
  * word w set iff `x[32w+j] >= 0` under SPARK's comparison semantics
  * (null contributes no bit; `-0.0` AND NaN do — Spark orders NaN above
  * every value), null/empty vector → empty array; hamming: null if
  * either side is null, any element is null, or lengths differ (zip_with
  * pads the short side with null, and null propagates through the sum). */
object BitKernels {
  private val emptyArr = new GenericArrayData(Array.empty[Any])

  /** Pack sign bits, 32 dims per long word ([[graft.pipeline.Similarity.binarySign]]). */
  def signPack(v: ArrayData): ArrayData = {
    if (v == null) return emptyArr
    val n = v.numElements()
    if (n == 0) return emptyArr
    val nWords = (n + 31) / 32
    val out = new Array[Any](nWords)
    var w = 0
    while (w < nWords) {
      var bits = 0L
      val base = w * 32
      var j = 0
      while (j < 32 && base + j < n) {
        if (!v.isNullAt(base + j)) {
          val x = v.getDouble(base + j)
          // Spark's comparison semantics order NaN above every value, so
          // the composed `x >= 0` is TRUE for NaN (unlike Java's >=)
          if (x >= 0.0 || java.lang.Double.isNaN(x)) bits |= (1L << j)
        }
        j += 1
      }
      out(w) = java.lang.Long.valueOf(bits)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Σ popcount(a_i xor b_i) ([[graft.pipeline.Similarity.hammingTopK]]). */
  def hamming(a: ArrayData, b: ArrayData): java.lang.Integer = {
    if (a == null || b == null) return null
    val la = a.numElements()
    if (la != b.numElements()) return null // zip_with pads with null
    var acc = 0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }
}

/** Codegen'd sign-bit packing (see [[BitKernels.signPack]]). Never null:
  * null input maps to an empty array, matching the composed `when` guard
  * (`size(null) > 0` is null → otherwise-branch). Child must already be
  * array<double> (the Column builder casts). */
case class SignPackExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    BitKernels.signPack(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.BitKernels.signPack(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "sign_pack"
}

/** Codegen'd Hamming distance over packed words (see
  * [[BitKernels.hamming]]). */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val r = BitKernels.hamming(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("hammRes")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        java.lang.Integer $boxed = graft.functions.BitKernels.hamming(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = ($boxed == null);
        int ${ev.value} = ${ev.isNull} ? -1 : $boxed.intValue();
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_dist"
}
