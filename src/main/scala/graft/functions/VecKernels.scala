package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the embedding-vector hot path (r15).
  *
  * The prior formulations composed Spark higher-order functions
  * (`aggregate(zip_with(...))` for dots, `transform(...)` for
  * quantization) — HOFs are CodegenFallback, so every vector element paid
  * an interpreted expression-tree walk with boxing, once per centroid per
  * row on the k-means/ANN paths. These kernels run the identical
  * sequential IEEE fold in one codegen'd loop.
  *
  * EXACT-EQUIVALENCE CONTRACT (pinned by `VecKernelsSpec`): results are
  * bit-identical to the composed forms, including the sequential
  * accumulation order ((((0+x0)+x1)+…), the null conventions (null array
  * → null; any null element → null; length mismatch → null, because
  * zip_with pads with null), and NaN/Inf propagation.
  */
object VecKernels {
  /** dot(a, b) with aggregate(zip_with(a, b, _*_), 0.0, _+_) semantics. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val la = a.numElements()
    val lb = b.numElements()
    if (la != lb) return null // zip_with pads the short side with null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** l2²-fold: aggregate(zip_with(a, b, (x,y)=>(x-y)*(x-y)), 0.0, _+_).
    * (The caller applies sqrt, matching the composed l2Distance.) */
  def sqDiffSum(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return null
    val la = a.numElements()
    val lb = b.numElements()
    if (la != lb) return null
    var acc = 0.0
    var i = 0
    while (i < la) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** transform(v, x => floor(x·1e6 + 0.5)) — element type selected by
    * `asLong` (Clustering.quantize emits longs, microVec exact doubles).
    * Null elements stay null, like the transform lambda. */
  def quantize(v: ArrayData, asLong: Boolean): ArrayData = {
    if (v == null) return null
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    if (asLong) {
      while (i < n) {
        if (!v.isNullAt(i))
          out(i) = java.lang.Long.valueOf(
            Math.floor(v.getDouble(i) * 1e6 + 0.5).toLong)
        i += 1
      }
    } else {
      while (i < n) {
        if (!v.isNullAt(i))
          out(i) = java.lang.Double.valueOf(
            Math.floor(v.getDouble(i) * 1e6 + 0.5).toLong.toDouble)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash over the distinct whitespace tokens of normalized
    * text — the [[graft.pipeline.DocDedup.simHash]] semantics (bit j set
    * iff Σ over distinct tokens of ±1 by bit j of hash60(token) is > 0),
    * computed in one pass instead of a 60-wide interpreted zip_with per
    * token. Null text → null, matching the composed form. */
  def simHash(text: UTF8String, bits: Int): java.lang.Long = {
    if (text == null) return null
    val toks = Shingles.normalizeTokens(text)
    val seen = new java.util.HashSet[String](Math.min(toks.length * 2, 1 << 16))
    val sums = new Array[Int](bits)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = Hash60.hash60(UTF8String.fromString(toks(i)))
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) != 0L) sums(b) += 1 else sums(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0) sig |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** Codegen'd exact dot product (see [[VecKernels.dot]]). Children must
  * already be array<double> (the Column builder casts). */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val r = VecKernels.dot(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("dotRes")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        java.lang.Double $boxed = graft.functions.VecKernels.dot(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = ($boxed == null);
        double ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Codegen'd Σ(a_i − b_i)² (see [[VecKernels.sqDiffSum]]). */
case class SqDiffSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val r = VecKernels.sqDiffSum(left.eval(input).asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("sqdRes")
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        java.lang.Double $boxed = graft.functions.VecKernels.sqDiffSum(
          ${l.isNull} ? null : ${l.value}, ${r.isNull} ? null : ${r.value});
        boolean ${ev.isNull} = ($boxed == null);
        double ${ev.value} = ${ev.isNull} ? -1.0 : $boxed.doubleValue();
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_sqdiff_sum"
}

/** Codegen'd micro-quantization (see [[VecKernels.quantize]]). */
case class QuantizeExpr(child: Expression, asLong: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(if (asLong) LongType else DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    VecKernels.quantize(input.asInstanceOf[ArrayData], asLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.quantize($c, $asLong)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "micro_quantize"
}

/** Codegen'd SimHash signature (see [[VecKernels.simHash]]). */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    VecKernels.simHash(input.asInstanceOf[UTF8String], bits).longValue()

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VecKernels.simHash($c, $bits).longValue()")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}
