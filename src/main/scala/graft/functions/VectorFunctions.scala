package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` / `array<double>` columns,
  * built from Spark's higher-order functions (`zip_with`, `aggregate`) —
  * codegen'd, null-safe, and identical in evaluation order to a sequential
  * loop, which keeps results bit-stable across engines.
  */
object VectorFunctions {

  /** Cast to array<double> first: all arithmetic in f64 so results are
    * deterministic and match any oracle computing in doubles. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  // r15: dot / l2 / quantize run as native codegen kernels (VecKernels) —
  // the composed aggregate(zip_with(...)) / transform(...) forms are
  // CodegenFallback and paid an interpreted tree walk per vector element
  // (per centroid per row on the k-means/ANN paths). Same sequential IEEE
  // fold, bit-identical results incl. null/length-mismatch/NaN semantics
  // (pinned by VecKernelsSpec).
  private def bridge = org.apache.spark.sql.graft.ColumnBridge
  def dot(a: Column, b: Column): Column =
    bridge.fromExpr(DotExpr(
      bridge.toExpr(asDouble(a)), bridge.toExpr(asDouble(b))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(bridge.fromExpr(SqDiffSumExpr(
      bridge.toExpr(asDouble(a)), bridge.toExpr(asDouble(b)))))

  /** Quantize every coordinate to integer micro-units —
    * `floor(x·1e6 + 0.5)`, the halfway-mode-safe spelling shared with
    * [[graft.pipeline.Similarity]]'s scalar quantizer — kept as exact
    * doubles. Dots and squared norms of the result are sums of exact
    * integers (each |q| ≤ ~1e6·|x|, so products and partial sums stay far
    * under 2^53), which makes them independent of accumulation order:
    * a sequential JVM fold and a pairwise/SIMD engine produce the SAME
    * bits, and a cosine built from them is one IEEE divide of identical
    * operands on every engine. Quantize-before-dot is the only
    * engine-proof discipline — quantizing a raw-double cosine AFTER the
    * dot still inherits the dot's 1-ulp cross-engine wobble at a
    * .5-micro boundary. */
  def microVec(v: Column): Column =
    // floor() yields bigint; the cast back to double is exact (< 2^53)
    // and keeps every consumer on one array element type
    bridge.fromExpr(QuantizeExpr(bridge.toExpr(asDouble(v)), asLong = false))
}
