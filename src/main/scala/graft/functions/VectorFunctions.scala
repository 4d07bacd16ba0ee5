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

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
