package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for Spark 4's Column API: the
  * Connect-era `Column` no longer exposes `.expr`, and the classic
  * converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * private[sql] — so this shim lives under the org.apache.spark.sql
  * package, the sanctioned extension-point pattern for libraries that
  * define custom Catalyst expressions. */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def fromExpr(e: Expression): Column = ExpressionUtils.column(e)

  /** EAGER Column -> catalyst conversion: [[toExpr]] wraps the node tree
    * in a lazy `ColumnNodeExpression` that only unwraps at DataFrame
    * analysis boundaries — embedded inside a SQL FunctionBuilder's output
    * it survives to codegen and throws (Unevaluable). This converts the
    * node tree to real (possibly unresolved) catalyst expressions
    * immediately, which the analyzer then resolves like any macro
    * expansion. */
  def toCatalyst(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on a LIVE session's function registry
    * (sessionState is private[sql]); the builder-time path for sessions
    * the library constructs itself is `GraftExtensions`. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** Exact integer division (SQL `div`). Spark's Column `/` is IEEE double
    * division, which is lossy for longs above 2^53 — ns-epoch timestamps
    * (~1.7e18) silently round. This builds the native IntegralDivide
    * expression, which divides in long arithmetic with full codegen. */
  def integralDivide(a: Column, b: Column): Column =
    fromExpr(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      toExpr(a), toExpr(b)))

  /** A single comparison conjunct `col OP literal` (or the literal-first
    * mirror) extracted from a Column, as (column, op, literal) with op in
    * `< <= > >= = ==`. None when the expression is anything richer —
    * callers treat that as "cannot analyze" and keep the chunk. Feeds
    * statistics-based chunk pruning (the reference's PruningPredicate
    * role over chunk-level min/max). */
  def extractComparison(c: Column): Option[(String, String, Any)] = {
    import org.apache.spark.sql.internal._
    def attrOf(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.mkString("."))
      case _ => None
    }
    def litOf(n: ColumnNode): Option[Any] = n match {
      case l: Literal => Some(l.value)
      case _ => None
    }
    val flip = Map("<" -> ">", "<=" -> ">=", ">" -> "<", ">=" -> "<=",
      "=" -> "=", "==" -> "==")
    c.node match {
      case f: UnresolvedFunction if flip.contains(f.functionName) &&
          f.arguments.size == 2 =>
        (attrOf(f.arguments.head), litOf(f.arguments(1)),
          attrOf(f.arguments(1)), litOf(f.arguments.head)) match {
          case (Some(a), Some(v), _, _) => Some((a, f.functionName, v))
          case (_, _, Some(a), Some(v)) => Some((a, flip(f.functionName), v))
          case _ => scala.None
        }
      case _ => scala.None
    }
  }

  /** All column names a Column expression references (its unresolved
    * attributes) — used to check a predicate against a table schema
    * before application (the reference's influxrpc planner skips tables
    * lacking a predicate column rather than erroring). */
  def attributeNames(c: Column): Seq[String] = {
    import org.apache.spark.sql.internal._
    def walk(n: ColumnNode): Seq[String] = n match {
      case a: UnresolvedAttribute => Seq(a.nameParts.mkString("."))
      case f: UnresolvedFunction => f.arguments.flatMap(walk)
      case a: Alias => walk(a.child)
      case w: Cast => walk(w.child)
      case s: SortOrder => walk(s.child)
      case u: UpdateFields => u.valueExpression.toSeq.flatMap(walk) ++ walk(u.structExpression)
      case w: CaseWhenOtherwise =>
        w.branches.flatMap(b => walk(b._1) ++ walk(b._2)) ++ w.otherwise.toSeq.flatMap(walk)
      case _ => Nil
    }
    walk(c.node).distinct
  }

  /** All function names appearing in a Column's (unresolved) node tree —
    * Column operators build internal.UnresolvedFunction nodes whose names
    * never surface in the converted Expression until analysis, so
    * validation layers walk the node tree instead. */
  def functionNames(c: Column): Seq[String] = {
    import org.apache.spark.sql.internal._
    def walk(n: ColumnNode): Seq[String] = n match {
      case f: UnresolvedFunction => f.functionName +: f.arguments.flatMap(walk)
      case a: Alias => walk(a.child)
      case w: Cast => walk(w.child)
      case s: SortOrder => walk(s.child)
      case u: UpdateFields => u.valueExpression.toSeq.flatMap(walk) ++ walk(u.structExpression)
      case w: CaseWhenOtherwise =>
        w.branches.flatMap(b => walk(b._1) ++ walk(b._2)) ++ w.otherwise.toSeq.flatMap(walk)
      case _ => Nil
    }
    walk(c.node)
  }
}
