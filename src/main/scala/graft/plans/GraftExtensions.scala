package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{Hash60Expr, MonthWindowStop}
import graft.core.NsTime

/** Session extension installing the engine's custom Catalyst expressions
  * as SQL functions, so the SQL surface (SqlFrontend / the HTTP query
  * endpoint / Flight tickets) can reach them without the DataFrame API:
  *
  *  - `window_bounds_ns(time, every, offset)` — fixed-width window STOP
  *    label (the reference's `window_bounds` UDF, query/src/func/
  *    window.rs:19-87; here exact long arithmetic, codegen'd);
  *  - `month_window_stop(time, every_months, offset_months)` — the
  *    calendar-month variant (WindowDuration::Variable,
  *    func/window/internal.rs) as the custom codegen expression;
  *  - `hash60(str)` — the engine's deterministic 60-bit content hash
  *    (fingerprinting / deterministic sampling in SQL);
  *  - `quality_score(text)` / `lang_id(text)` — the pipeline's text
  *    quality and language-ID scorers as SQL macros (the Column
  *    composition eagerly converted to catalyst via
  *    `ColumnBridge.toCatalyst`, then resolved like any expression).
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — the
  * standard injection point (SparkSessionExtensions), which is how the
  * library composes with sessions it does not construct. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** The injectable (identifier, info, builder) triples — one list backing
    * both the builder-time extension and the live-session installer. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("month_window_stop"),
      new ExpressionInfo(classOf[MonthWindowStop].getName, "month_window_stop"),
      (args: Seq[Expression]) => {
        require(args.size == 3,
          "month_window_stop(time, every_months, offset_months)")
        MonthWindowStop(args.head, intArg(args(1), "every_months"),
          intArg(args(2), "offset_months"))
      }),
    (new FunctionIdentifier("window_bounds_ns"),
      new ExpressionInfo(classOf[NsTime.type].getName, "window_bounds_ns"),
      (args: Seq[Expression]) => {
        require(args.size == 3, "window_bounds_ns(time, every_ns, offset_ns)")
        // NsTime.windowStopNs as raw Catalyst nodes (the Column DSL
        // cannot be embedded in a FunctionBuilder's output):
        // (floorDiv(ts - offset, every) + 1) * every + offset with
        // floorDiv = (x - pmod(x, every)) div every — exact long math
        import org.apache.spark.sql.catalyst.expressions.{Add, IntegralDivide, Multiply, Pmod, Subtract}
        val every = longArg(args(1), "every_ns")
        val offset = longArg(args(2), "offset_ns")
        val x = Subtract(args.head, Literal(offset))
        val floored = IntegralDivide(
          Subtract(x, Pmod(x, Literal(every))), Literal(every))
        Add(Multiply(Add(floored, Literal(1L)), Literal(every)), Literal(offset))
      }),
    (new FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "hash60(str)")
        Hash60Expr(args.head)
      }),
    // pipeline scalar functions for pure-SQL users: the Column
    // compositions converted through ColumnBridge; their unresolved
    // children resolve in the analyzer's fixed-point like any macro
    (new FunctionIdentifier("quality_score"),
      new ExpressionInfo(graft.functions.TextFunctions.getClass.getName,
        "quality_score"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "quality_score(text)")
        import org.apache.spark.sql.graft.ColumnBridge._
        toCatalyst(graft.functions.TextFunctions.qualityScore(fromExpr(args.head)))
      }),
    (new FunctionIdentifier("lang_id"),
      new ExpressionInfo(graft.functions.TextFunctions.getClass.getName,
        "lang_id"),
      (args: Seq[Expression]) => {
        require(args.size == 1, "lang_id(text)")
        import org.apache.spark.sql.graft.ColumnBridge._
        toCatalyst(graft.functions.TextFunctions.langId(fromExpr(args.head)))
      }))

  /** Install the SQL functions on an already-running session (sessions
    * the library did not build; extensions only bind at builder time). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerFunction(spark, ident, info, builder)
    }
}
