package graft.functions

import java.time.{Instant, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import graft.core.NsTime

/** `window_bounds(time, every, offset)` — label each timestamp with the
  * *stop* bound of the earliest window containing it (reference
  * query/src/func/window.rs:19-87; stop-bound convention :44-57).
  *
  * Fixed-width windows are pure long arithmetic and stay in Spark built-ins
  * ([[NsTime.windowStopNs]], codegen'd). Calendar-month windows
  * (reference `WindowDuration::Variable`, query/src/group_by.rs:70-76 and
  * func/window/internal.rs) need real calendar math, so they get a custom
  * Catalyst Expression below.
  */
object WindowBounds {

  /** Fixed window: stop bound, ns. Pure built-ins (whole-stage codegen). */
  def windowBoundsNs(time: Column, everyNs: Long, offsetNs: Long): Column =
    NsTime.windowStopNs(time, everyNs, offsetNs)

  /** Month-width window: stop bound, ns. `every` in months, `offset` in
    * months. */
  def windowBoundsMonths(time: Column, everyMonths: Int, offsetMonths: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      MonthWindowStop(org.apache.spark.sql.graft.ColumnBridge.toExpr(time), everyMonths, offsetMonths))

  /** Months since epoch of the UTC month containing tsNs. */
  def monthIndex(tsNs: Long): Long = {
    val sec = Math.floorDiv(tsNs, 1000000000L)
    val nanoInSec = Math.floorMod(tsNs, 1000000000L)
    val dt = LocalDateTime.ofEpochSecond(sec, nanoInSec.toInt, ZoneOffset.UTC)
    (dt.getYear - 1970L) * 12L + (dt.getMonthValue - 1L)
  }

  /** Start-of-month instant (ns) for a months-since-epoch index. */
  def monthStartNs(monthIdx: Long): Long = {
    val y = Math.floorDiv(monthIdx, 12L) + 1970L
    val m = Math.floorMod(monthIdx, 12L) + 1L
    LocalDateTime.of(y.toInt, m.toInt, 1, 0, 0).toEpochSecond(ZoneOffset.UTC) * 1000000000L
  }

  /** Scala-side evaluation: start of the month that ends the earliest
    * (every, offset)-month window containing tsNs. A timestamp exactly on a
    * boundary belongs to the window that STARTS there (stop bound is
    * exclusive-side), matching the fixed-width convention.
    * Public + static-forwarded: generated code calls it directly. */
  def monthWindowStop(tsNs: Long, every: Int, offset: Int): Long = {
    val mi = monthIndex(tsNs) - offset
    val bucket = Math.floorDiv(mi, every.toLong)
    monthStartNs((bucket + 1) * every + offset)
  }
}

/** Catalyst expression for month-granularity window stop bounds. Interpreted
  * eval plus hand-rolled codegen that calls back into the static helper —
  * stays inside whole-stage codegen spans (no UDF boundary, no
  * serialization). */
case class MonthWindowStop(child: Expression, everyMonths: Int, offsetMonths: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    WindowBounds.monthWindowStop(input.asInstanceOf[Long], everyMonths, offsetMonths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WindowBounds.monthWindowStop($c, $everyMonths, $offsetMonths)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "month_window_stop"
}
