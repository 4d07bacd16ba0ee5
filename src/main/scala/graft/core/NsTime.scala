package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Nanosecond-epoch time helpers.
  *
  * The reference keeps time as i64 nanoseconds everywhere
  * (internal_types/src/schema.rs:36-40: `Timestamp(Nanosecond, None)`).
  * Spark's TimestampType is microsecond-precision, so the canonical `time`
  * column in this engine is a LongType of ns since the UNIX epoch; µs
  * TimestampType views are derived only for SQL ergonomics.
  */
object NsTime {
  /** Canonical time column name (reference: schema.rs:23 `TIME_COLUMN_NAME`). */
  val TimeColumn = "time"

  /** ns long -> µs TimestampType view (truncating, for display/SQL only). */
  def nsToTimestamp(c: Column): Column = timestamp_micros((c / 1000L).cast("long"))

  /** µs TimestampType -> ns long (exact; Spark timestamps carry µs). */
  def timestampToNs(c: Column): Column = unix_micros(c) * 1000L

  /** Floor division on longs (matches Rust's div_euclid for positive divisor).
    * Column variant of java.lang.Math.floorDiv. `a - pmod(a, b)` is the
    * greatest multiple of `b` <= `a`, so exact integer division of it by
    * `b` is floor(a/b) for any sign of `a`. Must NOT use Column `/`: that
    * is IEEE double division, and at ns-epoch magnitudes (~1.7e18, above
    * 2^53) the dividend isn't representable, returning floor-1 for many
    * timestamps (e.g. every=3599999999999 ns mislabels ~9% of 2024-era
    * timestamps).
    */
  def floorDiv(a: Column, b: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.integralDivide(a - pmod(a, lit(b)), lit(b))

  /** Window *stop* bound containing `tsNs`, fixed width.
    *
    * Matches the reference convention (query/src/func/window.rs:44-57):
    * the bucket label is the stop bound of the earliest window containing
    * the timestamp: `(floor((ts - offset) / every) + 1) * every + offset`.
    * Golden vectors (window.rs:96-118): every=200, offset=50,
    * ts [100, 200, 300, 400] -> [250, 250, 450, 450].
    */
  def windowStopNs(tsNs: Column, everyNs: Long, offsetNs: Long): Column =
    (floorDiv(tsNs - offsetNs, everyNs) + 1L) * everyNs + offsetNs

  /** Scala-side twin of [[windowStopNs]] for tests / driver-side checks. */
  def windowStopNs(tsNs: Long, everyNs: Long, offsetNs: Long): Long =
    (Math.floorDiv(tsNs - offsetNs, everyNs) + 1L) * everyNs + offsetNs
}
