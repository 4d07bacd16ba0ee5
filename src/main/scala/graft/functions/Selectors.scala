package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** InfluxDB selector aggregates: first / last / min / max returning BOTH
  * the selected value and its timestamp.
  *
  * The reference implements these as 16 paired UDAFs (selector_*_value +
  * selector_*_time, query/src/func/selectors.rs:56-160) because DataFusion
  * aggregates couldn't return structs. Spark's `min`/`max` order structs
  * lexicographically (nulls smallest), so one ordinary codegen'd aggregate
  * per selector suffices — single-pass, partial-aggregation-friendly
  * (map-side combine), no UDAF.
  *
  * Tie rules match the reference (selectors.rs:108-116): min/max selectors
  * break equal values by the EARLIEST timestamp; first/last break equal
  * timestamps by smallest/largest value (the reference leaves equal-time
  * order unspecified; we pin it for determinism).
  *
  * Each returns a struct with fields `value` and `time`.
  */
object Selectors {

  private def reorder(picked: Column): Column =
    struct(picked.getField("value").as("value"), picked.getField("time").as("time"))

  /** Null values are skipped entirely (the reference accumulators only
    * update on non-null values, selectors.rs internal.rs): wrapping the
    * ordered struct in `when(value.isNotNull, ...)` makes the whole input
    * NULL for such rows, and Spark aggregates ignore null inputs. */
  private def nn(value: Column, s: Column): Column = when(value.isNotNull, s)

  /** Row with the smallest time (among non-null values). */
  def selectorFirst(value: Column, time: Column): Column =
    reorder(min(nn(value, struct(time.as("time"), value.as("value")))))

  /** Row with the largest time (among non-null values). */
  def selectorLast(value: Column, time: Column): Column =
    reorder(max(nn(value, struct(time.as("time"), value.as("value")))))

  /** Row with the smallest value; earliest time on value ties. */
  def selectorMin(value: Column, time: Column): Column =
    min(nn(value, struct(value.as("value"), time.as("time"))))

  /** Row with the largest value; earliest time on value ties.
    * max(struct(value, time)) alone would take the LATEST time on ties, so
    * order by (value, -time): negate works for numeric time (ns long). */
  def selectorMax(value: Column, time: Column): Column = {
    val picked = max(nn(value, struct(value.as("value"), (-time).as("negt"))))
    struct(picked.getField("value").as("value"), (-picked.getField("negt")).as("time"))
  }

  def firstValue(value: Column, time: Column): Column =
    selectorFirst(value, time).getField("value")
  def firstTime(value: Column, time: Column): Column =
    selectorFirst(value, time).getField("time")
  def lastValue(value: Column, time: Column): Column =
    selectorLast(value, time).getField("value")
  def lastTime(value: Column, time: Column): Column =
    selectorLast(value, time).getField("time")
  def minValue(value: Column, time: Column): Column =
    selectorMin(value, time).getField("value")
  def minTime(value: Column, time: Column): Column =
    selectorMin(value, time).getField("time")
  def maxValue(value: Column, time: Column): Column =
    selectorMax(value, time).getField("value")
  def maxTime(value: Column, time: Column): Column =
    selectorMax(value, time).getField("time")
}
