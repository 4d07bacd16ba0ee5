package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap filling for windowed time series: materialize every bucket of a
  * fixed grid for every series key, then fill the holes.
  *
  * The reference family's query language fills missing windows with
  * `fill(none|null|0|previous|linear)`; the storage engine itself emits
  * only observed windows (influxdb_iox query/src/func/window.rs computes
  * bucket bounds, the gap semantics live a layer up in InfluxQL/Flux).
  * This operator supplies that layer Spark-first:
  *
  *  - The grid is `sequence(start, stop-every, every)` exploded per
  *    distinct series key — the number of generated rows is
  *    `keys x buckets`, independent of the raw data volume, and the
  *    explode happens on the (small) aggregated side, never on raw points.
  *  - Observed buckets left-join the grid on (key, bucket). With
  *    aggregated inputs both sides are already tiny relative to the scan
  *    that produced them; AQE picks a broadcast when keys x buckets fits.
  *  - `Previous` is one `last(value, ignoreNulls)` running window per key
  *    (a single shuffle by key, then a linear scan — the same shape the
  *    sessionize and as-of operators use).
  *  - `Linear` carries BOTH neighbors: the previous and next observed
  *    (bucket, value) pairs via running `last`/`first` windows over the
  *    same partitioning (one exchange, one sort — Catalyst reuses the
  *    sort for the mirrored frame), then interpolates
  *    `prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`.
  *    Buckets before the first / after the last observation stay NULL
  *    (InfluxQL linear fill does the same: no extrapolation).
  */
object GapFill {

  sealed trait Strategy
  /** Keep holes as NULL rows (fill(null) — the grid row still appears). */
  case object KeepNull extends Strategy
  /** Fill holes with a constant (fill(0), fill(42.5), ...). */
  final case class Value(v: Column) extends Strategy
  /** Carry the last observed value forward (fill(previous)). */
  case object Previous extends Strategy
  /** Interpolate linearly between the neighboring observations. */
  case object Linear extends Strategy

  /** Expand `aggregated` (one row per observed (key, bucket)) onto the
    * full `[startNs, stopNs)` grid with `everyNs` spacing, filling each
    * column in `fills` by its strategy. `timeCol` must hold the bucket
    * START bound in epoch ns — the column stays on the grid in the output.
    */
  def onGrid(aggregated: DataFrame, keyCols: Seq[String], timeCol: String,
      startNs: Long, stopNs: Long, everyNs: Long,
      fills: Map[String, Strategy]): DataFrame = {
    require(everyNs > 0, "grid spacing must be positive")
    require(stopNs > startNs, "empty grid range")
    require(fills.nonEmpty, "no value columns to fill")
    val keys = keyCols.map(col)
    // grid start bounds: last bucket is the one containing stopNs-1
    val lastStart = startNs + ((stopNs - 1 - startNs) / everyNs) * everyNs
    val grid = aggregated.select(keys: _*).distinct()
      .withColumn(timeCol,
        explode(sequence(lit(startNs), lit(lastStart), lit(everyNs))))
    val joined = grid.join(aggregated, keyCols :+ timeCol, "left")
    val byKey = Window.partitionBy(keys: _*).orderBy(col(timeCol))
    val filled = fills.foldLeft(joined) { case (df, (c, strat)) =>
      strat match {
        case KeepNull => df
        case Value(v) => df.withColumn(c, coalesce(col(c), v))
        case Previous => df.withColumn(c,
          last(col(c), ignoreNulls = true)
            .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
        case Linear =>
          // neighboring observations as (bucket, value) structs; nulls in
          // `c` make the struct null only via the `when`, so ignoreNulls
          // skips unobserved buckets
          val obs = when(col(c).isNotNull,
            struct(col(timeCol).as("t"), col(c).as("v")))
          val prev = last(obs, ignoreNulls = true)
            .over(byKey.rowsBetween(Window.unboundedPreceding, 0))
          val next = first(obs, ignoreNulls = true)
            .over(byKey.rowsBetween(0, Window.unboundedFollowing))
          df.withColumn(c,
            when(col(c).isNotNull, col(c)).otherwise(
              when(prev.isNotNull && next.isNotNull,
                prev("v") + (next("v") - prev("v"))
                  * (col(timeCol) - prev("t")).cast("double")
                  / (next("t") - prev("t")).cast("double"))))
      }
    }
    filled.select((keys :+ col(timeCol)) ++ fills.keys.toSeq.sorted.map(col): _*)
  }

  /** One-step convenience: bucket raw rows onto the grid (start-bound
    * labels, `t - t mod every` on the ns axis) and aggregate, then fill.
    * `aggs` are ordinary aggregate columns over the raw rows. */
  def bucketAndFill(raw: DataFrame, keyCols: Seq[String], timeNsCol: String,
      startNs: Long, stopNs: Long, everyNs: Long,
      aggs: Seq[Column], fills: Map[String, Strategy]): DataFrame = {
    val bucket = (col(timeNsCol) - pmod(col(timeNsCol) - lit(startNs), lit(everyNs)))
    val aggregated = raw
      .filter(col(timeNsCol) >= startNs && col(timeNsCol) < stopNs)
      .withColumn("__bucket", bucket)
      .groupBy((keyCols.map(col) :+ col("__bucket")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("__bucket", timeNsCol)
    onGrid(aggregated, keyCols, timeNsCol, startNs, stopNs, everyNs, fills)
  }
}
