package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: events of one key belong to one session
  * while consecutive gaps stay within `gapNs`; a larger gap starts a new
  * session. One shuffle on the key, one within-partition sort, two
  * running window passes (break flags, then their running sum as the
  * session index) — the standard linear-scan formulation. Session ids are
  * 1-based and consecutive per key, so output is deterministic.
  *
  * The reference has no session operator (only tumbling windows with
  * offset); this extends the engine for event-stream training data.
  * Streaming twin: Spark's `session_window()` with a watermark.
  */
object Sessionize {

  /** Rows + `session_id`. */
  def assign(df: DataFrame, keyCols: Seq[String], timeCol: String,
      gapNs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
    df.withColumn("__brk",
        when(col(timeCol) - lag(timeCol, 1).over(w) > gapNs ||
          lag(timeCol, 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_id", sum("__brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .drop("__brk")
  }

  /** One row per (key, session): event count and time bounds. */
  def aggregate(df: DataFrame, keyCols: Seq[String], timeCol: String,
      gapNs: Long): DataFrame =
    assign(df, keyCols, timeCol, gapNs)
      .groupBy((keyCols :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(timeCol).as("start_t"), max(timeCol).as("end_t"))
}
