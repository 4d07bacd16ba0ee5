package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming change detection — the continuous twin of
  * [[graft.functions.SeriesFunctions.cusum]] (Page's tabular CUSUM). A
  * monitoring pipeline flags sustained drifts AS POINTS ARRIVE instead of
  * re-running the batch scan over the accumulated series.
  *
  * Built on `flatMapGroupsWithState`: per-series state is the O(1)
  * (S⁺, S⁻) pair, updated with the identical arithmetic as the batch
  * operator and carried across micro-batches — state size is two doubles
  * per series no matter the stream length. Points are applied in
  * event-time order WITHIN each micro-batch; cross-batch order is arrival
  * order, the standard stateful-streaming contract (same as the batch
  * result whenever ingestion is in order — the parity the spec pins).
  *
  * Scale posture: one shuffle on the series key (the state partitioning),
  * exactly the layout the batch scan picks.
  */
/** O(1) per-series CUSUM state (the encoder needs a public top-level
  * shape for codegen). */
case class CusumState(sp: Double, sn: Double)

object StreamDetect {

  /** Per-point CUSUM sums + alarm flag over a (possibly streaming) frame.
    * Output columns: key, ts, cusum_pos, cusum_neg, alarm. */
  def cusumStream(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val typed = df.select(col(keyCol).cast("string").as("_1"),
        col(tsCol).cast("long").as("_2"),
        col(valueCol).cast("double").as("_3"))
      .as[(String, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[CusumState,
        (String, Long, Double, Double, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (k, it, state) =>
          var (sp, sn) = state.getOption
            .map(s => (s.sp, s.sn)).getOrElse((0.0, 0.0))
          val out = it.toSeq.sortBy(_._2).map { case (_, t, v) =>
            sp = math.max(0.0, sp + (v - target - slack))
            sn = math.max(0.0, sn + (target - v - slack))
            (k, t, sp, sn, sp > threshold || sn > threshold)
          }
          state.update(CusumState(sp, sn))
          out.iterator
      }
      .toDF(keyCol, tsCol, "cusum_pos", "cusum_neg", "alarm")
  }
}
