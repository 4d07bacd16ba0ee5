package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the continuous form of the
  * batch as-of/attribution join ([[graft.operators.AsOfJoin]]): attribute
  * each event on the right stream (e.g. a click) to the matching event on
  * the left stream (the view it followed) when both share a key and the
  * right event lands within `[left.ts, left.ts + horizon]`.
  *
  * Built on Spark's stream-stream inner join with BOTH sides
  * watermarked and an event-time range condition — the two ingredients
  * that make the state bounded: without the time bound every left row
  * must be kept forever (any future right row might match); with it the
  * engine evicts a buffered row once the opposite watermark passes its
  * horizon (state ~ rate × (horizon + lateness), not stream length).
  *
  * Scale posture: one shuffle per side on the join key, state partitioned
  * with it — the same layout a batch shuffle join would pick, run
  * incrementally. Used for training-data assembly from live telemetry:
  * impression→conversion pairing, prompt→response stitching,
  * document-fetch→render attribution.
  */
object StreamJoin {

  /** Inner interval join: rows `(l, r)` with `l.keyCol == r.keyCol` and
    * `r.tsCol ∈ [l.tsCol, l.tsCol + horizon]`. `lateness` is the
    * out-of-orderness both watermarks tolerate. Column names of the two
    * inputs must be disjoint apart from `keyCol` (standard join hygiene;
    * rename upstream). Works identically on batch frames (the join
    * condition is plain Catalyst) — the batch≡streaming parity the spec
    * asserts. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      lTsCol: String, rTsCol: String, horizon: String,
      lateness: String = "0 seconds"): DataFrame = {
    // alias both sides: when left and right derive from the SAME source
    // (the usual self-attribution shape), unaliased l(keyCol)/r(keyCol)
    // resolve to one attribute — Spark warns "trivially true equals
    // predicate" and falls back to its self-join disambiguation; the
    // aliases make the condition unambiguous by construction
    val l = (if (left.isStreaming) left.withWatermark(lTsCol, lateness)
             else left).alias("__sj_l")
    val r = (if (right.isStreaming) right.withWatermark(rTsCol, lateness)
             else right).alias("__sj_r")
    l.join(r,
      col(s"__sj_l.$keyCol") === col(s"__sj_r.$keyCol") &&
        col(s"__sj_r.$rTsCol") >= col(s"__sj_l.$lTsCol") &&
        col(s"__sj_r.$rTsCol") <= col(s"__sj_l.$lTsCol") +
          expr(s"INTERVAL $horizon"))
      .drop(col(s"__sj_r.$keyCol"))
  }
}
