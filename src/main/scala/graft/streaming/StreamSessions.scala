package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core.NsTime

/** Streaming sessionization — the stateful twin of
  * [[graft.operators.Sessionize]] (whose scaladoc promises exactly this).
  *
  * Two implementations, in the preference order the Spark-first design
  * rule dictates:
  *
  *  1. [[sessionAgg]] — the built-in `session_window()` grouping with a
  *     watermark: fully codegen'd, state managed by the streaming
  *     aggregation operator, sessions merge automatically when late
  *     events bridge two open sessions. Use this whenever the output is
  *     per-session aggregates.
  *  2. [[sessionizeWithState]] — `flatMapGroupsWithState` with an
  *     event-time timeout, for semantics the built-in cannot express:
  *     each CLOSED session is emitted exactly once (append semantics with
  *     a definite close event, the shape a downstream training-data
  *     pipeline wants for "completed user episodes"). State per key is
  *     one open session (constant size — counters + bounds, never the
  *     events themselves), dropped on timeout, so the state store holds
  *     O(active keys) small records no matter how long the stream runs.
  *
  * Scale posture: both shapes shuffle once on the session key; state is
  * per-key-partitioned in the state store exactly like the ingest
  * PersistenceWindows state ([[Ingest.streamWindowCounts]]).
  */
object StreamSessions {

  /** Per-session aggregates via the built-in session window: one row per
    * (keys..., session) once the watermark closes it. Gap and late bound
    * are given on the ns axis / as a Spark interval string. */
  def sessionAgg(df: DataFrame, keyCols: Seq[String], gapNs: Long,
      lateArrival: String = "10 minutes"): DataFrame = {
    require(gapNs > 0 && gapNs % 1000L == 0L,
      "session gap must be positive with microsecond grain")
    df.withColumn("__ts", NsTime.nsToTimestamp(col(NsTime.TimeColumn)))
      .withWatermark("__ts", lateArrival)
      .groupBy(keyCols.map(col) :+
        session_window(col("__ts"), s"${gapNs / 1000L} microseconds"): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols.map(col) :+
        (unix_micros(col("session_window.start")) * 1000L).as("start_t") :+
        (unix_micros(col("session_window.end")) * 1000L).as("end_t") :+
        col("n_events"): _*)
  }

  /** One open session per key: bounds + count, NOT the member events —
    * state size is constant per key. */
  case class OpenSession(startNs: Long, lastNs: Long, n: Long)
  /** A closed session, emitted exactly once. */
  case class ClosedSession(key: String, start_t: Long, end_t: Long,
      n_events: Long)

  /** Emit each closed session exactly once. Events must carry (key, ns
    * time). A session closes when a gap larger than `gapNs` arrives for
    * its key, or when the watermark moves `gapNs` past its last event
    * (event-time timeout — sessions of quiet keys still close).
    *
    * In-batch events are sorted per key (a micro-batch's worth, bounded
    * by the trigger, not the stream); out-of-order WITHIN the gap merges
    * into the open session, matching `session_window` semantics. */
  def sessionizeWithState(events: Dataset[(String, Long)], gapNs: Long,
      lateArrival: String = "10 minutes"): Dataset[ClosedSession] = {
    require(gapNs > 0 && gapNs % 1000L == 0L,
      "session gap must be positive with microsecond grain")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("__ts", NsTime.nsToTimestamp(col("_2")))
      .withWatermark("__ts", lateArrival)
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed lastNs + gap: close and drop
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.startNs, s.lastNs, s.n))
          } else {
            // Interval-merge the open session with the batch's events so a
            // cross-batch out-of-order event EARLIER than the open session
            // extends its start (min), and one more than a gap before it
            // forms a separate earlier session — matching session_window
            // merge semantics instead of absorbing any older event.
            val ts = rows.map(_._2).toArray.sorted
            val items = (state.getOption.toSeq ++
              ts.iterator.map(t => OpenSession(t, t, 1L)))
              .sortBy(s => (s.startNs, s.lastNs))
            val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
            items.foreach { s =>
              merged.lastOption match {
                case Some(p) if s.startNs - p.lastNs <= gapNs =>
                  merged(merged.length - 1) = OpenSession(p.startNs,
                    math.max(p.lastNs, s.lastNs), p.n + s.n)
                case _ => merged += s
              }
            }
            val closed = Seq.newBuilder[ClosedSession]
            // all but the latest are definitely gap-separated: close them
            merged.dropRight(1).foreach { s =>
              closed += ClosedSession(key, s.startNs, s.lastNs, s.n)
            }
            merged.lastOption.foreach { s =>
              // close when the watermark passes the gap after the last
              // event; if it already has (a batch of old-but-not-late
              // events), close NOW — an event-time timeout may not be set
              // at or behind the current watermark
              val closeAtMs = (s.lastNs + gapNs) / 1000000L
              if (closeAtMs <= state.getCurrentWatermarkMs()) {
                closed += ClosedSession(key, s.startNs, s.lastNs, s.n)
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(closeAtMs)
              }
            }
            closed.result().iterator
          }
      }
  }
}
