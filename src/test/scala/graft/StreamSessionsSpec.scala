package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamSessions

class StreamSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // 1s in ns

  test("sessionAgg: session_window aggregates close after the gap + watermark") {
    val input = MemoryStream[(String, Long)](spark)
    val agg = StreamSessions.sessionAgg(
      input.toDF().toDF("tag", "time"), Seq("tag"), gapNs = 2 * S,
      lateArrival = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("ssa")
      .outputMode("append").start()
    try {
      // a: two events 1s apart (one session), then 5s silence, one more
      input.addData(("a", 1 * S), ("a", 2 * S), ("a", 7 * S), ("b", 1 * S))
      q.processAllAvailable()
      input.addData(("a", 100 * S)) // watermark sails past everything open
      q.processAllAvailable()
      val rows = spark.table("ssa")
        .select("tag", "start_t", "end_t", "n_events")
        .as[(String, Long, Long, Long)].collect().toSet
      // session_window end = last event + gap
      assert(rows.contains(("a", 1 * S, 4 * S, 2L)))
      assert(rows.contains(("a", 7 * S, 9 * S, 1L)))
      assert(rows.contains(("b", 1 * S, 3 * S, 1L)))
    } finally q.stop()
  }

  test("sessionizeWithState: closed sessions emit exactly once, state drops") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamSessions.sessionizeWithState(input.toDS(), gapNs = 2 * S,
      lateArrival = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sss")
      .outputMode("append").start()
    try {
      input.addData(("a", 1 * S), ("a", 2 * S), ("b", 1 * S))
      q.processAllAvailable()
      // in-batch gap closes a's first session immediately (same batch)
      input.addData(("a", 10 * S), ("a", 11 * S))
      q.processAllAvailable()
      // watermark (= max event time with 0s late) passes 11s + 2s gap via
      // a later event on another key -> a's second session times out
      input.addData(("c", 30 * S))
      q.processAllAvailable()
      input.addData(("c", 60 * S)) // pushes watermark past c's session too
      q.processAllAvailable()
      val rows = spark.table("sss")
        .as[StreamSessions.ClosedSession].collect()
      val byKey = rows.groupBy(_.key)
      assert(byKey("a").map(s => (s.start_t, s.end_t, s.n_events)).toSet ==
        Set((1 * S, 2 * S, 2L), (10 * S, 11 * S, 2L)))
      assert(byKey("b").head.n_events == 1L)
      assert(byKey("c").map(_.start_t).toSet == Set(30 * S))
      assert(rows.length == 4, "each session exactly once")
    } finally q.stop()
  }

  test("sessionizeWithState: cross-batch earlier events lower the start or split") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamSessions.sessionizeWithState(input.toDS(), gapNs = 5 * S,
      lateArrival = "100 seconds")
    val q = out.writeStream.format("memory").queryName("ssb")
      .outputMode("append").start()
    try {
      input.addData(("a", 10 * S))
      q.processAllAvailable()
      // 8s is EARLIER than the open session's start but within the gap:
      // it must lower the start (session_window merge), not be absorbed
      // with a stale bound; 1s is more than a gap before 8s: a separate,
      // earlier session closed on its own
      input.addData(("a", 8 * S), ("a", 1 * S))
      q.processAllAvailable()
      input.addData(("z", 300 * S)) // watermark past a's open session
      q.processAllAvailable()
      input.addData(("z", 600 * S)) // fire a's event-time timeout
      q.processAllAvailable()
      val a = spark.table("ssb").as[StreamSessions.ClosedSession]
        .collect().filter(_.key == "a")
      assert(a.map(s => (s.start_t, s.end_t, s.n_events)).toSet ==
        Set((1 * S, 1 * S, 1L), (8 * S, 10 * S, 2L)))
    } finally q.stop()
  }

  test("sessionizeWithState merges out-of-order events within the gap") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamSessions.sessionizeWithState(input.toDS(), gapNs = 5 * S,
      lateArrival = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ssm")
      .outputMode("append").start()
    try {
      input.addData(("a", 3 * S), ("a", 1 * S)) // out of order, same session
      q.processAllAvailable()
      input.addData(("a", 2 * S)) // late but within gap AND late bound
      q.processAllAvailable()
      input.addData(("z", 100 * S)) // close everything
      q.processAllAvailable()
      input.addData(("z", 200 * S))
      q.processAllAvailable()
      val a = spark.table("ssm").as[StreamSessions.ClosedSession]
        .collect().filter(_.key == "a")
      assert(a.map(s => (s.start_t, s.end_t, s.n_events)).toSet ==
        Set((1 * S, 3 * S, 3L)))
    } finally q.stop()
  }
}
