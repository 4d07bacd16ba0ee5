package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.InfluxQl
import graft.streaming.ContinuousQuery

class ContinuousQuerySpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // 1s in ns

  private val cqText =
    """CREATE CONTINUOUS QUERY downsample ON telemetry BEGIN
       SELECT mean(value), count(value) INTO cpu_10s FROM cpu
       WHERE tag != 'skip' GROUP BY time(10s), tag END"""

  test("CREATE CONTINUOUS QUERY parses: name, db, INTO, embedded select") {
    val cq = InfluxQl.parseStmt(cqText).asInstanceOf[InfluxQl.CreateCq]
    assert(cq.name == "downsample" && cq.db == "telemetry")
    assert(cq.sel.into.contains("cpu_10s"))
    assert(cq.sel.groupTime.contains(InfluxQl.GroupTime(10 * S, 0L)))
  }

  test("RESAMPLE EVERY/FOR: timer surfaces as trigger, FOR keeps buckets open") {
    val rq =
      """CREATE CONTINUOUS QUERY ds ON db RESAMPLE EVERY 30s FOR 25s BEGIN
         SELECT count(value) INTO out FROM cpu GROUP BY time(10s), tag END"""
    val cq = InfluxQl.parseStmt(rq).asInstanceOf[InfluxQl.CreateCq]
    assert(cq.resampleEveryNs.contains(30 * S))
    assert(cq.resampleForNs.contains(25 * S))
    val input = MemoryStream[(String, Long, Double)](spark)
    val bound = ContinuousQuery.bind(
      input.toDF().toDF("tag", "t", "value"), "t", Seq("tag"), rq)
    assert(bound.triggerMs.contains(30000L), "EVERY -> trigger interval")
    // watermark delay = FOR - width = 15s: visible in the analyzed plan
    assert(bound.frame.queryExecution.analyzed.toString
      .contains("15 seconds"), bound.frame.queryExecution.analyzed.toString)
    // behavioral: with FOR 25s, a 16s-late point still lands in its
    // bucket (watermark trails 15s behind max event time)
    val q = bound.frame.writeStream.format("memory").queryName("cq_rs")
      .outputMode("append").start()
    try {
      input.addData(("a", 1 * S, 1.0), ("a", 20 * S, 1.0))
      q.processAllAvailable()
      input.addData(("a", 4 * S, 1.0)) // 16s late; inside the FOR horizon
      q.processAllAvailable()
      input.addData(("a", 100 * S, 1.0)) // close everything
      q.processAllAvailable()
      val rows = spark.table("cq_rs").select("time", "count")
        .as[(Long, Long)].collect().toMap
      assert(rows(0L) == 2L, s"late point must join its bucket: $rows")
    } finally q.stop()
    intercept[InfluxQl.ParseError](InfluxQl.parseStmt(
      """CREATE CONTINUOUS QUERY x ON db RESAMPLE BEGIN
         SELECT count(value) FROM cpu GROUP BY time(10s) END"""))
  }

  test("bound CQ aggregates stream windows; buckets close on watermark") {
    val input = MemoryStream[(String, Long, Double)](spark)
    val bound = ContinuousQuery.bind(
      input.toDF().toDF("tag", "t", "value"), "t", Seq("tag"), cqText)
    assert(bound.name == "downsample" && bound.into.contains("cpu_10s"))
    val q = bound.frame.writeStream.format("memory").queryName("cq_out")
      .outputMode("append").start()
    try {
      input.addData(("a", 1 * S, 2.0), ("a", 3 * S, 4.0), ("b", 5 * S, 10.0),
        ("skip", 6 * S, 99.0), ("a", 12 * S, 6.0))
      q.processAllAvailable()
      input.addData(("a", 40 * S, 0.0)) // watermark passes all open buckets
      q.processAllAvailable()
      val rows = spark.table("cq_out")
        .select("time", "tag", "mean", "count")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(rows.contains((0L, "a", 3.0, 2L)))
      assert(rows.contains((0L, "b", 10.0, 1L)))
      assert(rows.contains((10 * S, "a", 6.0, 1L)))
      assert(!rows.exists(_._2 == "skip"), "WHERE tag predicate applies")
    } finally q.stop()
  }

  test("CQ rejections: time bounds, non-aggregates, sub-ms windows") {
    val df = Seq(("a", 1L, 2.0)).toDF("tag", "t", "value")
    def err(q: String): String =
      intercept[InfluxQl.ParseError](
        ContinuousQuery.bind(df, "t", Seq("tag"), q)).getMessage
    assert(err("SELECT mean(value) FROM cpu WHERE time >= 0 GROUP BY time(10s)")
      .contains("time bounds"))
    assert(err("SELECT difference(value) FROM cpu GROUP BY time(10s)")
      .contains("aggregates"))
    assert(err("SELECT mean(value) FROM cpu GROUP BY tag")
      .contains("GROUP BY time"))
    val e = intercept[IllegalArgumentException](
      ContinuousQuery.bind(df, "t", Seq("tag"),
        "SELECT mean(value) FROM cpu GROUP BY time(500ns)"))
    assert(e.getMessage.contains("millisecond"))
  }

  test("batch and streaming paths label buckets identically") {
    import graft.operators.{InfluxMeasurement, InfluxQlPlanner}
    val rows = Seq(("a", 1 * S, 2.0), ("a", 3 * S, 4.0), ("a", 12 * S, 6.0),
      ("b", 5 * S, 10.0))
    val batch = InfluxQlPlanner.run(
      Map("cpu" -> InfluxMeasurement(rows.toDF("tag", "t", "value"), "t",
        Seq("tag"))),
      "SELECT mean(value), count(value) FROM cpu GROUP BY time(10s), tag fill(none)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSet
    val input = MemoryStream[(String, Long, Double)](spark)
    val bound = ContinuousQuery.bind(input.toDF().toDF("tag", "t", "value"),
      "t", Seq("tag"),
      "SELECT mean(value), count(value) FROM cpu GROUP BY time(10s), tag")
    val q = bound.frame.writeStream.format("memory").queryName("cq_par")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(("z", 100 * S, 0.0))
      q.processAllAvailable()
      val streaming = spark.table("cq_par")
        .filter($"tag" =!= "z")
        .as[(Long, String, Double, Long)].collect().toSet
      assert(streaming == batch,
        "a consumer cannot tell which engine produced a bucket")
    } finally q.stop()
  }
}
