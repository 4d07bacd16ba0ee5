package graft

import java.nio.file.Files
import graft.sources.{LineProtocol, SqlFrontend}
import graft.streaming.Ingest

class SqlFrontendSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cpu = LineProtocol.ingest(spark, Seq(
    "cpu,host=a user=22.5 100", "cpu,host=b user=9.9 150"))("cpu")

  test("registered views answer SQL text; system_columns carries categories") {
    SqlFrontend.register(spark, Map("cpu" -> cpu))
    val rows = spark.sql(
      "SELECT host, max(user) AS mx FROM cpu GROUP BY host ORDER BY host")
      .as[(String, Double)].collect().toSeq
    assert(rows == Seq(("a", 22.5), ("b", 9.9)))

    val cols = spark.sql(
      """SELECT column_name, category FROM system_columns
         WHERE table_name = 'cpu' ORDER BY column_name""")
      .as[(String, String)].collect().toMap
    assert(cols == Map("host" -> "tag", "user" -> "field", "time" -> "time"))
  }

  test("system_chunks summarizes compacted tables from sidecars only") {
    val tmp = Files.createTempDirectory("graft-syschunks").toString
    cpu.write.parquet(s"$tmp/raw")
    Ingest.compact(spark, s"$tmp/raw", s"$tmp/cpu", Seq("host", "time"))
    val rows = SqlFrontend.systemChunks(spark, Map("cpu" -> s"$tmp/cpu"))
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(rows.length == 1)
    val (name, _, n, tmin, tmax) = rows.head
    assert(name == "cpu" && n == 2 && tmin == 100L && tmax == 150L)
  }

  test("registerChunked with no tables registers empty system views, not a crash") {
    SqlFrontend.registerChunked(spark, Map.empty)
    for (v <- Seq("system_chunks", "system_chunk_columns", "system_operations",
        "system_columns"))
      assert(spark.sql(s"SELECT * FROM $v").count() == 0L, v)
  }

  test("registerChunked: storage stage in system_chunks + per-column chunk stats " +
      "(system_tables.rs:192,373; docs/sql.md:234)") {
    import graft.streaming.Lifecycle
    val tmp = Files.createTempDirectory("graft-syscc").toString
    val table = new Lifecycle.ChunkedTable(spark, tmp, pkCols = Seq("host", "time"))
    val rules = Lifecycle.Rules(lateArriveWindowMs = 1000L,
      persistRowThreshold = Long.MaxValue, persistAgeThresholdMs = 5000L)
    table.writeChunk(cpu, nowMs = 0L)
    assert(table.runOnce(rules, nowMs = 2000L)
      .exists(_.isInstanceOf[Lifecycle.Compact]))
    table.writeChunk(
      LineProtocol.ingest(spark, Seq("cpu,host=c user=1.5 200"))("cpu"),
      nowMs = 2500L)

    // mid-timeline: one ReadBuffer (compacted) + one open chunk, each with
    // per-column sidecar stats queryable as SQL
    SqlFrontend.registerChunked(spark, Map("cpu_lc" -> table))
    val stages = spark.sql(
      """SELECT id, storage, row_count FROM system_chunks ORDER BY id""")
      .as[(Long, String, Long)].collect().toSeq
    assert(stages == Seq((1L, "ReadBuffer", 2L), (2L, "OpenMutableBuffer", 1L)))
    val compactedCols = spark.sql(
      """SELECT column_name, row_count, min_value, max_value
         FROM system_chunk_columns WHERE chunk_id = 1 ORDER BY column_name""")
      .as[(String, Long, String, String)].collect().toSeq
    assert(compactedCols == Seq(
      ("host", 2L, "a", "b"), ("time", 2L, "100", "150"),
      ("user", 2L, "9.9", "22.5"))) // min/max order natively, THEN render

    // after a persist round split at t=150: cold chunk holds hosts a,b;
    // the open remainder holds host c — stats follow the chunks
    assert(table.runOnce(rules, nowMs = 9000L, splitNsOf = _ => 150L)
      .exists(_.isInstanceOf[Lifecycle.Persist]))
    SqlFrontend.registerChunked(spark, Map("cpu_lc" -> table))
    val after = spark.sql(
      """SELECT storage, column_name, row_count, min_value, max_value
         FROM system_chunk_columns WHERE column_name = 'host'
         ORDER BY storage""")
      .as[(String, String, Long, String, String)].collect().toSeq
    assert(after == Seq(
      ("ObjectStoreOnly", "host", 2L, "a", "b"),
      ("OpenMutableBuffer", "host", 1L, "c", "c")))

    // system.operations (system_tables.rs:483): both executed jobs are
    // tracked with the reference Job description strings and wall time
    val ops = spark.sql(
      """SELECT id, status, table_name, description FROM system_operations
         ORDER BY CAST(id AS INT)""")
      .as[(String, String, String, String)].collect().toSeq
    assert(ops == Seq(
      ("0", "Complete", "cpu_lc", "Compacting chunks to ReadBuffer"),
      ("1", "Complete", "cpu_lc", "Persisting chunks to object storage")))
    val walls = spark.sql("SELECT wall_time_used FROM system_operations")
      .as[Long].collect()
    assert(walls.forall(_ > 0L))
  }
}
