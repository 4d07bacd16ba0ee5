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
}
