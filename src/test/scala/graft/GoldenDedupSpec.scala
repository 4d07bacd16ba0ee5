package graft

import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.{LineProtocol, SqlFrontend}

/** Port of the reference's dedup golden SQL test
  * (query_tests/src/sql.rs:666 sql_deduplicate_1 over the
  * OneMeasurementThreeChunksWithDuplicates fixture, scenarios.rs:461):
  * four chunks — two overlapping, one self-duplicating, one clean — and
  * the exact 18 expected rows after scan-time dedup, queried through the
  * SQL frontend like the reference runs it through DataFusion.
  */
class GoldenDedupSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(lines: String*) =
    LineProtocol.ingest(spark, lines)("h2o")
      .withColumn(Upsert.ArrivalCol, monotonically_increasing_id())

  private lazy val h2o: org.apache.spark.sql.DataFrame = {
    val c1 = chunk( // time 50-250, clean
      "h2o,state=MA,city=Boston min_temp=70.4 50",
      "h2o,state=MA,city=Bedford min_temp=71.59 150",
      "h2o,state=MA,city=Boston max_temp=75.4 250",
      "h2o,state=MA,city=Andover max_temp=69.2 250")
    val c2 = chunk( // time 150-300, overlaps c1; new field `area`
      "h2o,state=MA,city=Bedford max_temp=78.75,area=742.0 150",
      "h2o,state=MA,city=Boston min_temp=65.4 250",
      "h2o,state=MA,city=Reading min_temp=53.4 250",
      "h2o,state=CA,city=SF min_temp=79.0,max_temp=87.2,area=500.0 300",
      "h2o,state=CA,city=SJ min_temp=78.5,max_temp=88.0 300",
      "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 350")
    val c3 = chunk( // time 400-500, DUPLICATES WITHIN the chunk
      "h2o,state=MA,city=Bedford max_temp=80.75,area=742.0 400",
      "h2o,state=MA,city=Boston min_temp=68.4 400",
      "h2o,state=MA,city=Bedford min_temp=65.22,area=750.0 400",
      "h2o,state=MA,city=Boston min_temp=65.40,max_temp=82.67 400",
      "h2o,state=CA,city=SJ min_temp=77.0,max_temp=90.7 450",
      "h2o,state=CA,city=SJ min_temp=69.5,max_temp=88.2 500")
    val c4 = chunk( // time 600-700, clean and disjoint
      "h2o,state=MA,city=Bedford max_temp=88.75,area=742.0 600",
      "h2o,state=MA,city=Boston min_temp=67.4 600",
      "h2o,state=MA,city=Reading min_temp=60.4 600",
      "h2o,state=CA,city=SF min_temp=68.4,max_temp=85.7,area=500.0 650",
      "h2o,state=CA,city=SJ min_temp=69.5,max_temp=89.2 650",
      "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 700")

    Upsert.scanWithDedup(Seq(
        (c1, (50L, 250L), true), (c2, (150L, 350L), true),
        (c3, (400L, 500L), false), (c4, (600L, 700L), true)),
      pkCols = Seq("city", "state", "time"))
  }

  private def d(x: Double) = Some(x)

  private val expected = Seq( // sql.rs:670-692, times as raw ns
    (50L, "MA", "Boston", d(70.4), None, None),
    (150L, "MA", "Bedford", d(71.59), d(78.75), d(742.0)),
    (250L, "MA", "Andover", None, d(69.2), None),
    (250L, "MA", "Boston", d(65.4), d(75.4), None),
    (250L, "MA", "Reading", d(53.4), None, None),
    (300L, "CA", "SF", d(79.0), d(87.2), d(500.0)),
    (300L, "CA", "SJ", d(78.5), d(88.0), None),
    (350L, "CA", "SJ", d(75.5), d(84.08), None),
    (400L, "MA", "Bedford", d(65.22), d(80.75), d(750.0)),
    (400L, "MA", "Boston", d(65.4), d(82.67), None),
    (450L, "CA", "SJ", d(77.0), d(90.7), None),
    (500L, "CA", "SJ", d(69.5), d(88.2), None),
    (600L, "MA", "Bedford", None, d(88.75), d(742.0)),
    (600L, "MA", "Boston", d(67.4), None, None),
    (600L, "MA", "Reading", d(60.4), None, None),
    (650L, "CA", "SF", d(68.4), d(85.7), d(500.0)),
    (650L, "CA", "SJ", d(69.5), d(89.2), None),
    (700L, "CA", "SJ", d(75.5), d(84.08), None))

  test("sql_deduplicate_1 golden rows match the reference") {
    SqlFrontend.register(spark, Map("h2o" -> h2o))

    val got = spark.sql(
      """SELECT time, state, city, min_temp, max_temp, area FROM h2o
         ORDER BY time, state, city""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))

    assert(got.toSeq == expected)
  }

  test("duplicates.sql: no-order-by and UNION ALL plans over the dedup scan") {
    // query_tests/cases/in/duplicates.sql pins two more queries over the
    // same fixture: the bare (unordered) select and the UNION ALL of two
    // dedup'd branches. Row content must be the 18 golden rows regardless
    // of ordering, and each union branch must dedup independently.
    SqlFrontend.register(spark, Map("h2o" -> h2o))

    val unordered = spark.sql(
      "SELECT time, state, city, min_temp, max_temp, area FROM h2o")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .sortBy(t => (t._1, t._2, t._3))
    assert(unordered.toSeq == expected)

    val names = spark.sql(
      "SELECT state AS name FROM h2o UNION ALL SELECT city AS name FROM h2o")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names ==
      (expected.map(_._2) ++ expected.map(_._3)).sorted)
  }

  test("sql_deduplicate_1 persisted-chunk scenario: same golden rows " +
      "through rollover -> compact -> sidecar scan") {
    // The reference runs the duplicates fixture across chunk-STAGE
    // scenarios too (scenarios.rs: rollover + move_chunk_to_read_buffer /
    // persist per chunk). Spark mapping: each chunk compacts to its own
    // parquet dir + stats sidecar (within-chunk dedup at write, like the
    // reference's dedup on move), then Upsert.scanChunks plans from the
    // sidecars alone — overlap groups from timeMin/timeMax, cross-chunk
    // dedup only where ranges overlap — and must produce the identical
    // 18 golden rows.
    val base = java.nio.file.Files
      .createTempDirectory("graft-golden-dedup").toString
    val lines = Seq(
      Seq("h2o,state=MA,city=Boston min_temp=70.4 50",
        "h2o,state=MA,city=Bedford min_temp=71.59 150",
        "h2o,state=MA,city=Boston max_temp=75.4 250",
        "h2o,state=MA,city=Andover max_temp=69.2 250"),
      Seq("h2o,state=MA,city=Bedford max_temp=78.75,area=742.0 150",
        "h2o,state=MA,city=Boston min_temp=65.4 250",
        "h2o,state=MA,city=Reading min_temp=53.4 250",
        "h2o,state=CA,city=SF min_temp=79.0,max_temp=87.2,area=500.0 300",
        "h2o,state=CA,city=SJ min_temp=78.5,max_temp=88.0 300",
        "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 350"),
      Seq("h2o,state=MA,city=Bedford max_temp=80.75,area=742.0 400",
        "h2o,state=MA,city=Boston min_temp=68.4 400",
        "h2o,state=MA,city=Bedford min_temp=65.22,area=750.0 400",
        "h2o,state=MA,city=Boston min_temp=65.40,max_temp=82.67 400",
        "h2o,state=CA,city=SJ min_temp=77.0,max_temp=90.7 450",
        "h2o,state=CA,city=SJ min_temp=69.5,max_temp=88.2 500"),
      Seq("h2o,state=MA,city=Bedford max_temp=88.75,area=742.0 600",
        "h2o,state=MA,city=Boston min_temp=67.4 600",
        "h2o,state=MA,city=Reading min_temp=60.4 600",
        "h2o,state=CA,city=SF min_temp=68.4,max_temp=85.7,area=500.0 650",
        "h2o,state=CA,city=SJ min_temp=69.5,max_temp=89.2 650",
        "h2o,state=CA,city=SJ min_temp=75.5,max_temp=84.08 700"))
    val pk = Seq("city", "state", "time")
    val chunkDirs = lines.zipWithIndex.map { case (ls, i) =>
      chunk(ls: _*).write.parquet(s"$base/raw_$i")
      graft.streaming.Ingest.compact(spark, s"$base/raw_$i",
        s"$base/chunk_$i", pk, seqCol = Some(Upsert.ArrivalCol))
      s"$base/chunk_$i"
    }
    // every chunk's sidecar must exist — the scan plans from them
    chunkDirs.foreach(p =>
      assert(graft.sources.StatsCatalog.load(spark, p).isDefined, p))
    val got = Upsert.scanChunks(spark, chunkDirs, pk)
      .select("time", "state", "city", "min_temp", "max_temp", "area")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got.toSeq == expected)
  }
}
