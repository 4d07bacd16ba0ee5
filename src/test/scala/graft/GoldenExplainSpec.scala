package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.LineProtocol

/** Golden-EXPLAIN tests in the reference's query_tests style
  * (query_tests/cases/in/pushdown.{sql,expected} and
  * duplicates.{sql,expected}): optimizer behavior over the reference's
  * own fixtures pinned as normalized plan TEXT. A Spark version bump (or
  * a refactor here) that silently stops pushing a filter to the parquet
  * scan, stops pruning the read schema, or starts deduplicating clean
  * chunks fails the text diff — not just a row-count probe.
  *
  * Volatile fragments (expression ids, codegen stage ids, plan ids,
  * temp paths) are normalized out; what remains is the plan shape and
  * the scan metadata (PushedFilters / ReadSchema) the scale contract
  * depends on. Expected files live in src/test/resources/golden and
  * regenerate with GRAFT_REGEN_GOLDEN=1 — review the diff like any
  * golden change.
  */
class GoldenExplainSpec extends SparkSpec {

  private def normalize(plan: String): String =
    plan.linesIterator
      .map(_
        .replaceAll("#\\d+", "#N")
        .replaceAll("plan_id=\\d+", "plan_id=N")
        .replaceAll("\\*\\(\\d+\\)", "*(N)")
        // RDD ids depend on what ran earlier in the shared session
        .replaceAll("RDD\\[\\d+\\]", "RDD[N]")
        .replaceAll("\\[codegen id : \\d+\\]", "[codegen id : N]")
        .replaceAll("file:[^\\s,\\])]+", "<path>")
        .replaceAll("/tmp/[^\\s,\\])]+", "<path>")
        .replaceAll("InMemoryFileIndex\\([^)]*\\)", "InMemoryFileIndex")
        .replaceAll("\\s+$", ""))
      .filterNot(_.trim.isEmpty)
      .mkString("\n")

  private def explainFormatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def checkGolden(name: String, actual: String): Unit = {
    val path = Paths.get("src/test/resources/golden", s"$name.expected")
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(path.getParent)
      Files.writeString(path, actual + "\n")
      info(s"regenerated $path")
    } else {
      assert(Files.exists(path),
        s"missing golden file $path — regenerate with GRAFT_REGEN_GOLDEN=1")
      val want = Files.readString(path).stripLineEnd
      assert(actual == want,
        s"plan drift vs $path (regenerate + review if intended)\n" +
          s"--- actual ---\n$actual\n--- expected ---\n$want")
    }
  }

  private def goldenDoc(cases: Seq[String], run: String => DataFrame): String =
    cases.map(q => s"-- SQL: $q\n" + normalize(explainFormatted(run(q))))
      .mkString("\n\n")

  test("pushdown.expected: 11 predicate shapes' plans pinned as golden text") {
    // the default 100-char metadata cap truncates PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val tmp = Files.createTempDirectory("graft-golden-pushdown").toString
    // TwoMeasurementsPredicatePushDown (scenarios.rs:281), restaurant only
    LineProtocol.ingest(spark, Seq(
      "restaurant,town=andover count=40000u,system=5.0 100",
      "restaurant,town=reading count=632u,system=5.0 120",
      "restaurant,town=bedford count=189u,system=7.0 110",
      "restaurant,town=tewsbury count=471u,system=6.0 110",
      "restaurant,town=lexington count=372u,system=5.0 100",
      "restaurant,town=lawrence count=872u,system=6.0 110",
      "restaurant,town=reading count=632u,system=6.0 130"))("restaurant")
      .write.parquet(s"$tmp/restaurant")
    spark.read.parquet(s"$tmp/restaurant").createOrReplaceTempView("restaurant")

    // the WHERE clauses of query_tests/cases/in/pushdown.sql, verbatim
    // (time literal as raw ns — this engine's time column is i64 ns)
    val cases = Seq(
      "SELECT * FROM restaurant",
      "SELECT * FROM restaurant WHERE count > 200",
      "SELECT * FROM restaurant WHERE count > 200.0",
      "SELECT * FROM restaurant WHERE system > 4.0",
      "SELECT * FROM restaurant WHERE count > 200 AND town != 'tewsbury'",
      "SELECT * FROM restaurant WHERE count > 200 AND town != 'tewsbury' " +
        "AND (system = 5 OR town = 'lawrence')",
      "SELECT * FROM restaurant WHERE count > 200 AND town != 'tewsbury' " +
        "AND (system = 5 OR town = 'lawrence') AND count < 40000",
      "SELECT * FROM restaurant WHERE count > 200 AND count < 40000",
      "SELECT * FROM restaurant WHERE system > 4.0 AND system < 7.0",
      "SELECT * FROM restaurant WHERE system > 5.0 AND system < 7.0",
      "SELECT * FROM restaurant WHERE system > 5.0 AND town != 'tewsbury' " +
        "AND 7.0 > system",
      "SELECT * FROM restaurant WHERE system > 5.0 AND 'tewsbury' != town " +
        "AND system < 7.0 AND (count = 632 OR town = 'reading')",
      "SELECT * FROM restaurant WHERE 5.0 < system AND town != 'tewsbury' " +
        "AND system < 7.0 AND (count = 632 OR town = 'reading') " +
        "AND time > 130")
    checkGolden("pushdown", goldenDoc(cases, spark.sql))

    // belt and braces beyond the text pin: the load-bearing fragments
    val p5 = normalize(explainFormatted(spark.sql(cases(4))))
    assert(p5.contains("PushedFilters"), p5)
    assert(p5.contains("GreaterThan(count,200)"), p5)
  }

  test("duplicates.expected: dedup plan shapes pinned as golden text") {
    // OneMeasurementThreeChunksWithDuplicates (scenarios.rs:461): two
    // overlapping chunks, one self-duplicating, one clean — the same
    // fixture GoldenDedupSpec checks ROWS for; here the PLANS are the
    // contract (clean chunks must stay aggregation-free, overlapping
    // chunks go through the arrival-seq dedup)
    def chunk(lines: String*) =
      LineProtocol.ingest(spark, lines)("h2o")
        .withColumn(Upsert.ArrivalCol, monotonically_increasing_id())
    val c1 = chunk(
      "h2o,state=MA,city=Boston min_temp=70.4 50",
      "h2o,state=MA,city=Bedford min_temp=71.59 150",
      "h2o,state=MA,city=Boston max_temp=75.4 250",
      "h2o,state=MA,city=Andover max_temp=69.2 250")
    val c2 = chunk(
      "h2o,state=MA,city=Bedford max_temp=78.75,area=742.0 150",
      "h2o,state=MA,city=Boston min_temp=65.4 250",
      "h2o,state=CA,city=SF min_temp=79.0,max_temp=87.2,area=500.0 300")
    val c3 = chunk(
      "h2o,state=MA,city=Bedford max_temp=80.75,area=742.0 400",
      "h2o,state=MA,city=Boston min_temp=68.4 400",
      "h2o,state=MA,city=Boston min_temp=65.40,max_temp=82.67 400")
    val c4 = chunk(
      "h2o,state=MA,city=Bedford max_temp=88.75,area=742.0 600",
      "h2o,state=CA,city=SF min_temp=68.4,max_temp=85.7,area=500.0 650")
    Upsert.scanWithDedup(Seq(
        (c1, (50L, 250L), true), (c2, (150L, 300L), true),
        (c3, (400L, 400L), false), (c4, (600L, 650L), true)),
      pkCols = Seq("city", "state", "time"))
      .createOrReplaceTempView("h2o")

    // query_tests/cases/in/duplicates.sql, verbatim
    val cases = Seq(
      "SELECT time, state, city, min_temp, max_temp, area FROM h2o " +
        "ORDER BY time, state, city",
      "SELECT time, state, city, min_temp, max_temp, area FROM h2o",
      "SELECT state AS name FROM h2o UNION ALL SELECT city AS name FROM h2o")
    checkGolden("duplicates", goldenDoc(cases, spark.sql))

    // shape fragments the golden text must keep encoding: the
    // overlapping pair and the self-duplicating chunk dedup via the
    // partial-aggregating struct-max; the clean chunks union in with no
    // aggregate of their own (Upsert.scanWithDedup's 3-way split)
    val plain = normalize(explainFormatted(spark.sql(cases(1))))
    assert(plain.contains("max"), plain)
    assert(plain.contains("Union"), plain)
  }
}
