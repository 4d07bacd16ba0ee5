package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{IoxSchema, RpcPredicate}
import graft.operators.InfluxRpc
import graft.operators.InfluxRpc.AggKind
import graft.sources.LineProtocol

/** Ports of the reference's influxrpc query-test matrix — read_group
  * (query_tests/src/influxrpc/read_group.rs) and tag_values
  * (query_tests/src/influxrpc/tag_values.rs) — with the reference's own
  * fixture line protocol and EXPECTED ROWS transcribed from the in-file
  * pretty-printed tables (differential test data, not code). Each fixture
  * is materialized the way make_two_chunk_scenarios does: two write
  * batches whose schemas may differ, merged into one logical table.
  */
class InfluxRpcMatrixSpec extends SparkSpec {

  /** Two-chunk scenario: per measurement, union of both batches with
    * schema merge (scenarios.rs make_two_chunk_scenarios). */
  private def twoChunk(lines1: Seq[String], lines2: Seq[String]): Map[String, DataFrame] = {
    val c1 = LineProtocol.ingest(spark, lines1)
    val c2 = LineProtocol.ingest(spark, lines2)
    (c1.keySet ++ c2.keySet).map { m =>
      m -> IoxSchema.mergeUnion(Seq(c1.get(m), c2.get(m)).flatten)
    }.toMap
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // ------------------------------------------------------------ read_group

  // OneMeasurementForAggs (read_group.rs:83)
  private lazy val oneForAggs = twoChunk(
    Seq("h2o,state=MA,city=Boston temp=70.4 100",
      "h2o,state=MA,city=Boston temp=72.4 250"),
    Seq("h2o,state=CA,city=LA temp=90.0 200",
      "h2o,state=CA,city=LA temp=90.0 350"))("h2o")

  test("read_group: data_pred (sum, city=LA, range [190,210))") {
    val pred = RpcPredicate().withExpr(col("city") === "LA").withRange(190, 210)
    val got = InfluxRpc.readGroup(oneForAggs, pred, AggKind.Sum, Seq("state"))
    assert(got.columns.toSeq == Seq("state", "city", "temp", "time"))
    assert(rows(got) == Seq(Seq("CA", "LA", 90.0, 200L)))
  }

  test("read_group: field restriction to temp only") {
    val pred = RpcPredicate().withFields("temp")
    val got = InfluxRpc.readGroup(oneForAggs, pred, AggKind.Sum, Seq("state"))
    assert(rows(got) == Seq(
      Seq("CA", "LA", 180.0, 350L),
      Seq("MA", "Boston", 142.8, 250L)))
  }

  // AnotherMeasurementForAggs (read_group.rs:151)
  private lazy val anotherForAggs = twoChunk(
    Seq("h2o,state=MA,city=Cambridge temp=80 50",
      "h2o,state=MA,city=Cambridge temp=81 100",
      "h2o,state=MA,city=Cambridge temp=82 200",
      "h2o,state=MA,city=Boston temp=70 300"),
    Seq("h2o,state=MA,city=Boston temp=71 400",
      "h2o,state=CA,city=LA temp=90,humidity=10 500",
      "h2o,state=CA,city=LA temp=91,humidity=11 600"))("h2o")

  private val bostonOrCambridge = RpcPredicate()
    .withExpr(col("city") === "Boston" || col("city") === "Cambridge")
    .withRange(100, 1000)

  test("read_group: grouped sum (null humidity stays null)") {
    val got = InfluxRpc.readGroup(anotherForAggs, bostonOrCambridge, AggKind.Sum, Seq("state"))
    assert(got.columns.toSeq == Seq("state", "city", "humidity", "temp", "time"))
    assert(rows(got) == Seq(
      Seq("MA", "Boston", null, 141.0, 400L),
      Seq("MA", "Cambridge", null, 163.0, 200L)))
  }

  test("read_group: grouped count (all-null field counts 0, not null)") {
    val got = InfluxRpc.readGroup(anotherForAggs, bostonOrCambridge, AggKind.Count, Seq("state"))
    assert(rows(got) == Seq(
      Seq("MA", "Boston", 0L, 2L, 400L),
      Seq("MA", "Cambridge", 0L, 2L, 200L)))
  }

  test("read_group: grouped mean") {
    val got = InfluxRpc.readGroup(anotherForAggs, bostonOrCambridge, AggKind.Mean, Seq("state"))
    assert(rows(got) == Seq(
      Seq("MA", "Boston", null, 70.5, 400L),
      Seq("MA", "Cambridge", null, 81.5, 200L)))
  }

  // MeasurementForSelectors (read_group.rs:276): mixed f64/i64/bool/string
  private lazy val forSelectors = twoChunk(
    Seq("h2o,state=MA,city=Cambridge f=8.0,i=8i,b=true,s=\"d\" 1000"),
    Seq("h2o,state=MA,city=Cambridge f=7.0,i=7i,b=true,s=\"c\" 2000",
      "h2o,state=MA,city=Cambridge f=6.0,i=6i,b=false,s=\"b\" 3000",
      "h2o,state=MA,city=Cambridge f=5.0,i=5i,b=false,s=\"a\" 4000"))("h2o")

  test("read_group selectors: first over mixed field types") {
    val got = InfluxRpc.readGroup(forSelectors,
      RpcPredicate().withRange(1001, 4001), AggKind.First, Seq("state"))
    assert(got.columns.toSeq == Seq("state", "city",
      "b", "time_b", "f", "time_f", "i", "time_i", "s", "time_s"))
    assert(rows(got) == Seq(Seq("MA", "Cambridge",
      true, 2000L, 7.0, 2000L, 7L, 2000L, "c", 2000L)))
  }

  test("read_group selectors: last over mixed field types") {
    val got = InfluxRpc.readGroup(forSelectors,
      RpcPredicate().withRange(100, 3999), AggKind.Last, Seq("state"))
    assert(rows(got) == Seq(Seq("MA", "Cambridge",
      false, 3000L, 6.0, 3000L, 6L, 3000L, "b", 3000L)))
  }

  // MeasurementForMin (read_group.rs:352)
  private lazy val forMin = twoChunk(
    Seq("h2o,state=MA,city=Cambridge f=8.0,i=8i,b=false,s=\"c\" 1000",
      "h2o,state=MA,city=Cambridge f=7.0,i=7i,b=true,s=\"a\" 2000"),
    Seq("h2o,state=MA,city=Cambridge f=6.0,i=6i,b=true,s=\"z\" 3000",
      "h2o,state=MA,city=Cambridge f=5.0,i=5i,b=false,s=\"c\" 4000"))("h2o")

  test("read_group selectors: min picks per-field value AND its time") {
    val got = InfluxRpc.readGroup(forMin,
      RpcPredicate().withRange(100, 3999), AggKind.Min, Seq("state"))
    assert(rows(got) == Seq(Seq("MA", "Cambridge",
      false, 1000L, 6.0, 3000L, 6L, 3000L, "a", 2000L)))
  }

  // MeasurementForMax (read_group.rs:396)
  private lazy val forMax = twoChunk(
    Seq("h2o,state=MA,city=Cambridge f=8.0,i=8i,b=true,s=\"c\" 1000",
      "h2o,state=MA,city=Cambridge f=7.0,i=7i,b=false,s=\"d\" 2000",
      "h2o,state=MA,city=Cambridge f=6.0,i=6i,b=true,s=\"a\" 3000"),
    Seq("h2o,state=MA,city=Cambridge f=5.0,i=5i,b=false,s=\"z\" 4000"))("h2o")

  test("read_group selectors: max breaks value ties by earliest time") {
    val got = InfluxRpc.readGroup(forMax,
      RpcPredicate().withRange(1001, 4001), AggKind.Max, Seq("state"))
    assert(rows(got) == Seq(Seq("MA", "Cambridge",
      true, 3000L, 7.0, 2000L, 7L, 2000L, "z", 4000L)))
  }

  // MeasurementForGroupKeys (read_group.rs:440)
  private lazy val forGroupKeys = twoChunk(
    Seq("h2o,state=MA,city=Cambridge temp=80 50",
      "h2o,state=MA,city=Cambridge temp=81 100",
      "h2o,state=MA,city=Cambridge temp=82 200"),
    Seq("h2o,state=MA,city=Boston temp=70 300",
      "h2o,state=MA,city=Boston temp=71 400",
      "h2o,state=CA,city=LA temp=90,humidity=10 500",
      "h2o,state=CA,city=LA temp=91,humidity=11 600"))("h2o")

  test("read_group: group by (state, city)") {
    val got = InfluxRpc.readGroup(forGroupKeys, RpcPredicate(), AggKind.Sum,
      Seq("state", "city"))
    assert(got.columns.toSeq == Seq("state", "city", "humidity", "temp", "time"))
    assert(rows(got) == Seq(
      Seq("CA", "LA", 21.0, 181.0, 600L),
      Seq("MA", "Boston", null, 141.0, 400L),
      Seq("MA", "Cambridge", null, 243.0, 200L)))
  }

  test("read_group: group by (city, state) — alternate key order") {
    val got = InfluxRpc.readGroup(forGroupKeys, RpcPredicate(), AggKind.Sum,
      Seq("city", "state"))
    assert(got.columns.toSeq == Seq("city", "state", "humidity", "temp", "time"))
    assert(rows(got) == Seq(
      Seq("Boston", "MA", null, 141.0, 400L),
      Seq("Cambridge", "MA", null, 243.0, 200L),
      Seq("LA", "CA", 21.0, 181.0, 600L)))
  }

  test("read_group: Aggregate::None returns raw rows, group keys first") {
    val got = InfluxRpc.readGroup(forGroupKeys, RpcPredicate(), AggKind.None,
      Seq("city", "state"))
    assert(got.columns.toSeq == Seq("city", "state", "humidity", "temp", "time"))
    assert(rows(got) == Seq(
      Seq("Boston", "MA", null, 70.0, 300L),
      Seq("Boston", "MA", null, 71.0, 400L),
      Seq("Cambridge", "MA", null, 80.0, 50L),
      Seq("Cambridge", "MA", null, 81.0, 100L),
      Seq("Cambridge", "MA", null, 82.0, 200L),
      Seq("LA", "CA", 10.0, 90.0, 500L),
      Seq("LA", "CA", 11.0, 91.0, 600L)))
  }

  test("read_group: no data yields no rows") {
    val got = InfluxRpc.readGroup(oneForAggs,
      RpcPredicate().withRange(0, 1), AggKind.Mean)
    assert(got.count() == 0)
  }

  // ------------------------------------------------------------ tag_values

  // TwoMeasurementsManyNulls (scenarios.rs:320)
  private lazy val manyNulls = twoChunk(
    Seq("h2o,state=CA,city=LA,county=LA temp=70.4 100",
      "h2o,state=MA,city=Boston,county=Suffolk temp=72.4 250",
      "o2,state=MA,city=Boston temp=50.4 200",
      "o2,state=CA temp=79.0 300"),
    Seq("o2,state=NY temp=60.8 400",
      "o2,state=NY,city=NYC temp=61.0 500",
      "o2,state=NY,city=NYC,borough=Brooklyn temp=61.0 600"))

  private def tv(tag: String, pred: RpcPredicate): Seq[String] =
    InfluxRpc.tagValuesAcrossTables(manyNulls, tag, pred)

  test("tag_values matrix (tag_values.rs): 12 predicate combinations") {
    // absent tag: empty result, NOT an error
    assert(tv("tag_not_in_chunks", RpcPredicate()) == Nil)
    assert(tv("state", RpcPredicate()) == Seq("CA", "MA", "NY"))
    assert(tv("city", RpcPredicate()) == Seq("Boston", "LA", "NYC"))
    assert(tv("state", RpcPredicate().withRange(50, 201)) == Seq("CA", "MA"))
    assert(tv("city", RpcPredicate().withExpr(col("state") === "MA")) == Seq("Boston"))
    assert(tv("state", RpcPredicate().withRange(150, 301)
      .withExpr(col("state") === "MA")) == Seq("MA"))
    assert(tv("state", RpcPredicate(tables = Some(Set("h2o")))) == Seq("CA", "MA"))
    assert(tv("city", RpcPredicate(tables = Some(Set("o2")))) == Seq("Boston", "NYC"))
    assert(tv("state", RpcPredicate(tables = Some(Set("o2"))).withRange(50, 201))
      == Seq("MA"))
    assert(tv("state", RpcPredicate(tables = Some(Set("o2")))
      .withExpr(col("state") === "NY")) == Seq("NY"))
    assert(tv("state", RpcPredicate(tables = Some(Set("o2"))).withRange(1, 550)
      .withExpr(col("state") === "NY")) == Seq("NY"))
    // range excludes the NY rows entirely
    assert(tv("state", RpcPredicate(tables = Some(Set("o2"))).withRange(1, 300)
      .withExpr(col("state") === "NY")) == Nil)
  }

  test("tag_values: a field column is an error, like the reference") {
    val e = intercept[IllegalArgumentException] {
      InfluxRpc.tagValues(manyNulls("h2o"), "temp", RpcPredicate())
    }
    assert(e.getMessage.contains("not a tag"))
  }
}
