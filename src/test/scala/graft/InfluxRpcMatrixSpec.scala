package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{IoxSchema, RpcPredicate}
import graft.operators.{InfluxRpc, Upsert}
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

  // ----------------------------------------------------------- read_filter

  // TwoMeasurementsMultiSeries (read_filter.rs:14); insertion order is
  // shuffled in the reference to prove output order is imposed, not kept
  private lazy val multiSeries = LineProtocol.ingest(spark, Seq(
    "h2o,state=CA,city=LA temp=90.0 200",
    "h2o,state=MA,city=Boston temp=72.4 250",
    "h2o,state=MA,city=Boston temp=70.4 100",
    "h2o,state=CA,city=LA temp=90.0 350",
    "o2,state=MA,city=Boston temp=53.4,reading=51 250",
    "o2,state=MA,city=Boston temp=50.4,reading=50 100"))

  /** Collected series, sorted by (tags, field) — the global series-set
    * order the reference's plan imposes. */
  private def seriesOf(df: org.apache.spark.sql.DataFrame, fields: Seq[String],
      pred: RpcPredicate = RpcPredicate()): Seq[InfluxRpc.Series] =
    InfluxRpc.toSeriesSet(InfluxRpc.readFilter(df, pred), fields)
      .collect().toSeq
      .sortBy(s => (s.tags.toSeq.sorted.mkString(","), s.field))

  private def pts(s: InfluxRpc.Series): Seq[(Long, Double)] =
    s.points.map(p => (p.time, p.value))

  test("read_filter: multi-series, points per series in time order") {
    val h = seriesOf(multiSeries("h2o"), Seq("temp"))
    assert(h.map(s => (s.tags("city"), s.tags("state"), s.field)) ==
      Seq(("Boston", "MA", "temp"), ("LA", "CA", "temp")))
    assert(pts(h(0)) == Seq((100L, 70.4), (250L, 72.4)))
    assert(pts(h(1)) == Seq((200L, 90.0), (350L, 90.0)))
    val o = seriesOf(multiSeries("o2"), Seq("reading", "temp"))
    assert(o.map(_.field) == Seq("reading", "temp"))
    assert(pts(o(0)) == Seq((100L, 50.0), (250L, 51.0)))
    assert(pts(o(1)) == Seq((100L, 50.4), (250L, 53.4)))
  }

  test("read_filter: range + equality, and the not-equal variant") {
    for (pred <- Seq(
        RpcPredicate().withRange(200, 300).withExpr(col("state") === "CA"),
        RpcPredicate().withRange(200, 300).withExpr(col("state") =!= "MA"))) {
      val h = seriesOf(multiSeries("h2o"), Seq("temp"), pred)
      assert(h.size == 1 && pts(h.head) == Seq((200L, 90.0)))
      assert(seriesOf(multiSeries("o2"), Seq("reading", "temp"), pred).isEmpty)
    }
  }

  test("read_filter: regex match and not-match rows (regex.rs)") {
    val m = seriesOf(multiSeries("h2o"), Seq("temp"),
      RpcPredicate().withRange(200, 300).withRegexMatch("state", "C.*"))
    assert(m.size == 1 && pts(m.head) == Seq((200L, 90.0)))
    val nm = seriesOf(multiSeries("o2"), Seq("reading", "temp"),
      RpcPredicate().withRange(200, 300).withRegexNotMatch("state", "C.*"))
    assert(nm.map(_.field) == Seq("reading", "temp"))
    assert(pts(nm(0)) == Seq((250L, 51.0)))
    assert(pts(nm(1)) == Seq((250L, 53.4)))
  }

  test("read_filter: predicate on a non-existent column yields nothing, not an error") {
    // TwoMeasurements (scenarios.rs:223)
    val two = LineProtocol.ingest(spark, Seq(
      "cpu,region=west user=23.2 100",
      "cpu,region=west user=21.0 150",
      "disk,region=east bytes=99i 200"))
    val missing = RpcPredicate().withExpr(col("tag_not_in_h20") === "foo")
    assert(seriesOf(two("cpu"), Seq("user"), missing).isEmpty)
    assert(seriesOf(two("disk"), Seq("bytes"), missing).isEmpty)
    // even when AND-ed with a column that does exist
    val mixed = RpcPredicate().withExpr(col("region") === "west")
      .withExpr(col("tag_not_in_h20") === "foo")
    assert(seriesOf(two("cpu"), Seq("user"), mixed).isEmpty)
    // a predicate with no column references applies everywhere (expr
    // string, not lit === lit: Column's === would log a "trivially true
    // equals" WARN for this intentionally tautological predicate)
    val noCols = RpcPredicate().withExpr(expr("'foo' = 'foo'"))
    assert(pts(seriesOf(two("cpu"), Seq("user"), noCols).head) ==
      Seq((100L, 23.2), (150L, 21.0)))
    assert(pts(seriesOf(two("disk"), Seq("bytes"), noCols).head) == Seq((200L, 99.0)))
  }

  test("read_filter: field restriction skips tables lacking the field") {
    // TwoMeasurementsManyFields (scenarios.rs:343)
    val many = twoChunk(
      Seq("h2o,state=MA,city=Boston temp=70.4 50",
        "h2o,state=MA,city=Boston other_temp=70.4 250",
        "h2o,state=CA,city=Boston other_temp=72.4 350",
        "o2,state=MA,city=Boston temp=53.4,reading=51 50",
        "o2,state=CA temp=79.0 300"),
      Seq("h2o,state=MA,city=Boston temp=70.4,moisture=43.0 100000"))
    val pred = RpcPredicate(fieldColumns = Some(Seq("other_temp")))
      .withExpr(col("state") === "CA")
    val h = seriesOf(many("h2o"), Seq("other_temp"), pred)
    assert(h.size == 1 && h.head.tags == Map("city" -> "Boston", "state" -> "CA"))
    assert(pts(h.head) == Seq((350L, 72.4)))
    // o2 has no other_temp: readFilter projects tags+time only, no series
    val o2Filtered = InfluxRpc.readFilter(many("o2"), pred)
    assert(o2Filtered.columns.toSeq == Seq("city", "state", "time"))
    assert(o2Filtered.collect().map(_.toSeq).toSeq == Seq(Seq(null, "CA", 300L)))
  }

  test("read_filter: OR across a column one table lacks (unsupported-in-scan)") {
    val pred = RpcPredicate().withExpr(
      col("state") === "CA" || col("reading") > 0)
    // h2o has no reading column -> contributes nothing
    assert(seriesOf(multiSeries("h2o"), Seq("temp"), pred).isEmpty)
    val o = seriesOf(multiSeries("o2"), Seq("reading", "temp"), pred)
    assert(pts(o(0)) == Seq((100L, 50.0), (250L, 51.0)))
    assert(pts(o(1)) == Seq((100L, 50.4), (250L, 53.4)))
  }

  // -------------------------------- tag_keys / field_columns / table_names

  test("tag_keys matrix (tag_keys.rs): 8 predicate combinations") {
    def tk(pred: RpcPredicate): Seq[String] =
      InfluxRpc.tagKeysAcrossTables(manyNulls, pred)
    assert(tk(RpcPredicate()) == Seq("borough", "city", "county", "state"))
    assert(tk(RpcPredicate().withRange(150, 201)) == Seq("city", "state"))
    assert(tk(RpcPredicate().withExpr(col("state") === "MA"))
      == Seq("city", "county", "state"))
    assert(tk(RpcPredicate().withRange(150, 201).withExpr(col("state") === "MA"))
      == Seq("city", "state"))
    assert(tk(RpcPredicate(tables = Some(Set("o2"))))
      == Seq("borough", "city", "state"))
    assert(tk(RpcPredicate(tables = Some(Set("o2"))).withRange(150, 201))
      == Seq("city", "state"))
    assert(tk(RpcPredicate(tables = Some(Set("o2"))).withExpr(col("state") === "NY"))
      == Seq("borough", "city", "state"))
    assert(tk(RpcPredicate(tables = Some(Set("o2"))).withRange(1, 550)
      .withExpr(col("state") === "NY")) == Seq("city", "state"))
  }

  test("field_columns matrix (field_columns.rs): pred and ts-pred cases") {
    val many = twoChunk(
      Seq("h2o,state=MA,city=Boston temp=70.4 50",
        "h2o,state=MA,city=Boston other_temp=70.4 250",
        "h2o,state=CA,city=Boston other_temp=72.4 350",
        "o2,state=MA,city=Boston temp=53.4,reading=51 50",
        "o2,state=CA temp=79.0 300"),
      Seq("h2o,state=MA,city=Boston temp=70.4,moisture=43.0 100000"))
    def fc(df: org.apache.spark.sql.DataFrame, pred: RpcPredicate) =
      InfluxRpc.fieldColumns(df, pred).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (field, type, last non-null timestamp), sorted by field
    assert(fc(many("h2o"), RpcPredicate().withExpr(col("state") === "MA")) == Seq(
      ("moisture", "double", 100000L),
      ("other_temp", "double", 250L),
      ("temp", "double", 100000L)))
    assert(fc(many("h2o"), RpcPredicate().withRange(200, 300)
      .withExpr(col("state") === "MA")) == Seq(("other_temp", "double", 250L)))
    // no rows under the predicate: empty list
    assert(fc(many("h2o"), RpcPredicate().withExpr(col("state") === "XX")).isEmpty)
  }

  test("field_columns: empty db and missing-table restriction yield empty lists") {
    // test_field_columns_empty_database: no tables at all
    assert(InfluxRpc.fieldColumnsAcrossTables(Map.empty, RpcPredicate()).isEmpty)
    // test_field_columns_no_predicate: table restriction names a table
    // that doesn't exist -> nothing admitted, even with an expr attached
    val many = LineProtocol.ingest(spark, Seq(
      "h2o,state=MA,city=Boston temp=70.4 50",
      "o2,state=MA,city=Boston temp=53.4,reading=51 50"))
    val pred = RpcPredicate(tables = Some(Set("NoSuchTable")))
      .withExpr(col("state") === "MA")
    assert(InfluxRpc.fieldColumnsAcrossTables(many, pred).isEmpty)
    // and the merge keeps the max last-timestamp per field name
    val merged = InfluxRpc.fieldColumnsAcrossTables(many, RpcPredicate())
    assert(merged == Seq(("reading", "double", 50L), ("temp", "double", 50L)))
    // a field whose TYPE differs across tables is an error, not two
    // silently coexisting entries (into_fieldlist merge, fieldlist.rs:160)
    val clash = LineProtocol.ingest(spark, Seq(
      "h2o,state=MA temp=70.4 50",
      "o2,state=MA temp=53i 50"))
    val e = intercept[IllegalStateException](
      InfluxRpc.fieldColumnsAcrossTables(clash, RpcPredicate()))
    assert(e.getMessage.contains("inconsistent field types for 'temp'"))
  }

  test("field_name_plan: dedup applies before field_columns (field_columns.rs:119)") {
    // OneMeasurementManyFields (scenarios.rs:591): three writes to the SAME
    // primary key at time=100; last-non-null per field must win before the
    // field list is computed, and field4 (t=1000) is outside [0,200)
    val df = LineProtocol.ingest(spark, Seq(
      "h2o,tag1=foo,tag2=bar field1=70.6,field3=2 100",
      "h2o,tag1=foo,tag2=bar field1=70.4,field2=\"ss\" 100",
      "h2o,tag1=foo,tag2=bar field1=70.5,field2=\"ss\" 100",
      "h2o,tag1=foo,tag2=bar field1=70.6,field4=true 1000"))("h2o")
      .withColumn(Upsert.ArrivalCol, monotonically_increasing_id())
    val deduped = Upsert.dedup(df,
      pkCols = Seq("tag1", "tag2", "time"), seqCol = Upsert.ArrivalCol)
    val got = InfluxRpc.fieldColumns(deduped, RpcPredicate().withRange(0, 200))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got == Seq(
      ("field1", "double", 100L), ("field2", "string", 100L),
      ("field3", "double", 100L)))
    // the deduped row carries the LAST field1 write (70.5, not 70.6/70.4)
    val row = deduped.filter(col("time") === 100L).head()
    assert(row.getAs[Double]("field1") == 70.5)
  }

  test("tag_keys end-to-end fixture (tag_keys.rs:122)") {
    // EndToEndTest (scenarios.rs:612): five measurements, mixed tag sets
    val db = LineProtocol.ingest(spark, Seq(
      "cpu_load_short,host=server01,region=us-west value=0.64 0",
      "cpu_load_short,host=server01 value=27.99 1000",
      "cpu_load_short,host=server02,region=us-west value=3.89 2000",
      "cpu_load_short,host=server01,region=us-east value=1234567.891011 3000",
      "cpu_load_short,host=server01,region=us-west value=0.000003 4000",
      "system,host=server03 uptime=1303385 5000",
      "swap,host=server01,name=disk0 in=3,out=4 6000",
      "status active=t 7000",
      "attributes color=\"blue\" 8000"))
    val pred = RpcPredicate().withRange(0, 10000)
      .withExpr(col("host") === "server01")
    assert(InfluxRpc.tagKeysAcrossTables(db, pred)
      == Seq("host", "name", "region"))
  }

  test("no-data scenarios: every operator returns empty, never errors") {
    // the reference's *_no_data_no_pred cases (NoData setup) run each
    // operator against an empty db
    val empty = Map.empty[String, DataFrame]
    assert(InfluxRpc.tableNames(empty, RpcPredicate()) == Nil)
    assert(InfluxRpc.tagKeysAcrossTables(empty, RpcPredicate()) == Nil)
    assert(InfluxRpc.tagValuesAcrossTables(empty, "state", RpcPredicate()) == Nil)
    assert(InfluxRpc.fieldColumnsAcrossTables(empty, RpcPredicate()).isEmpty)
    // an ingested-but-empty table: no rows, full schema
    val h2o = LineProtocol.ingest(spark,
      Seq("h2o,state=MA temp=70.4 100"))("h2o").filter(lit(false))
    assert(InfluxRpc.readFilter(h2o, RpcPredicate()).count() == 0)
    assert(InfluxRpc.readGroup(h2o, RpcPredicate(), AggKind.Sum).count() == 0)
    assert(InfluxRpc.readWindowAggregate(h2o, RpcPredicate(), AggKind.Mean,
      everyNs = 100L).count() == 0)
  }

  test("table_names matrix (table_names.rs): range boundary cases") {
    val two = LineProtocol.ingest(spark, Seq(
      "cpu,region=west user=23.2 100",
      "cpu,region=west user=21.0 150",
      "disk,region=east bytes=99i 200"))
    assert(InfluxRpc.tableNames(two, RpcPredicate()) == Seq("cpu", "disk"))
    assert(InfluxRpc.tableNames(two, RpcPredicate().withRange(0, 201)) == Seq("cpu", "disk"))
    assert(InfluxRpc.tableNames(two, RpcPredicate().withRange(0, 200)) == Seq("cpu"))
    assert(InfluxRpc.tableNames(two, RpcPredicate().withRange(50, 101)) == Seq("cpu"))
    assert(InfluxRpc.tableNames(two, RpcPredicate().withRange(250, 300)) == Nil)
  }

  // -------------------------------------------------- read_window_aggregate

  test("read_window_aggregate: 200ns windows, stop-bound labels (mean)") {
    // MeasurementForWindowAggregate (read_window_aggregate.rs:94)
    val h2o = twoChunk(
      Seq("h2o,state=MA,city=Boston temp=70.0 100",
        "h2o,state=MA,city=Boston temp=71.0 200",
        "h2o,state=MA,city=Boston temp=72.0 300",
        "h2o,state=MA,city=Boston temp=73.0 400",
        "h2o,state=MA,city=Boston temp=74.0 500",
        "h2o,state=MA,city=Cambridge temp=80.0 100",
        "h2o,state=MA,city=Cambridge temp=81.0 200"),
      Seq("h2o,state=MA,city=Cambridge temp=82.0 300",
        "h2o,state=MA,city=Cambridge temp=83.0 400",
        "h2o,state=MA,city=Cambridge temp=84.0 500",
        "h2o,state=CA,city=LA temp=90.0 100",
        "h2o,state=CA,city=LA temp=91.0 200",
        "h2o,state=CA,city=LA temp=92.0 300",
        "h2o,state=CA,city=LA temp=93.0 400",
        "h2o,state=CA,city=LA temp=94.0 500"))("h2o")
    val pred = RpcPredicate().withRange(100, 450)
      .withExpr(col("city") === "Boston" || col("city") === "LA")
    val got = InfluxRpc.readWindowAggregate(h2o, pred, AggKind.Mean, everyNs = 200L)
      .select("city", "state", "time", "temp")
    assert(rows(got) == Seq(
      Seq("Boston", "MA", 200L, 70.0),
      Seq("Boston", "MA", 400L, 71.5),
      Seq("Boston", "MA", 600L, 73.0),
      Seq("LA", "CA", 200L, 90.0),
      Seq("LA", "CA", 400L, 91.5),
      Seq("LA", "CA", 600L, 93.0)))
  }

  test("read_window_aggregate: month windows label with next month start") {
    // MeasurementForWindowAggregateMonths (read_window_aggregate.rs:156)
    val h2o = LineProtocol.ingest(spark, Seq(
      "h2o,state=MA,city=Boston temp=70.0 1583020800000000000",
      "h2o,state=MA,city=Boston temp=71.0 1583107920000000000",
      "h2o,state=MA,city=Boston temp=72.0 1585699200000000000",
      "h2o,state=MA,city=Boston temp=73.0 1585785600000000000"))("h2o")
    val got = InfluxRpc.readWindowAggregateMonths(h2o, RpcPredicate(),
      AggKind.Mean, everyMonths = 1).select("city", "state", "time", "temp")
    assert(rows(got) == Seq(
      Seq("Boston", "MA", 1585699200000000000L, 70.5), // 2020-04-01
      Seq("Boston", "MA", 1588291200000000000L, 72.5))) // 2020-05-01
  }

  test("read_filter plan order: null tags sort first and are omitted from keys") {
    // MeasurementsSortableTags (read_filter.rs:359)
    val h2o = LineProtocol.ingest(spark, Seq(
      "h2o,zz_tag=A,state=MA,city=Kingston temp=70.1 800",
      "h2o,state=MA,city=Kingston,zz_tag=B temp=70.2 100",
      "h2o,state=CA,city=Boston temp=70.3 250",
      "h2o,state=MA,city=Boston,zz_tag=A temp=70.4 1000",
      "h2o,state=MA,city=Boston temp=70.5,other=5.0 250"))("h2o")
    val ss = seriesOf(h2o, Seq("other", "temp"))
    // null zz_tag is ABSENT from the key (not an empty string)
    assert(ss.map(s => (s.tags.get("city"), s.tags.get("state"),
        s.tags.get("zz_tag"), s.field)) == Seq(
      (Some("Boston"), Some("CA"), None, "temp"),
      (Some("Boston"), Some("MA"), None, "other"),
      (Some("Boston"), Some("MA"), None, "temp"),
      (Some("Boston"), Some("MA"), Some("A"), "temp"),
      (Some("Kingston"), Some("MA"), Some("A"), "temp"),
      (Some("Kingston"), Some("MA"), Some("B"), "temp")))
    // the all-null `other` field produced no series for the other keys
    assert(ss.count(_.field == "other") == 1)
    assert(pts(ss(1)) == Seq((250L, 5.0)))
  }
}
