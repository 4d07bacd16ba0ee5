package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.RpcPredicate
import graft.operators.{InfluxRpc, Upsert}
import graft.operators.InfluxRpc.AggKind
import graft.sources.LineProtocol
import graft.streaming.Ingest

/** Scenario-matrix tests (reference query_tests/src/scenarios.rs): ONE
  * logical dataset materialized in several chunk placements — in-memory,
  * single parquet, split parquet chunks, overlapping chunks needing
  * dedup, hot-over-cold view — and every query must return identical
  * results across all of them. This is the reference's core testing idea:
  * storage placement is invisible to query semantics.
  */
class ScenarioMatrixSpec extends SparkSpec {
  import spark.implicits._

  // TwoMeasurementsManyNulls-flavored dataset (scenarios.rs:322)
  private val lines = Seq(
    "h2o,state=CA,city=LA temp=90.0 100",
    "h2o,state=CA,city=SF temp=79.0,humid=0.5 200",
    "h2o,state=MA,city=Boston temp=50.4 250",
    "h2o,state=MA temp=70.4 300")

  private lazy val mem = LineProtocol.ingest(spark, lines)("h2o")

  /** All placements of the same logical rows. */
  private lazy val scenarios: Seq[(String, DataFrame)] = {
    val tmp = Files.createTempDirectory("graft-scenarios").toString

    // single parquet file
    mem.coalesce(1).write.parquet(s"$tmp/single")
    val single = reTag(spark.read.parquet(s"$tmp/single"))

    // two disjoint chunks
    mem.filter($"time" <= 200).write.parquet(s"$tmp/c1")
    mem.filter($"time" > 200).write.parquet(s"$tmp/c2")
    val split = Upsert.scanWithDedup(Seq(
      (reTag(spark.read.parquet(s"$tmp/c1")), (100L, 200L), true),
      (reTag(spark.read.parquet(s"$tmp/c2")), (250L, 300L), true)),
      pkCols = Seq("city", "state", "time"))

    // overlapping chunks: chunk2 re-writes (CA, LA, 100) with a stale
    // value, then the real rows; dedup must restore the logical dataset
    val stale = LineProtocol.ingest(spark, Seq(
      "h2o,state=CA,city=LA temp=-1.0 100"))("h2o")
    val overlapping = Upsert.scanWithDedup(Seq(
      (stale.withColumn("humid", lit(null).cast("double")), (100L, 100L), true),
      (mem, (100L, 300L), true)),
      pkCols = Seq("city", "state", "time"))

    // hot-over-cold: cold holds the stale row, hot holds everything
    val hotCold = Ingest.hotColdView(
      hot = mem,
      cold = stale.withColumn("humid", lit(null).cast("double")),
      pkCols = Seq("city", "state", "time"))

    Seq("memory" -> mem, "single_parquet" -> single, "split_chunks" -> split,
      "overlap_dedup" -> overlapping, "hot_cold" -> hotCold)
  }

  /** Parquet round-trips drop StructField metadata; restore categories. */
  private def reTag(df: DataFrame): DataFrame =
    spark.createDataFrame(df.select("state", "city", "temp", "humid", "time").rdd,
      org.apache.spark.sql.types.StructType(Seq(
        graft.core.IoxSchema.tagged("state", org.apache.spark.sql.types.StringType, graft.core.IoxSchema.Tag),
        graft.core.IoxSchema.tagged("city", org.apache.spark.sql.types.StringType, graft.core.IoxSchema.Tag),
        graft.core.IoxSchema.tagged("temp", org.apache.spark.sql.types.DoubleType, graft.core.IoxSchema.Field),
        graft.core.IoxSchema.tagged("humid", org.apache.spark.sql.types.DoubleType, graft.core.IoxSchema.Field),
        graft.core.IoxSchema.tagged("time", org.apache.spark.sql.types.LongType, graft.core.IoxSchema.Time))))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("readFilter is placement-invariant") {
    val expected = canon(InfluxRpc.readFilter(
      reTag(mem.select("state", "city", "temp", "humid", "time")), RpcPredicate()))
    for ((name, df) <- scenarios) {
      val got = canon(InfluxRpc.readFilter(
        reTag(df.select("state", "city", "temp", "humid", "time")), RpcPredicate()))
      assert(got == expected, s"scenario $name diverged")
    }
  }

  test("readGroup sum is placement-invariant") {
    val expected = canon(InfluxRpc.readGroup(
      reTag(mem.select("state", "city", "temp", "humid", "time")), RpcPredicate(), AggKind.Sum))
    for ((name, df) <- scenarios) {
      val got = canon(InfluxRpc.readGroup(
        reTag(df.select("state", "city", "temp", "humid", "time")), RpcPredicate(), AggKind.Sum))
      assert(got == expected, s"scenario $name diverged")
    }
  }

  test("schema merge: chunks with different column sets union correctly") {
    // MultiChunkSchemaMerge (scenarios.rs:301): a later chunk adds a
    // column earlier chunks lack; absent values read as null
    val chunk1 = LineProtocol.ingest(spark, Seq(
      "m,host=a cpu=1.0 10"))("m")
    val chunk2 = LineProtocol.ingest(spark, Seq(
      "m,host=b,core=c1 cpu=2.0,mem=512.0 20"))("m")
    assert(graft.core.IoxSchema.mergeConflicts(chunk1.schema, chunk2.schema).isEmpty)
    val merged = graft.core.IoxSchema.mergeUnion(Seq(chunk1, chunk2))
      .orderBy("time")
    assert(merged.columns.toSet == Set("host", "core", "cpu", "mem", "time"))
    val rows = merged.collect()
    assert(rows(0).getAs[String]("core") == null)
    assert(rows(0).isNullAt(rows(0).fieldIndex("mem")))
    assert(rows(1).getAs[Double]("mem") == 512.0)
    // a type conflict is detected, not silently coerced
    val bad = LineProtocol.ingest(spark, Seq("m,host=c cpu=9i 30"))("m")
    assert(graft.core.IoxSchema.mergeConflicts(chunk1.schema, bad.schema).nonEmpty)
  }

  test("tag_values is placement-invariant") {
    for ((name, df) <- scenarios) {
      val got = InfluxRpc.tagValues(
        reTag(df.select("state", "city", "temp", "humid", "time")),
        "city", RpcPredicate()).as[String].collect().toSeq
      assert(got == Seq("Boston", "LA", "SF"), s"scenario $name diverged")
    }
  }

  // ------------------------------------------------- full operator matrix

  /** Run `q` over every placement and require identical canonical output.
    * This is the runner pattern of the reference's query_tests/src/runner:
    * each influxrpc operator variant × each chunk placement, one expected
    * answer. */
  private def assertInvariant(opName: String)(q: DataFrame => DataFrame): Unit = {
    val expected = canon(q(reTag(mem.select("state", "city", "temp", "humid", "time"))))
    assert(expected.nonEmpty, s"$opName: empty baseline result")
    for ((name, df) <- scenarios) {
      val got = canon(q(reTag(df.select("state", "city", "temp", "humid", "time"))))
      assert(got == expected, s"$opName diverged on placement $name")
    }
  }

  private val rangePred = RpcPredicate().withRange(150L, 300L)

  test("read_filter with range+tag predicate is placement-invariant") {
    assertInvariant("read_filter/range")(InfluxRpc.readFilter(_, rangePred))
    assertInvariant("read_filter/tag-eq")(df =>
      InfluxRpc.readFilter(df, RpcPredicate(exprs = Seq($"state" === "CA"))))
    assertInvariant("read_filter/fields")(df =>
      InfluxRpc.readFilter(df, RpcPredicate(fieldColumns = Some(Seq("temp")))))
  }

  test("read_group is placement-invariant for every aggregate kind") {
    val kinds: Seq[(String, AggKind)] = Seq(
      "sum" -> AggKind.Sum, "count" -> AggKind.Count, "mean" -> AggKind.Mean,
      "min" -> AggKind.Min, "max" -> AggKind.Max,
      "first" -> AggKind.First, "last" -> AggKind.Last,
      "none" -> AggKind.None)
    for ((kn, kind) <- kinds)
      assertInvariant(s"read_group/$kn")(
        InfluxRpc.readGroup(_, RpcPredicate(), kind, groupCols = Seq("state")))
  }

  test("read_window_aggregate fixed and month windows are placement-invariant") {
    for ((kn, kind) <- Seq("sum" -> AggKind.Sum, "mean" -> AggKind.Mean,
        "last" -> AggKind.Last)) {
      assertInvariant(s"window_agg/$kn")(
        InfluxRpc.readWindowAggregate(_, RpcPredicate(), kind, everyNs = 100L))
      assertInvariant(s"window_agg_offset/$kn")(
        InfluxRpc.readWindowAggregate(_, RpcPredicate(), kind,
          everyNs = 100L, offsetNs = 50L))
    }
    assertInvariant("window_agg_months/sum")(
      InfluxRpc.readWindowAggregateMonths(_, RpcPredicate(), AggKind.Sum,
        everyMonths = 1))
  }

  test("metadata operators are placement-invariant") {
    for ((name, df0) <- scenarios) {
      val df = reTag(df0.select("state", "city", "temp", "humid", "time"))
      assert(InfluxRpc.tagKeys(df, RpcPredicate()) == Seq("city", "state"),
        s"tag_keys diverged on $name")
      // a time-range predicate restricts which series contribute keys
      assert(InfluxRpc.tagKeys(df, RpcPredicate().withRange(300L, 301L))
        == Seq("state"), s"tag_keys/range diverged on $name")
      val fc = InfluxRpc.fieldColumns(df, RpcPredicate()).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(fc == Seq(("humid", "double", 200L), ("temp", "double", 300L)),
        s"field_columns diverged on $name")
      assert(InfluxRpc.seriesCardinality(df, RpcPredicate()) == 4L,
        s"series_cardinality diverged on $name")
      assert(InfluxRpc.seriesCardinality(df, RpcPredicate(), exact = false) == 4L,
        s"series_cardinality/hll diverged on $name")
      assert(InfluxRpc.tableNames(Map("h2o" -> df), RpcPredicate()) == Seq("h2o"),
        s"table_names diverged on $name")
      assert(InfluxRpc.tableNames(Map("h2o" -> df),
        RpcPredicate().withRange(900L, 999L)).isEmpty,
        s"table_names/empty-range diverged on $name")
    }
  }

  test("InfluxQL function layer is placement-invariant") {
    // the r5 function layer under the same runner as the storage
    // operators: series transforms, gap filling, and the InfluxQL
    // aggregates each produce one answer regardless of chunk placement.
    // Float-accumulating outputs round to 6 decimals (4 for the integral)
    // so a placement-dependent partial-aggregation order cannot flip a
    // last bit into a spurious divergence.
    import graft.functions.{InfluxAggregates => IA, SeriesFunctions => SF}
    import graft.operators.GapFill
    val keys = Seq("state", "city")
    assertInvariant("difference")(SF.difference(_, keys, "time", "temp", "d"))
    assertInvariant("derivative")(df =>
      SF.derivative(df, keys, "time", "temp", 100L, "d")
        .withColumn("d", round($"d", 6)))
    assertInvariant("moving_average")(df =>
      SF.movingAverage(df, keys, "time", "temp", 2, "ma")
        .withColumn("ma", round($"ma", 6)))
    assertInvariant("cumulative_sum")(SF.cumulativeSum(_, keys, "time", "temp", "cs"))
    assertInvariant("elapsed")(SF.elapsed(_, keys, "time", "e"))
    assertInvariant("non_negative_difference")(
      SF.nonNegativeDifference(_, keys, "time", "temp", "d"))
    assertInvariant("ema")(df =>
      SF.exponentialMovingAverage(df, keys, "time", "temp", 0.5, "ema")
        .withColumn("ema", round($"ema", 6)))
    assertInvariant("gapfill_previous")(df =>
      GapFill.bucketAndFill(df, keys, "time", 100L, 350L, 50L,
        Seq(avg($"temp").as("temp")), Map("temp" -> GapFill.Previous)))
    assertInvariant("gapfill_linear")(df =>
      GapFill.bucketAndFill(df, keys, "time", 100L, 350L, 50L,
        Seq(avg($"temp").as("temp")), Map("temp" -> GapFill.Linear))
        .withColumn("temp", round($"temp", 6)))
    assertInvariant("spread")(df =>
      df.groupBy("state").agg(round(IA.spread($"temp"), 6).as("sp")))
    assertInvariant("stddev")(df =>
      df.groupBy("state").agg(round(IA.stddev($"temp"), 6).as("sd")))
    assertInvariant("mode")(IA.mode(_, Seq("state"), "city", "md"))
    assertInvariant("percentile")(IA.percentile(_, Seq("state"), "temp", 50, "p"))
    assertInvariant("median")(df =>
      IA.median(df, Seq("state"), "temp", "med")
        .withColumn("med", round($"med", 6)))
    assertInvariant("integral")(df =>
      IA.integral(df, Seq("state"), "time", "temp", 100L, "ig")
        .withColumn("ig", round($"ig", 4)))
    assertInvariant("top")(IA.topN(_, Seq("state"), "time", "temp", 1))
    assertInvariant("histogram")(IA.histogram(_, Seq("state"), "temp",
      Seq(60.0, 100.0)))
  }

  test("r6 smoothers and the InfluxQL planner are placement-invariant") {
    // the adaptive/recursive smoothers (mapPartitions scans, not window
    // frames) and query TEXT through the InfluxQL planner under the same
    // runner: chunk placement must stay invisible to both. State-keyed
    // series give every key two points, enough to exit each warm-up.
    import graft.functions.{SeriesFunctions => SF}
    import graft.operators.{InfluxMeasurement, InfluxQlPlanner}
    val keys = Seq("state")
    assertInvariant("cmo")(df =>
      SF.chandeMomentumOscillator(df, keys, "time", "temp", 1, "c")
        .withColumn("c", round($"c", 6)))
    assertInvariant("ker")(df =>
      SF.kaufmanEfficiencyRatio(df, keys, "time", "temp", 1, "k")
        .withColumn("k", round($"k", 6)))
    assertInvariant("kama")(df =>
      SF.kaufmanAdaptiveMovingAverage(df, keys, "time", "temp", 1, "k")
        .withColumn("k", round($"k", 6)))
    assertInvariant("trix")(df =>
      SF.tripleExponentialDerivative(df, keys, "time", "temp", 1, "t2")
        .withColumn("t2", round($"t2", 6)))
    assertInvariant("rsi")(df =>
      SF.relativeStrengthIndex(df, keys, "time", "temp", 1, "r")
        .withColumn("r", round($"r", 6)))
    assertInvariant("dema_tema")(df =>
      SF.demaTema(df, keys, "time", "temp", 0.5, "d", "t3")
        .withColumn("d", round($"d", 6)).withColumn("t3", round($"t3", 6)))
    assertInvariant("influxql_planner")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT count(temp), spread(temp), first(temp), last(temp) " +
        "FROM m GROUP BY state")
      .withColumn("spread", round($"spread", 6)))
    assertInvariant("influxql_planner_transform")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT difference(temp) FROM m GROUP BY state"))
    // r8 forms: bucketed whole-operators, tag-grouped selectors,
    // scalar-over-aggregate — placement must stay invisible to all
    assertInvariant("influxql_percentile_bucketed")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT percentile(temp, 50) AS p FROM m " +
        "WHERE time >= 0 AND time < 400 GROUP BY time(150ns), state fill(none)"))
    assertInvariant("influxql_top_tag")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT TOP(temp, state, 2) AS best FROM m"))
    assertInvariant("influxql_top_bucketed")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT top(temp, 1) FROM m WHERE time >= 0 AND time < 400 " +
        "GROUP BY time(150ns), state"))
    assertInvariant("influxql_scalar_over_agg")(df => InfluxQlPlanner.run(
      Map("m" -> InfluxMeasurement(df, "time", Seq("state", "city"))),
      "SELECT round(mean(temp)) AS rm FROM m GROUP BY state"))
  }

  test("series-set wire shape is placement-invariant") {
    def seriesOf(df: DataFrame) = InfluxRpc.toSeriesSet(
      InfluxRpc.readFilter(df, RpcPredicate()), Seq("temp", "humid"))
      .collect().toSeq
    val expected = seriesOf(reTag(mem.select("state", "city", "temp", "humid", "time")))
    assert(expected.nonEmpty)
    for ((name, df) <- scenarios) {
      val got = seriesOf(reTag(df.select("state", "city", "temp", "humid", "time")))
      assert(got == expected, s"series set diverged on placement $name")
    }
  }
}
