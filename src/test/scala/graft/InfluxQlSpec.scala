package graft

import org.apache.spark.sql.functions._
import graft.core.InfluxQl
import graft.core.InfluxQl._
import graft.operators.{InfluxMeasurement, InfluxQlPlanner}

class InfluxQlSpec extends SparkSpec {
  import spark.implicits._

  // two series over 40s of ns-time, one field
  private lazy val fixture = Seq(
    ("a", 0L, 1.0), ("a", 10000000000L, 3.0), ("a", 20000000000L, 2.0),
    ("a", 30000000000L, 6.0),
    ("b", 5000000000L, 10.0), ("b", 15000000000L, 20.0),
    ("b", 35000000000L, 40.0)
  ).toDF("host", "t", "value")

  private lazy val ms = Map("cpu" ->
    InfluxMeasurement(fixture, "t", Seq("host")))

  private def run(q: String) = InfluxQlPlanner.run(ms, q)

  // ------------------------------------------------------------- parser

  test("parse: full clause coverage") {
    val sel = InfluxQl.parse(
      """SELECT mean("value") AS m, count(value) FROM cpu
         WHERE time >= 0 AND time < 40000000000 AND host != 'c'
         GROUP BY time(10s, 2s), host fill(previous)
         ORDER BY time DESC LIMIT 10 OFFSET 2;""")
    assert(sel.projs == List(
      (Call("mean", List(Ref("value"))), Some("m")),
      (Call("count", List(Ref("value"))), None)))
    assert(sel.from == "cpu")
    assert(sel.groupTime.contains(GroupTime(10000000000L, 2000000000L)))
    assert(sel.groupTags == List("host"))
    assert(sel.fill == FillPrevious)
    assert(sel.timeDesc && sel.limit.contains(10) && sel.offset.contains(2))
  }

  test("parse: durations, regex, star, defaults") {
    val sel = InfluxQl.parse(
      "select * from m where host =~ /^(?P<g>web)-[0-9]+$/ group by *")
    assert(sel.projs == List((Star, None)))
    assert(sel.groupStar && sel.fill == FillNull)
    assert(sel.where.contains(
      Bin("=~", Ref("host"), ReLit("^(?P<g>web)-[0-9]+$"))))
    assert(InfluxQl.parse("select f from m group by time(1m)").groupTime
      .contains(GroupTime(60000000000L, 0L)))
    assert(InfluxQl.parse("select f from m group by time(500ms)").groupTime
      .contains(GroupTime(500000000L, 0L)))
  }

  test("now(): folds to the supplied clock; rejected without one") {
    // clock at t=21s: now() - 20s keeps the five rows with t > 1s and
    // t < now() (1.x also bounds raw selects at now)
    val got = InfluxQlPlanner.run(ms,
      "select value from cpu where time > now() - 20s and time < now()",
      nowNs = Some(21000000000L))
      .select("time", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(got.toSeq == Seq((5000000000L, 10.0), (10000000000L, 3.0),
      (15000000000L, 20.0), (20000000000L, 2.0)))
    // duration+duration and ts+duration arithmetic folds too
    assert(InfluxQlPlanner.run(ms,
      "select value from cpu where time >= 10000000000 + 5s " +
        "and time < now() - 1s - 4s",
      nowNs = Some(40000000000L)).count() == 3) // t=15s, 20s, 30s
    // one now() per statement, subqueries included
    assert(InfluxQlPlanner.run(ms,
      "select max(m) from (select mean(value) as m from cpu " +
        "where time < now() group by host)",
      nowNs = Some(21000000000L)).count() == 1)
    val e = intercept[ParseError](run(
      "select value from cpu where time >= now() - 1h")).getMessage
    assert(e.contains("now()") && e.contains("clock"))
  }

  test("holt_winters with a seasonal period: deterministic triple " +
      "smoothing over the bucketed frame") {
    // host a buckets (10s grid): 1, 3, 2, 6. S=2, α=β=γ=0.5:
    // init l=2 b=1 ring=[-1,1]; t2: l=3 b=1 ring0=-1; t3: l=4.5 b=1.25
    // ring1=1.25; forecasts: 4.5+1.25-1=4.75 @40s, 4.5+2.5+1.25=8.25 @50s
    val fc = run("""SELECT holt_winters(mean(value), 2, 2, 0.5, 0.5, 0.5)
        AS hw FROM cpu WHERE host = 'a' AND time >= 0
        AND time < 40000000000 GROUP BY time(10s)""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(fc == Seq((40000000000L, 4.75), (50000000000L, 8.25)))
    // with_fit prepends the one-step predictions from t = S on
    val wf = run("""SELECT holt_winters_with_fit(mean(value), 1, 2,
          0.5, 0.5, 0.5) AS hw
        FROM cpu WHERE host = 'a' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s)""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(wf == Seq((20000000000L, 2.0), (30000000000L, 5.0),
      (40000000000L, 4.75)))
    // S = 1 is a contradiction and says so; S < 0 rejects
    assert(intercept[ParseError](run(
      "SELECT holt_winters(mean(value), 2, 1) FROM cpu GROUP BY time(10s)"))
      .getMessage.contains("seasonality"))
  }

  test("parse: rejections carry the reason") {
    def err(q: String): String =
      intercept[ParseError](run(q)).getMessage
    assert(err("select value from cpu where time >= 0 or host = 'a'")
      .contains("AND"))
    assert(err("select value, mean(value) from cpu").contains("mixing"))
    assert(err("select mean(value) from nope").contains("unknown measurement"))
    assert(err("select mean(missing) from cpu").contains("unknown field"))
    assert(err("select value from cpu limit x").contains("LIMIT"))
  }

  test("upstream parser corpus: compound durations, identifier/regex/" +
      "string escapes (influxql parser_test.go vectors)") {
    // ParseDuration: "1h30m" is ONE 5400 s literal; segments sum
    assert(InfluxQl.parse("select f from m group by time(1m30s)").groupTime
      .contains(GroupTime(90000000000L, 0L)))
    assert(InfluxQl.parse("select f from m group by time(1h30m, 15m)").groupTime
      .contains(GroupTime(5400000000000L, 900000000000L)))
    assert(InfluxQl.parse("select f from m group by time(1d12h)").groupTime
      .contains(GroupTime(129600000000000L, 0L)))
    // micro spellings: 1u == 1µ == 1000 ns
    assert(InfluxQl.parse("select f from m group by time(500u)").groupTime
      .contains(GroupTime(500000L, 0L)))
    assert(InfluxQl.parse("select f from m group by time(500µ)").groupTime
      .contains(GroupTime(500000L, 0L)))
    // compound duration in a now() offset
    assert(InfluxQl.parse(
      "select f from m where time > now() - 1h30m").where.contains(
      Bin(">", Ref("time"), Bin("-", Call("now", Nil), DurLit(5400000000000L)))))
    // a trailing unitless run does NOT fold in ("1h30" is not upstream-
    // parseable as one duration; the 30 lexes apart and the grammar
    // rejects it downstream)
    intercept[ParseError](
      InfluxQl.parse("select f from m group by time(1h30)"))
    // quoted identifiers: \" and \\ escapes (scanString over IDENT)
    val esc = InfluxQl.parse("""select "va\"lue" from "m\\x"""")
    assert(esc.projs == List((Ref("va\"lue"), None)))
    assert(esc.from == "m\\x")
    // identifiers may hold spaces and keyword spellings when quoted
    val kw = InfluxQl.parse("""select "count" from "my measurement"""")
    assert(kw.projs == List((Ref("count"), None)))
    assert(kw.from == "my measurement")
    // regex literal: \/ unescapes to a slash, everything else verbatim
    assert(InfluxQl.parse("""select f from m where host =~ /a\/b[0-9]+/""")
      .where.contains(Bin("=~", Ref("host"), ReLit("a/b[0-9]+"))))
    // string literal: \' escape
    assert(InfluxQl.parse("""select f from m where host = 'it\'s'""")
      .where.contains(Bin("=", Ref("host"), StrLit("it's"))))
    // <> is the != alias
    assert(InfluxQl.parse("select f from m where host <> 'a'")
      .where.contains(Bin("!=", Ref("host"), StrLit("a"))))
    // fully-qualified INTO targets (db.rp.m / rp.m / db..m) keep the
    // bare measurement in `into` and the qualifiers beside it
    val q3 = InfluxQl.parse(
      """select mean(v) as v into "mydb"."autogen".cpu_1h from cpu""")
    assert(q3.into.contains("cpu_1h") && q3.intoDb.contains("mydb") &&
      q3.intoRp.contains("autogen"))
    val q2p = InfluxQl.parse("select v into autogen.t from m")
    assert(q2p.into.contains("t") && q2p.intoRp.contains("autogen") &&
      q2p.intoDb.isEmpty)
    val qdd = InfluxQl.parse("select v into mydb..t from m")
    assert(qdd.into.contains("t") && qdd.intoDb.contains("mydb") &&
      qdd.intoRp.isEmpty)
    // dotted FROM folds to the bare measurement (single-db planner)
    assert(InfluxQl.parse("""select f from "mydb"."autogen".m""").from == "m")
    assert(InfluxQl.parse("select f from mydb..m, autogen.n").fromMore ==
      List("n"))
  }

  // ------------------------------------------------------------ planner

  test("raw select: time rename, predicate, desc order, limit/offset") {
    val rows = run("""SELECT value FROM cpu WHERE host = 'a'
        AND time >= 0 AND time < 25000000000
        ORDER BY time DESC LIMIT 2""")
      .as[(Long, Double)].collect().toSeq
    assert(rows == Seq((20000000000L, 2.0), (10000000000L, 3.0)))
    val off = run("SELECT value FROM cpu WHERE host = 'a' ORDER BY time LIMIT 2 OFFSET 1")
      .as[(Long, Double)].collect().toSeq
    assert(off == Seq((10000000000L, 3.0), (20000000000L, 2.0)))
  }

  test("aggregates with GROUP BY time + tag and default fill(null)") {
    val rows = run("""SELECT mean(value), count(value) FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY time(20s), host""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    // host b has no point in [20s,40s)? it has 35s -> both buckets observed;
    // all four (host, bucket) pairs appear
    assert(rows == Seq(
      (0L, "a", Some(2.0), Some(2L)),
      (20000000000L, "a", Some(4.0), Some(2L)),
      (0L, "b", Some(15.0), Some(2L)),
      (20000000000L, "b", Some(40.0), Some(1L))))
  }

  test("fill(previous) materializes empty buckets from the grid") {
    val rows = run("""SELECT sum(value) FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s), host fill(previous)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // b observes 0s(5s), 10s(15s), 30s(35s); 20s bucket carries 20.0 forward
    assert(rows == Seq((0L, "b", 10.0), (10000000000L, "b", 20.0),
      (20000000000L, "b", 20.0), (30000000000L, "b", 40.0)))
  }

  test("selectors first/last ride the same single aggregate") {
    val rows = run("SELECT first(value), last(value) FROM cpu GROUP BY host")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("a", 1.0, 6.0), ("b", 10.0, 40.0)))
  }

  test("repeated functions get InfluxQL _N suffixes; aliases override") {
    val df = run("SELECT mean(value), mean(value), mean(value) AS mm FROM cpu GROUP BY host")
    assert(df.columns.toSeq == Seq("host", "mean", "mean_1", "mm"))
  }

  test("percentile and top execute as whole operators") {
    val p = run("SELECT percentile(value, 50) FROM cpu GROUP BY host")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // a: 4 non-null values k=floor(.5*4+.5)=2 -> 2nd smallest = 2.0
    // b: 3 values k=2 -> 20.0
    assert(p == Seq(("a", 2.0), ("b", 20.0)))
    val t = run("SELECT top(value, 2) FROM cpu GROUP BY host")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(t == Seq((10000000000L, "a", 3.0), (30000000000L, "a", 6.0),
      (15000000000L, "b", 20.0), (35000000000L, "b", 40.0)))
  }

  test("scalar functions wrap aggregates: round(mean), sqrt over ratios") {
    val r = run("SELECT round(mean(value)) AS rm FROM cpu GROUP BY host")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // a: mean(1,3,2,6)=3 -> 3.0; b: mean(10,20,40)=23.33 -> 23.0
    assert(r == Map("a" -> 3.0, "b" -> 23.0))
    val c = run(
      "SELECT sqrt(sum(value) / count(value)) AS s FROM cpu GROUP BY host")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(c("a") - math.sqrt(3.0)) < 1e-12)
    // per-row scalar calls still work unchanged
    val p = run("SELECT abs(value) AS a FROM cpu WHERE host = 'a' LIMIT 1")
      .collect().map(_.getDouble(1)).toSeq
    assert(p == Seq(1.0))
    // multi-arg scalars stay per-row-only, with a reason
    val e = intercept[graft.core.InfluxQl.ParseError] {
      run("SELECT pow(mean(value), 2) AS p FROM cpu")
    }
    assert(e.getMessage.contains("pow"), e.getMessage)
  }

  test("percentile/median with GROUP BY time(): exact per-bucket ranks") {
    val p = run("""SELECT percentile(value, 50) AS p FROM cpu
        WHERE time >= 0 AND time < 40000000000
        GROUP BY time(20s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // a/bucket0 {1,3} k=1 -> 1; a/bucket1 {2,6} -> 2; b/bucket0 {10,20}
    // -> 10; b/bucket1 {40} -> 40
    assert(p == Seq((0L, "a", 1.0), (20000000000L, "a", 2.0),
      (0L, "b", 10.0), (20000000000L, "b", 40.0)))
    // default fill(null) enumerates the bounded grid
    val md = run("""SELECT median(value) AS md FROM cpu
        WHERE time >= 0 AND time < 60000000000 GROUP BY time(20s), host""")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    assert(md.count(_._2 == "a") == 3 && md.count(_._2 == "b") == 3)
    // even-count buckets interpolate; empty trailing buckets fill null
    assert(md.contains((0L, "a", Some(2.0))), md.toString)
    assert(md.contains((20000000000L, "b", Some(40.0))), md.toString)
    assert(md.contains((40000000000L, "a", None)), md.toString)
    assert(md.contains((40000000000L, "b", None)), md.toString)
  }

  test("top and distinct under GROUP BY time(): per-bucket selections") {
    val t = run("""SELECT top(value, 1) FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY time(20s), host""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // per (host, 20s bucket) the max point keeps its OWN timestamp
    assert(t == Seq((10000000000L, "a", 3.0), (30000000000L, "a", 6.0),
      (15000000000L, "b", 20.0), (35000000000L, "b", 40.0)))
    val d = run("""SELECT DISTINCT(value) AS v FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY time(20s), host""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // distinct values per bucket, labeled with the bucket start
    assert(d == Seq((0L, "a", 1.0), (0L, "a", 3.0),
      (20000000000L, "a", 2.0), (20000000000L, "a", 6.0),
      (0L, "b", 10.0), (0L, "b", 20.0), (20000000000L, "b", 40.0)))
  }

  test("top/bottom with a tag key: n best tag values, one best point each") {
    val t = run("SELECT TOP(value, host, 2) AS best FROM cpu")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // host maxes: a -> 6.0@30s, b -> 40.0@35s; both hosts selected,
    // one best point each, output ordered by time
    assert(t == Seq((30000000000L, "a", 6.0), (35000000000L, "b", 40.0)))
    val b = run("SELECT BOTTOM(value, host, 1) AS worst FROM cpu")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // host mins: a -> 1.0@0, b -> 10.0@5s; the single best-ranked tag is a
    assert(b == Seq((0L, "a", 1.0)))
  }

  test("window transforms compose and omit all-null warmup points") {
    val rows = run("""SELECT difference(value), moving_average(value, 2)
        FROM cpu WHERE host = 'a' GROUP BY host""")
      .collect().map(r => (r.getLong(0),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    // first point dropped (both outputs null there)
    assert(rows == Seq(
      (10000000000L, Some(2.0), Some(2.0)),
      (20000000000L, Some(-1.0), Some(2.5)),
      (30000000000L, Some(4.0), Some(4.0))))
  }

  test("derivative honors its unit argument") {
    val rows = run("""SELECT derivative(value, 10s) FROM cpu
        WHERE host = 'a' GROUP BY host""")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(rows == Seq((10000000000L, 2.0), (20000000000L, -1.0),
      (30000000000L, 4.0)))
  }

  test("recursive smoothers: EMA matches the direct operator call") {
    val got = run("SELECT exponential_moving_average(value, 3) FROM cpu GROUP BY host")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2))).toSeq
    val want = graft.functions.SeriesFunctions
      .exponentialMovingAverage(fixture, Seq("host"), "t", "value",
        alpha = 0.5, "exponential_moving_average")
      .orderBy("host", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("transform over aggregate: the downsample-then-rate idiom") {
    // host b: sums per 10s bucket = 10 (0s), 20 (10s), 40 (30s)
    val rows = run("""SELECT derivative(sum(value)) FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // default unit with GROUP BY time is the interval: (20-10)/1, then
    // (40-20) over a 2-interval gap -> 10
    assert(rows == Seq((10000000000L, "b", 10.0), (30000000000L, "b", 10.0)))
    // with fill(previous) the 20s bucket exists (carried 20.0): the 30s
    // step becomes (40-20)/1 interval = 20, and the carried bucket's own
    // derivative is 0
    val filledRows = run("""SELECT derivative(sum(value)) FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s), host fill(previous)""")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(filledRows == Seq((10000000000L, 10.0), (20000000000L, 0.0),
      (30000000000L, 20.0)))
    // mixed select keeps every bucket; the transform column is null on
    // the first one
    val mixed = run("""SELECT mean(value), difference(mean(value)) FROM cpu
        WHERE host = 'a' AND time >= 0 AND time < 40000000000
        GROUP BY time(20s), host""")
    assert(mixed.columns.toSeq ==
      Seq("time", "host", "mean", "difference"))
    val m0 = mixed.collect().map(r =>
      (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq
    assert(m0 == Seq((0L, None), (20000000000L, Some(2.0))))
    // keyless grouping (time only) still plans — constant series key
    val keyless = run("""SELECT cumulative_sum(count(value)) FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY time(20s) fill(none)""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(keyless == Seq((0L, 4L), (20000000000L, 7L)))
    // nesting without GROUP BY time is the upstream error too
    assert(intercept[ParseError](
      run("SELECT derivative(mean(value)) FROM cpu GROUP BY host"))
      .getMessage.contains("GROUP BY time"))
  }

  test("lexer context: negatives and regexes survive the arithmetic grammar") {
    // negative literal after a comparison (not subtraction)
    assert(run("SELECT value FROM cpu WHERE value > -5 AND time >= 0")
      .count() == 7)
    // negative duration offset in GROUP BY time and negative fill value
    assert(InfluxQl.parse(
      "select mean(value) from cpu group by time(10s, -2s)")
      .groupTime.contains(GroupTime(10000000000L, -2000000000L)))
    assert(InfluxQl.parse(
      "select mean(value) from cpu group by time(10s) fill(-1)")
      .fill == FillValue(-1.0))
    // '/' after =~ is still a regex, not division
    assert(run("select value from cpu where host =~ /^a$/").count() == 4)
  }

  test("arithmetic projections: per-row fields and aggregate ratios") {
    // per-row: precedence, parens, division (no longer lexed as regex),
    // and a - with a value on its left
    val pr = run("""SELECT value * 2 + 1 AS x, (value + 1) / 2 AS y,
          value - 1 AS z
        FROM cpu WHERE host = 'a' AND time >= 0 AND time < 15000000000
        ORDER BY time""")
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(pr.toSeq == Seq((3.0, 1.0, 0.0), (7.0, 2.0, 2.0)))
    // scalar functions compose into the expression
    val sf = run("""SELECT sqrt(value) * 2 AS s FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 10000000000""")
      .collect().map(_.getDouble(1))
    assert(sf.toSeq == Seq(math.sqrt(10.0) * 2))
    // aggregate arithmetic, grouped and time-bucketed
    val ag = run("""SELECT sum(value) / count(value) AS m FROM cpu
        GROUP BY host""").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(ag == Map("a" -> 3.0, "b" -> (70.0 / 3)))
    val tb = run("""SELECT max(value) - min(value) AS sp FROM cpu
        WHERE time >= 0 AND time < 40000000000
        GROUP BY time(20s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(tb == Set((0L, "a", 2.0), (20000000000L, "a", 4.0),
      (0L, "b", 10.0), (20000000000L, "b", 0.0)))
    // fill() over aggregate arithmetic: the fill applies to the COMPUTED
    // expression per bucket (1.x). host b has no point in [10s, 20s) or
    // [25s, 30s)... with 5s buckets b observes 5,15,35 only
    val fv = run("""SELECT max(value) - min(value) AS sp FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s) fill(0)""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(fv == Seq((0L, 0.0), (10000000000L, 0.0), (20000000000L, 0.0),
      (30000000000L, 0.0)))
    val fp = run("""SELECT sum(value) / count(value) AS m FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s) fill(previous)""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(fp == Seq((0L, 10.0), (10000000000L, 20.0),
      (20000000000L, 20.0), (30000000000L, 40.0)))
    // default fill(null) enumerates the bounded grid with null buckets
    val fn = run("""SELECT max(value) - min(value) AS sp FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s)""").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq.sorted
    assert(fn == Seq((0L, Some(0.0)), (10000000000L, Some(0.0)),
      (20000000000L, None), (30000000000L, Some(0.0))))
    // two unaliased projections deriving the same name stay addressable
    // (1.x allows them; suffix disambiguation keeps the fill/reproject
    // path unambiguous)
    val dup = run("""SELECT abs(max(value)), abs(min(value)) FROM cpu
        WHERE host = 'a' AND time >= 0 AND time < 40000000000
        GROUP BY time(40s)""")
    assert(dup.columns.toSeq == Seq("time", "abs", "abs_1"))
    assert(dup.collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((6.0, 1.0)))
    // mixing levels and unaliased arithmetic are rejected
    assert(intercept[ParseError](
      run("SELECT value + mean(value) AS x FROM cpu GROUP BY host"))
      .getMessage.contains("arithmetic"))
    assert(intercept[ParseError](run("SELECT value + 1 FROM cpu"))
      .getMessage.contains("AS"))
  }

  test("distinct and count(distinct): field-value cardinality forms") {
    val dv = run("""SELECT distinct(value) AS dv FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY host""")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // host a values {1,3,2,6}; host b {10,20,40} — all distinct already
    assert(dv.size == 7 && dv.distinct.size == 7)
    val dupd = run("SELECT distinct(value) FROM cpu GROUP BY host")
    assert(dupd.columns.toSeq == Seq("host", "distinct"))
    val cd = run("""SELECT count(distinct(value)) AS ndv FROM cpu
        WHERE time >= 0 AND time < 40000000000
        GROUP BY time(20s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(cd == Set((0L, "a", 2L), (20000000000L, "a", 2L),
      (0L, "b", 2L), (20000000000L, "b", 1L)))
  }

  test("sample: deterministic n-per-series subset of the input points") {
    val one = run("""SELECT sample(value, 2) FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY host""")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    assert(one.count(_._1 == "a") == 2 && one.count(_._1 == "b") == 2)
    // sampled points are real input points
    val pts = fixture.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one.forall { case (h, t, v) => pts((h, t, v)) })
    // deterministic: a second run draws the identical subset
    val two = run("""SELECT sample(value, 2) FROM cpu
        WHERE time >= 0 AND time < 40000000000 GROUP BY host""")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
    assert(one.toSeq == two.toSeq)
    // n >= series size degrades to all points, time-ordered
    val all = run("SELECT sample(value, 99) FROM cpu GROUP BY host")
    assert(all.count() == 7)
  }

  test("holt_winters: downsample, recurse, forecast N bucket steps") {
    // host b sums per 10s bucket with fill(none): 10, 20, 40 -> seed at
    // bucket 2 (l=20, b=10), bucket 3: l=.5*40+.5*30=35, b=.25*15+.75*10=11.25
    val fc = run("""SELECT holt_winters(sum(value), 2, 0) FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(fc == Seq(
      (40000000000L, "b", 35.0 + 11.25),
      (50000000000L, "b", 35.0 + 2 * 11.25)))
    // with_fit unions the in-sample one-step fits before the forecast
    val wf = run("""SELECT holt_winters_with_fit(sum(value), 1, 0) FROM cpu
        WHERE host = 'b' AND time >= 0 AND time < 40000000000
        GROUP BY time(10s), host fill(none)""")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(wf == Seq((10000000000L, 30.0), (30000000000L, 46.25),
      (40000000000L, 46.25)))
    // missing GROUP BY time is an explicit error (S > 0 is supported
    // since r9 — see the seasonal test)
    assert(intercept[ParseError](run(
      "SELECT holt_winters(mean(value), 2, 0) FROM cpu GROUP BY host"))
      .getMessage.contains("GROUP BY time"))
  }

  test("scalar functions project per row and mix with raw columns") {
    val rows = run("""SELECT floor(value), sqrt(value), pow(value, 2),
        value AS raw FROM cpu WHERE host = 'b' ORDER BY time""")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(rows == Seq(
      (5000000000L, 10.0, math.sqrt(10.0), 100.0, 10.0),
      (15000000000L, 20.0, math.sqrt(20.0), 400.0, 20.0),
      (35000000000L, 40.0, math.sqrt(40.0), 1600.0, 40.0)))
    // InfluxQL's log(field, base) maps to Spark's log(base, col)
    val lg = run("SELECT log(value, 2) FROM cpu WHERE host = 'b' AND time < 10000000000")
      .collect().head.getDouble(1)
    assert(lg == math.log(10.0) / math.log(2.0))
  }

  test("grouped pagination: LIMIT per series, SLIMIT on series") {
    // with GROUP BY, LIMIT pages points PER SERIES (1.x rule)
    val perSeries = run("SELECT value FROM cpu GROUP BY host LIMIT 2")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(perSeries == Seq(("a", 0L), ("a", 10000000000L),
      ("b", 5000000000L), ("b", 15000000000L)))
    val offsetPage = run("SELECT value FROM cpu GROUP BY host LIMIT 1 OFFSET 1")
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    assert(offsetPage == Seq(("a", 10000000000L), ("b", 15000000000L)))
    // SLIMIT pages the series list (tag-sorted)
    val s1 = run("SELECT value FROM cpu GROUP BY host SLIMIT 1")
      .collect().map(_.getString(1)).distinct.toSeq
    assert(s1 == Seq("a"))
    val s2 = run("SELECT value FROM cpu GROUP BY host SLIMIT 1 SOFFSET 1")
      .collect().map(_.getString(1)).distinct.toSeq
    assert(s2 == Seq("b"))
    // without dimensions LIMIT stays a global row limit
    assert(run("SELECT value FROM cpu ORDER BY time LIMIT 3").count() == 3)
    assert(intercept[ParseError](
      run("SELECT value FROM cpu SLIMIT 1")).getMessage.contains("GROUP BY"))
  }

  test("subqueries: the inner result feeds in as a measurement") {
    // mean of per-host differences: a: (2, -1, 4) -> 5/3; b: (10, 20) -> 15
    val rows = run("""SELECT mean(difference) FROM
        (SELECT difference(value) FROM cpu GROUP BY host) GROUP BY host""")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(rows("a") - 5.0 / 3.0) < 1e-12)
    assert(rows("b") == 15.0)
    // keyless outer aggregate over the subquery output
    val n = run("""SELECT count(difference) FROM
        (SELECT difference(value) FROM cpu GROUP BY host)""")
      .collect().head.getLong(0)
    assert(n == 5, "warm-up rows were pruned by the inner transform")
    // an aggregate subquery without time() grouping gets the epoch-0 axis
    val t0 = run("""SELECT last(mean) FROM
        (SELECT mean(value) FROM cpu GROUP BY host)""")
      .collect().head.getDouble(0)
    assert(t0 == 70.0 / 3.0,
      "equal epoch-0 times tie-break to the largest value (pinned rule)")
    // outer WHERE applies to the inner output
    val w = run("""SELECT count(difference) FROM
        (SELECT difference(value) FROM cpu GROUP BY host)
        WHERE time >= 20000000000""")
      .collect().head.getLong(0)
    assert(w == 3)
  }

  test("SHOW statements map onto the metadata operators") {
    def show(q: String) = InfluxQlPlanner.runStmt(ms, q)
    assert(show("SHOW MEASUREMENTS").as[String].collect().toSeq == Seq("cpu"))
    assert(show("SHOW TAG KEYS FROM cpu").as[(String, String)].collect().toSeq
      == Seq(("cpu", "host")))
    assert(show("SHOW TAG VALUES FROM cpu WITH KEY = host")
      .as[(String, String, String)].collect().toSeq
      == Seq(("cpu", "host", "a"), ("cpu", "host", "b")))
    assert(show("SHOW FIELD KEYS FROM cpu")
      .as[(String, String, String)].collect().toSeq
      == Seq(("cpu", "value", "float")), "time and tags are not fields")
    // an all-null tag column does not list (tag_keys semantics)
    val withNullTag = Map("cpu" -> InfluxMeasurement(
      fixture.withColumn("rack", lit(null).cast("string")),
      "t", Seq("host", "rack")))
    assert(InfluxQlPlanner.runStmt(withNullTag, "SHOW TAG KEYS")
      .as[(String, String)].collect().toSeq == Seq(("cpu", "host")))
    assert(intercept[ParseError](show("SHOW TAG VALUES FROM cpu"))
      .getMessage.contains("WITH KEY"))
    assert(intercept[ParseError](show("SHOW DATABASES"))
      .getMessage.contains("server-level"))
    // SHOW SERIES: the 1.x key spelling, name-sorted tags, distinct
    assert(show("SHOW SERIES FROM cpu").as[String].collect().toSeq ==
      Seq("cpu,host=a", "cpu,host=b"))
  }

  test("SHOW CARDINALITY forms reduce the metadata plans to counts") {
    def show(q: String) = InfluxQlPlanner.runStmt(ms, q)
    assert(show("SHOW MEASUREMENT CARDINALITY").as[Long].collect().toSeq
      == Seq(1L))
    assert(show("SHOW SERIES CARDINALITY").as[(String, Long)].collect().toSeq
      == Seq(("cpu", 2L)))
    assert(show("SHOW SERIES CARDINALITY FROM cpu")
      .as[(String, Long)].collect().toSeq == Seq(("cpu", 2L)))
    // singular KEY spelling per 1.x; plural accepted too
    assert(show("SHOW TAG KEY CARDINALITY").as[(String, Long)].collect().toSeq
      == Seq(("cpu", 1L)))
    assert(show("SHOW TAG KEYS CARDINALITY").as[(String, Long)].collect().toSeq
      == Seq(("cpu", 1L)))
    assert(show("SHOW TAG VALUES CARDINALITY WITH KEY = host")
      .as[(String, Long)].collect().toSeq == Seq(("cpu", 2L)))
    assert(show("SHOW FIELD KEY CARDINALITY").as[(String, Long)].collect().toSeq
      == Seq(("cpu", 1L)))
  }

  test("SHOW MEASUREMENTS WITH MEASUREMENT: exact and regex name filters") {
    val ms2 = ms + ("mem" -> InfluxMeasurement(fixture, "t", Seq("host")))
    def names(q: String) = InfluxQlPlanner.runStmt(ms2, q)
      .collect().map(_.getString(0)).toSeq
    assert(names("SHOW MEASUREMENTS") == Seq("cpu", "mem"))
    assert(names("SHOW MEASUREMENTS WITH MEASUREMENT = cpu") == Seq("cpu"))
    assert(names("SHOW MEASUREMENTS WITH MEASUREMENT =~ /^m/") == Seq("mem"))
    assert(names("SHOW MEASUREMENTS WITH MEASUREMENT =~ /c|m/") ==
      Seq("cpu", "mem"))
    // 1.x LIMIT/OFFSET pagination applies to any SHOW output
    assert(names("SHOW MEASUREMENTS LIMIT 1") == Seq("cpu"))
    assert(names("SHOW MEASUREMENTS LIMIT 1 OFFSET 1") == Seq("mem"))
    val tv = InfluxQlPlanner.runStmt(ms2,
        "SHOW TAG VALUES FROM cpu WITH KEY = host LIMIT 1 OFFSET 1")
      .collect().map(_.getString(2)).toSeq
    assert(tv == Seq("b"))
  }

  test("RFC3339 timestamps and epoch-ns integers are interchangeable") {
    val a = run("SELECT value FROM cpu WHERE time >= '1970-01-01T00:00:10Z' AND host = 'a' ORDER BY time")
      .as[(Long, Double)].collect().toSeq
    val b = run("SELECT value FROM cpu WHERE time >= 10000000000 AND host = 'a' ORDER BY time")
      .as[(Long, Double)].collect().toSeq
    assert(a == b && a.size == 3)
  }

  test("SHOW TAG VALUES: IN list and =~ regex key selection") {
    val multiTag = fixture.withColumn("dc",
      concat($"host", org.apache.spark.sql.functions.lit("-dc")))
    val m2 = Map("cpu" -> InfluxMeasurement(multiTag, "t", Seq("host", "dc")))
    val in = InfluxQlPlanner.runStmt(m2,
      "SHOW TAG VALUES WITH KEY IN (host, dc)")
      .as[(String, String, String)].collect().toSeq
    assert(in == Seq(("cpu", "dc", "a-dc"), ("cpu", "dc", "b-dc"),
      ("cpu", "host", "a"), ("cpu", "host", "b")))
    val re = InfluxQlPlanner.runStmt(m2, "SHOW TAG VALUES WITH KEY =~ /^d/")
      .as[(String, String, String)].collect().toSeq
    assert(re == Seq(("cpu", "dc", "a-dc"), ("cpu", "dc", "b-dc")))
    val err = intercept[InfluxQl.ParseError](
      InfluxQlPlanner.runStmt(m2, "SHOW TAG VALUES WITH KEY =~ /^zz/"))
    assert(err.getMessage.contains("no selected tag key"))
  }

  test("FROM regex and lists union labeled measurements; mismatches skip") {
    val sel = InfluxQl.parse("SELECT value FROM a, b, c")
    assert(sel.from == "a" && sel.fromMore == List("b", "c"))
    assert(InfluxQl.parse("SELECT value FROM /cpu.*/").fromRegex
      .contains("cpu.*"))
    val multi = Map(
      "cpu1" -> InfluxMeasurement(fixture, "t", Seq("host")),
      "cpu2" -> InfluxMeasurement(
        fixture.withColumn("value", $"value" * 10), "t", Seq("host")),
      "mem" -> InfluxMeasurement(
        fixture.withColumnRenamed("value", "used"), "t", Seq("host")))
    val got = InfluxQlPlanner.run(multi,
      "SELECT sum(value) AS s FROM /cpu[12]/")
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("cpu1", 82.0), ("cpu2", 820.0)))
    // a regex sweeping ALL measurements skips the field-less one (1.x)
    val swept = InfluxQlPlanner.run(multi, "SELECT sum(value) AS s FROM /.*/")
      .select("name").as[String].collect().toSet
    assert(swept == Set("cpu1", "cpu2"), "mem lacks 'value' and must skip")
    // explicit comma list over mixed schemas: raw select aligns by name
    val listed = InfluxQlPlanner.run(multi,
      "SELECT sum(value) AS s FROM cpu1, cpu2")
      .select("name").as[String].collect().toSet
    assert(listed == Set("cpu1", "cpu2"))
  }

  test("TZ(): parses, and daily buckets align to local wall time across DST") {
    assert(InfluxQl.parse(
      "SELECT count(value) FROM cpu GROUP BY time(1d) TZ('America/New_York')")
      .tz.contains("America/New_York"))
    // US spring-forward: 2024-03-10 02:00 EST -> 03:00 EDT.
    //  p1 = 2024-03-10T04:00Z = Mar 9 23:00 EST  -> local day Mar 9
    //  p2 = 2024-03-10T12:00Z = Mar 10 08:00 EDT -> local day Mar 10
    // UTC bucketing would put BOTH in the Mar 10 UTC day.
    val p1 = 1710043200000000000L // 2024-03-10T04:00:00Z
    val p2 = 1710072000000000000L // 2024-03-10T12:00:00Z
    val tzMs = Map("m" -> InfluxMeasurement(
      Seq(("x", p1, 1.0), ("x", p2, 1.0)).toDF("host", "t", "value"),
      "t", Seq("host")))
    val out = InfluxQlPlanner.run(tzMs,
      """SELECT count(value) AS n FROM m GROUP BY time(1d)
         TZ('America/New_York')""")
      .as[(Long, Long)].collect().toSeq
    // labels = UTC instants of local midnights: Mar 9 00:00 EST = 05:00Z,
    // Mar 10 00:00 EST = 05:00Z (the transition is later that morning)
    assert(out == Seq(
      (1709960400000000000L, 1L),  // 2024-03-09T05:00:00Z
      (1710046800000000000L, 1L))) // 2024-03-10T05:00:00Z
    // without TZ the same points share one UTC-day bucket
    val utc = InfluxQlPlanner.run(tzMs,
      "SELECT count(value) AS n FROM m GROUP BY time(1d)")
      .as[(Long, Long)].collect().toSeq
    assert(utc == Seq((1710028800000000000L, 2L)))
  }
}
