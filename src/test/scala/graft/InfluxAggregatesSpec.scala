package graft

import org.apache.spark.sql.functions._
import graft.functions.{InfluxAggregates => IA}

class InfluxAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pts = Seq(
    ("a", 0L, 10.0), ("a", 1000000000L, 14.0), ("a", 3000000000L, 14.0),
    ("a", 4000000000L, 2.0),
    ("b", 0L, 5.0), ("b", 2000000000L, 7.0)).toDF("k", "t", "v")

  test("spread and stddev aggregate per key") {
    val m = pts.groupBy("k")
      .agg(IA.spread($"v").as("sp"), IA.stddev($"v").as("sd"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("a")._1 == 12.0 && m("b")._1 == 2.0)
    // sample stddev of (10,14,14,2): mean 10, var = (0+16+16+64)/3 = 32
    assert(math.abs(m("a")._2 - math.sqrt(32.0)) < 1e-9)
  }

  test("mode: highest count wins, ties break to the smallest value") {
    val df = Seq(("a", "y"), ("a", "x"), ("a", "y"), ("a", "x"), ("a", "z"),
      ("b", "q")).toDF("k", "s")
    val m = IA.mode(df, Seq("k"), "s", "m")
      .as[(String, String)].collect().toMap
    assert(m("a") == "x", "x and y both have count 2; smallest value wins")
    assert(m("b") == "q")
  }

  test("percentile: nearest-rank floor(p/100*n + 0.5); out-of-range emits nothing") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)).toDF("k", "v")
    def p(q: Double): Option[Double] = IA.percentile(df, Seq("k"), "v", q, "p")
      .select("p").as[Double].collect().headOption
    assert(p(50).contains(2.0)) // k = floor(2.5) = 2
    assert(p(90).contains(4.0)) // k = floor(4.1) = 4
    assert(p(100).contains(4.0)) // k = floor(4.5) = 4
    // k = floor(0.54) = 0: upstream InfluxQL emits NO point for the series
    assert(p(1).isEmpty)
  }

  test("median averages the two middle values on even counts") {
    val even = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0)).toDF("k", "v")
    assert(IA.median(even, Seq("k"), "v", "m").select("m").as[Double].head() == 6.0)
    val odd = Seq(("a", 5.0), ("a", 1.0), ("a", 9.0)).toDF("k", "v")
    assert(IA.median(odd, Seq("k"), "v", "m").select("m").as[Double].head() == 5.0)
    val single = Seq(("a", 7.0)).toDF("k", "v")
    assert(IA.median(single, Seq("k"), "v", "m").select("m").as[Double].head() == 7.0)
  }

  test("percentileApprox tracks the exact nearest-rank within sketch error") {
    val rows = (1 to 1000).map(i => ("a", i.toDouble))
    val df = rows.toDF("k", "v")
    val exact = IA.percentile(df, Seq("k"), "v", 90, "p")
      .select("p").as[Double].head()
    val approx = IA.percentileApprox(df, Seq("k"), "v", 90, "p")
      .select("p").as[Double].head()
    // accuracy 10000 over 1000 rows -> exact rank
    assert(math.abs(approx - exact) <= 1.0, s"approx $approx vs exact $exact")
  }

  test("integral: trapezoid area per second, 0 for a single point") {
    val m = IA.integral(pts, Seq("k"), "t", "v", 1000000000L, "i")
      .as[(String, Double)].collect().toMap
    // a: (10+14)/2*1 + (14+14)/2*2 + (14+2)/2*1 = 12 + 28 + 8 = 48
    assert(math.abs(m("a") - 48.0) < 1e-9)
    assert(math.abs(m("b") - 12.0) < 1e-9)
    val single = IA.integral(Seq(("c", 5L, 9.9)).toDF("k", "t", "v"),
      Seq("k"), "t", "v", 1000000000L, "i").as[(String, Double)].head()
    assert(single._2 == 0.0)
  }

  test("histogram: cumulative counts per upper bound") {
    val df = Seq(("a", 1.0), ("a", 5.0), ("a", 5.0), ("a", 50.0), ("b", 2.0))
      .toDF("k", "v")
    val h = IA.histogram(df, Seq("k"), "v", Seq(1.0, 5.0, 100.0))
      .as[(String, Double, Long)].collect().toSet
    assert(h == Set(("a", 1.0, 1L), ("a", 5.0, 3L), ("a", 100.0, 4L),
      ("b", 1.0, 0L), ("b", 5.0, 1L), ("b", 100.0, 1L)))
  }

  test("histogramQuantile interpolates within the crossing bucket") {
    val hist = Seq(("a", 1.0, 2L), ("a", 2.0, 10L),
      ("b", 1.0, 0L), ("b", 2.0, 4L)).toDF("k", "le", "n")
    def q(p: Double) = IA.histogramQuantile(hist, Seq("k"), "le", "n", p, "est")
      .as[(String, Double)].collect().toMap
    // a, q=0.5: target 5 crosses at le=2 (prev 1.0/2): 1 + 3*(1)/8
    assert(q(0.5)("a") == 1.0 + 3.0 / 8.0)
    // a, q=0.1: target 1 lands in the FIRST bucket, lower bound 0 (Flux)
    assert(q(0.1)("a") == 0.5)
    // b's mass is all in the second bucket
    assert(q(0.5)("b") == 1.0 + 2.0 * (2.0 - 1.0) / 4.0)
    // exactly one row per key regardless of flat cumulative regions
    val flat = Seq(("a", 1.0, 4L), ("a", 2.0, 4L), ("a", 3.0, 8L))
      .toDF("k", "le", "n")
    val rows = IA.histogramQuantile(flat, Seq("k"), "le", "n", 0.5, "est")
      .collect()
    assert(rows.length == 1 && rows.head.getDouble(1) == 1.0,
      "target 4 consumes the whole first bucket (estimate = its upper " +
        "bound); the flat region never double-reports")
  }

  test("topN keeps timestamps and breaks value ties to the earlier point") {
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 3L, 8.0),
      ("a", 4L, 7.0), ("b", 1L, 1.0)).toDF("k", "t", "v")
    val top = IA.topN(df, Seq("k"), "t", "v", 2)
      .select("k", "t", "v").as[(String, Long, Double)].collect().toSet
    assert(top == Set(("a", 1L, 9.0), ("a", 2L, 9.0), ("b", 1L, 1.0)))
    val bot = IA.topN(df, Seq("k"), "t", "v", 1, bottom = true)
      .select("k", "t", "v").as[(String, Long, Double)].collect().toSet
    assert(bot == Set(("a", 4L, 7.0), ("b", 1L, 1.0)))
  }

  test("topN plans a window WITH the map-side WindowGroupLimit prune; " +
      "the bounded TopPoints aggregate matches it row-for-row") {
    // r14 measurement (SCALE_r14.md): the window + WindowGroupLimit
    // formulation beat the partial-aggregate alternative in BOTH series
    // regimes — tall series prune map-side already, wide series cannot
    // shuffle less than the data under either formulation and the udaf
    // buffers cost more per point. This pins (a) the WindowGroupLimit
    // prune is actually present in the plan, (b) the TopPoints
    // aggregators (kept for single-group global top-k) agree exactly.
    val df = Seq(("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 3L, 8.0),
      ("a", 4L, 7.0), ("b", 1L, 1.0)).toDF("k", "t", "v")
    val plan = IA.topN(df, Seq("k"), "t", "v", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"map-side WindowGroupLimit prune missing from topN plan:\n$plan")
    // aggregate twin: identical rows (value extreme first, earlier time
    // on ties), int64 exactness past 2^53
    val agg = df.filter($"v".isNotNull).groupBy("k")
      .agg(graft.functions.TopK.topPointsD(2, false)($"v", $"t").as("top"))
      .select($"k", explode($"top").as("p"))
      .select($"k", $"p.t".as("t"), $"p.v".as("v"))
      .as[(String, Long, Double)].collect().toSet
    val win = IA.topN(df, Seq("k"), "t", "v", 2)
      .as[(String, Long, Double)].collect().toSet
    assert(agg == win, s"aggregate/window top-k disagree: $agg vs $win")
    val li = Seq(("a", 1L, (1L << 60) + 1L), ("a", 2L, (1L << 60) + 2L))
      .toDF("k", "t", "v")
    val gotL = li.groupBy("k")
      .agg(graft.functions.TopK.topPointsL(1, false)($"v", $"t").as("top"))
      .select(explode($"top.v").as("v")).as[Long].collect().toSeq
    assert(gotL == Seq((1L << 60) + 2L), s"int64 precision lost: $gotL")
  }

  test("hdrSketch: exact integer bucketing, mergeable counts") {
    // subBits=5: x=12345 -> msb=13, m=floor(12345*32/8192)=48,
    // idx=13*32+48-32=432, rep=2^13*(2*48+1)/64=12416
    val df = Seq(("a", 12345L), ("a", 12345L), ("a", 1L), ("a", 0L),
      ("b", 33L)).toDF("k", "v")
    val sk = IA.hdrSketch(df, Seq("k"), "v")
      .as[(String, Long, Double, Long)].collect()
      .map { case (k, idx, rep, n) => (k, idx) -> ((rep, n)) }.toMap
    assert(sk(("a", 432L)) == ((12416.0, 2L)))
    // x=1: msb=0, m=floor(32/1)=32, idx=0, rep=(2*32+1)/64
    assert(sk(("a", 0L)) == ((65.0 / 64.0, 1L)))
    // zero/negative values are excluded (no bucket for them)
    assert(sk.keys.count(_._1 == "a") == 2)
    // x=33: msb=5, m=floor(33*32/32)=33, idx=5*32+1=161,
    // rep=32*(2*33+1)/64=33.5; every value in [2^msb*m/32, ...) maps here
    assert(sk(("b", 161L)) == ((33.5, 1L)))
    // merge = count addition: sketching a doubled frame doubles every n
    val doubled = IA.hdrSketch(df.union(df), Seq("k"), "v")
      .as[(String, Long, Double, Long)].collect()
      .map { case (k, idx, rep, n) => (k, idx) -> ((rep, n)) }.toMap
    assert(doubled.keySet == sk.keySet &&
      doubled.forall { case (k, (rep, n)) => sk(k) == ((rep, n / 2)) },
      "bucket ids/reps are value-determined; counts merge by addition")
  }

  test("hdrQuantiles: rank pick is exact; estimate within bucket error of truth") {
    import org.apache.spark.sql.functions.col
    // values 1..1000 on one key: p50 ~ 500, p90 ~ 900, p99 ~ 990 with
    // relative error <= 2^-6 (subBits=5 midpoint rule)
    val vals = (1L to 1000L).map(("a", _))
    val df = vals.toDF("k", "v")
    val sk = IA.hdrSketch(df, Seq("k"), "v")
    val q = IA.hdrQuantiles(sk, Seq("k"), Seq(50, 90, 99))
      .as[(String, Int, Double, Long)].collect()
      .map { case (_, p, est, tot) => p -> ((est, tot)) }.toMap
    assert(q.keySet == Set(50, 90, 99) && q.values.forall(_._2 == 1000L))
    for ((p, truth) <- Seq(50 -> 500.0, 90 -> 900.0, 99 -> 990.0)) {
      val est = q(p)._1
      assert(math.abs(est - truth) / truth <= 1.0 / 64.0 + 1e-9,
        s"p$p: est $est vs exact $truth exceeds the bucket error bound")
    }
    // exactly one bucket wins per (key, pct): the half-open rank window
    // [prev, cum) admits a single row even across flat cumulative regions
    val rows = IA.hdrQuantiles(sk, Seq("k"), Seq(50, 90, 99)).collect()
    assert(rows.length == 3)
    // pct=100 lands in the last non-empty bucket, never drops off the end
    val p100 = IA.hdrQuantiles(sk, Seq("k"), Seq(100))
      .select(col("est")).as[Double].collect()
    assert(p100.length == 1 && math.abs(p100.head - 1000.0) / 1000.0 <= 1.0 / 64.0)
  }
}
