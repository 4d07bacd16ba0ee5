package graft

import org.apache.spark.sql.DataFrame
import graft.functions.{SeriesFunctions => SF}

class SeriesFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // one series with irregular spacing + a second series to prove keying
  private lazy val pts = Seq(
    ("a", 0L, 10.0), ("a", 1000000000L, 13.0), ("a", 3000000000L, 13.0),
    ("a", 4000000000L, 9.0),
    ("b", 0L, 100.0), ("b", 2000000000L, 110.0)).toDF("k", "t", "v")

  private def vals(df: DataFrame, out: String): Map[(String, Long), Option[Double]] =
    df.select($"k", $"t", org.apache.spark.sql.functions.col(out))
      .as[(String, Long, Option[Double])].collect()
      .map { case (k, t, v) => (k, t) -> v }.toMap

  test("non-negative variants suppress negative results to NULL") {
    val d = vals(SF.nonNegativeDifference(pts, Seq("k"), "t", "v", "d"), "d")
    assert(d(("a", 1000000000L)).contains(3.0))
    assert(d(("a", 4000000000L)).isEmpty, "negative diff suppressed")
    val r = vals(SF.nonNegativeDerivative(pts, Seq("k"), "t", "v",
      1000000000L, "r"), "r")
    assert(r(("a", 3000000000L)).contains(0.0), "zero stays")
    assert(r(("a", 4000000000L)).isEmpty)
  }

  test("increase: running non-negative deltas; a drop is a counter reset") {
    val i = vals(SF.increase(pts, Seq("k"), "t", "v", "i"), "i")
    assert(i(("a", 0L)).contains(0.0), "first point contributes nothing")
    assert(i(("a", 1000000000L)).contains(3.0))
    assert(i(("a", 3000000000L)).contains(3.0), "flat adds zero")
    // drop 13 -> 9: reset, the post-reset value is added (3 + 9)
    assert(i(("a", 4000000000L)).contains(12.0))
    assert(i(("b", 2000000000L)).contains(10.0), "series are independent")
  }

  test("exponentialMovingAverage: first point seeds, recursion follows") {
    val out = SF.exponentialMovingAverage(pts, Seq("k"), "t", "v",
        alpha = 0.5, "ema")
      .orderBy("k", "t")
      .as[(String, Long, Double)].collect()
    val a = out.filter(_._1 == "a").map(_._3)
    // 10; .5*13+.5*10=11.5; .5*13+.5*11.5=12.25; .5*9+.5*12.25=10.625
    assert(a.toSeq == Seq(10.0, 11.5, 12.25, 10.625))
    val b = out.filter(_._1 == "b").map(_._3)
    assert(b.toSeq == Seq(100.0, 105.0), "series do not leak")
  }

  test("difference: v - previous v, null first point, per series") {
    val m = vals(SF.difference(pts, Seq("k"), "t", "v", "d"), "d")
    assert(m(("a", 0L)).isEmpty && m(("a", 1000000000L)).contains(3.0))
    assert(m(("a", 4000000000L)).contains(-4.0))
    assert(m(("b", 2000000000L)).contains(10.0), "series must not leak into each other")
  }

  test("derivative: rate per unit of elapsed time") {
    val m = vals(SF.derivative(pts, Seq("k"), "t", "v", 1000000000L, "r"), "r")
    assert(m(("a", 1000000000L)).contains(3.0)) // +3 over 1s
    assert(m(("a", 3000000000L)).contains(0.0)) // flat over 2s
    assert(m(("a", 4000000000L)).contains(-4.0))
    assert(m(("b", 2000000000L)).contains(5.0)) // +10 over 2s
  }

  test("derivative: equal timestamps yield null, not a divide error") {
    val dup = Seq(("a", 5L, 1.0), ("a", 5L, 2.0)).toDF("k", "t", "v")
    val out = SF.derivative(dup, Seq("k"), "t", "v", 1L, "r")
      .select($"r").as[Option[Double]].collect()
    assert(out.count(_.isEmpty) == 2) // first point + zero-dt point
  }

  test("movingAverage emits only full windows (InfluxQL nth-point rule)") {
    val m = vals(SF.movingAverage(pts, Seq("k"), "t", "v", 3, "m"), "m")
    assert(m(("a", 0L)).isEmpty && m(("a", 1000000000L)).isEmpty)
    assert(m(("a", 3000000000L)).contains(12.0)) // (10+13+13)/3
    assert(m(("b", 2000000000L)).isEmpty, "b never has 3 points")
  }

  test("cumulativeSum runs within the series") {
    val m = vals(SF.cumulativeSum(pts, Seq("k"), "t", "v", "c"), "c")
    assert(m(("a", 4000000000L)).contains(45.0))
    assert(m(("b", 2000000000L)).contains(210.0))
  }

  test("elapsed: ns since previous point") {
    val m = vals(SF.elapsed(pts, Seq("k"), "t", "e"), "e")
      .map { case (k, v) => k -> v.map(_.toLong) }
    assert(m(("a", 3000000000L)).contains(2000000000L))
    assert(m(("b", 0L)).isEmpty)
  }

  test("all four functions collapse into one Window operator (plan shape)") {
    val out = Seq[DataFrame => DataFrame](
      SF.difference(_, Seq("k"), "t", "v", "d"),
      SF.derivative(_, Seq("k"), "t", "v", 1L, "r"),
      SF.cumulativeSum(_, Seq("k"), "t", "v", "c"),
      SF.elapsed(_, Seq("k"), "t", "e")).foldLeft(pts)((df, f) => f(df))
    val plan = out.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 1,
      s"expected ONE exchange for all series functions:\n$plan")
  }

  test("keyless windows are rejected (single-task trap)") {
    intercept[IllegalArgumentException] {
      SF.difference(pts, Nil, "t", "v", "d")
    }
  }

  test("demaTema: seeds at the raw point, cascaded recursions follow") {
    val out = SF.demaTema(pts, Seq("k"), "t", "v", alpha = 0.5, "dema", "tema")
      .orderBy("k", "t")
      .as[(String, Long, Double, Double)].collect()
    val a = out.filter(_._1 == "a")
    // first point: e1=e2=e3=10 -> dema = 2*10-10 = 10, tema = 10
    assert(a.head._3 == 10.0 && a.head._4 == 10.0)
    // second point: e1=11.5, e2=.5*11.5+.5*10=10.75, e3=.5*10.75+.5*10=10.375
    assert(a(1)._3 == 2.0 * 11.5 - 10.75)
    assert(a(1)._4 == 3.0 * 11.5 - 3.0 * 10.75 + 10.375)
    // series isolation
    val b = out.filter(_._1 == "b")
    assert(b.head._3 == 100.0 && b.head._4 == 100.0)
  }

  test("relativeStrengthIndex: warmup NULLs, seeded mean, Wilder smoothing") {
    val series = (1L to 8L).map(i => ("a", i,
      if (i % 2 == 0) 10.0 + i else 10.0 - i)).toDF("k", "t", "v")
    val m = vals(SF.relativeStrengthIndex(series, Seq("k"), "t", "v",
      n = 3, "rsi"), "rsi")
    assert(m(("a", 1L)).isEmpty && m(("a", 3L)).isEmpty, "warmup emits NULL")
    assert(m(("a", 4L)).isDefined, "first RSI after n changes")
    m.values.flatten.foreach(v => assert(v >= 0.0 && v <= 100.0))
    // monotone-up series: zero losses -> RSI 100
    val up = (1L to 5L).map(i => ("a", i, i.toDouble)).toDF("k", "t", "v")
    val u = vals(SF.relativeStrengthIndex(up, Seq("k"), "t", "v", 3, "rsi"), "rsi")
    assert(u(("a", 4L)).contains(100.0) && u(("a", 5L)).contains(100.0))
  }

  test("CMO and efficiency ratio: full-window gate, flat-window zero") {
    val flat = Seq(("a", 1L, 5.0), ("a", 2L, 5.0), ("a", 3L, 5.0),
      ("a", 4L, 5.0)).toDF("k", "t", "v")
    val c = vals(SF.chandeMomentumOscillator(flat, Seq("k"), "t", "v", 3, "cmo"), "cmo")
    assert(c(("a", 3L)).isEmpty, "needs n changes")
    assert(c(("a", 4L)).contains(0.0), "flat window scores 0")
    val k = vals(SF.kaufmanEfficiencyRatio(flat, Seq("k"), "t", "v", 3, "ker"), "ker")
    assert(k(("a", 4L)).contains(0.0), "zero volatility scores 0")
    // monotone run is perfectly efficient: |net| == sum|ch| -> ER 1, CMO 100
    val up = (1L to 4L).map(i => ("a", i, i * 2.0)).toDF("k", "t", "v")
    assert(vals(SF.kaufmanEfficiencyRatio(up, Seq("k"), "t", "v", 3, "ker"), "ker")(("a", 4L)).contains(1.0))
    assert(vals(SF.chandeMomentumOscillator(up, Seq("k"), "t", "v", 3, "cmo"), "cmo")(("a", 4L)).contains(100.0))
  }

  test("kaufmanAdaptiveMovingAverage: warmup, raw-point seed, ER modulation") {
    // constant tail: er = 0 -> sc = (2/31)^2, but v - kama = 0 so kama holds
    val flat = (1L to 6L).map(i => ("a", i, 7.0)).toDF("k", "t", "v")
    val f = vals(SF.kaufmanAdaptiveMovingAverage(flat, Seq("k"), "t", "v",
      n = 3, "kama"), "kama")
    assert(f(("a", 3L)).isEmpty, "warmup emits NULL until n changes exist")
    assert(f(("a", 4L)).contains(7.0), "first eligible point seeds raw")
    assert(f(("a", 6L)).contains(7.0), "flat series holds the seed")
    // monotone run: er = 1 -> sc = (2/3)^2 = 4/9, one exact step from seed
    val up = (1L to 5L).map(i => ("a", i, i * 9.0)).toDF("k", "t", "v")
    val u = vals(SF.kaufmanAdaptiveMovingAverage(up, Seq("k"), "t", "v",
      n = 3, "kama"), "kama")
    assert(u(("a", 4L)).contains(36.0))
    val sc = 4.0 / 9.0
    assert(u(("a", 5L)).contains(36.0 + sc * (45.0 - 36.0)))
    // per-key state resets
    val two = ((1L to 5L).map(i => ("a", i, i * 9.0)) ++
      (1L to 4L).map(i => ("b", i, 1.0))).toDF("k", "t", "v")
    val t2 = vals(SF.kaufmanAdaptiveMovingAverage(two, Seq("k"), "t", "v",
      n = 3, "kama"), "kama")
    assert(t2(("b", 3L)).isEmpty && t2(("b", 4L)).contains(1.0))
  }

  test("tripleExponentialDerivative: n=1 degenerates to percent change") {
    // alpha = 1 -> e3 tracks v exactly -> trix = 100*(v/v_prev - 1)
    val m = vals(SF.tripleExponentialDerivative(pts, Seq("k"), "t", "v",
      n = 1, "trix"), "trix")
    assert(m(("a", 0L)).isEmpty, "first point has no previous e3")
    assert(m(("a", 1000000000L)).contains(100.0 * (13.0 - 10.0) / 10.0))
    assert(m(("a", 3000000000L)).contains(0.0))
    assert(m(("b", 2000000000L)).contains(10.0), "series do not leak")
    // zero previous e3 guards to NULL instead of dividing
    val z = Seq(("a", 1L, 0.0), ("a", 2L, 5.0)).toDF("k", "t", "v")
    assert(vals(SF.tripleExponentialDerivative(z, Seq("k"), "t", "v",
      n = 1, "trix"), "trix")(("a", 2L)).isEmpty)
  }

  test("anomalyFlags: integer-exact 3-sigma test over the trailing window") {
    import org.apache.spark.sql.functions.col
    // 10 flat points then a spike; window n=4
    val s = ((1L to 10L).map(i => ("a", i, 100L)) :+ (("a", 11L, 1000L)))
      .toDF("k", "t", "q")
    val out = SF.anomalyFlags(s, Seq("k"), "t", "q", n = 4, sigmas = 3, "a")
      .select(col("t"), col("a"))
      .as[(Long, Option[Boolean])].collect().toMap
    assert(out(1L).isEmpty && out(4L).isEmpty, "warmup emits NULL")
    assert(out(5L).contains(false), "flat baseline, flat point: normal")
    assert(out(11L).contains(true), "spike over zero-variance baseline")
    // the spike does not poison its own baseline (window excludes self)
    val out2 = SF.anomalyFlags(
      (s.as[(String, Long, Long)].collect().toSeq :+ (("a", 12L, 100L)))
        .toDF("k", "t", "q"), Seq("k"), "t", "q", 4, 3, "a")
      .select(col("t"), col("a")).as[(Long, Option[Boolean])].collect().toMap
    // t=12 baseline {8,9,10,11} includes the spike -> high variance ->
    // the return to 100 is NOT anomalous at 3 sigma
    assert(out2(12L).contains(false))
  }

  test("timedMovingAverage: trailing time-range frame, not a row frame") {
    // 2s window over irregular spacing: the 3s gap excludes older points
    val m = vals(SF.timedMovingAverage(pts, Seq("k"), "t", "v",
      2000000000L, "tm"), "tm")
    assert(m(("a", 0L)).contains(10.0))
    assert(m(("a", 1000000000L)).contains(11.5)) // (10+13)/2 within 2s
    assert(m(("a", 3000000000L)).contains(13.0), "t=1s is outside (1,3]")
    assert(m(("a", 4000000000L)).contains(11.0)) // (13+9)/2
    assert(m(("b", 2000000000L)).contains(110.0), "series independent")
  }

  test("stateCount/stateDuration: streaks count and time, -1 outside") {
    import org.apache.spark.sql.functions.col
    // series: F T T F T (pred: v >= 10)
    val s = Seq(("a", 0L, 1.0), ("a", 1000000000L, 10.0),
      ("a", 3000000000L, 11.0), ("a", 4000000000L, 2.0),
      ("a", 9000000000L, 12.0)).toDF("k", "t", "v")
    val pred = col("v") >= 10.0
    val c = vals(SF.stateCount(s, Seq("k"), "t", pred, "c"), "c")
      .map { case (k, v) => k -> v.map(_.toLong) }
    assert(c(("a", 0L)).contains(-1L))
    assert(c(("a", 1000000000L)).contains(1L))
    assert(c(("a", 3000000000L)).contains(2L), "streak continues")
    assert(c(("a", 4000000000L)).contains(-1L), "streak resets")
    assert(c(("a", 9000000000L)).contains(1L), "new streak restarts at 1")
    val d = vals(SF.stateDuration(s, Seq("k"), "t", pred,
        1000000000L, "d"), "d")
      .map { case (k, v) => k -> v.map(_.toLong) }
    assert(d(("a", 1000000000L)).contains(0L), "state start is 0")
    assert(d(("a", 3000000000L)).contains(2L), "2s into the state")
    assert(d(("a", 4000000000L)).contains(-1L))
    assert(d(("a", 9000000000L)).contains(0L))
  }

  test("holtLinear: null first point, trend seed, level/trend recursion") {
    val m = vals(SF.holtLinear(pts, Seq("k"), "t", "v",
      alpha = 0.5, beta = 0.25, "h"), "h")
    assert(m(("a", 0L)).isEmpty, "first point has no trend yet")
    // seed at point 2: l = 13, b = 3 -> fit 16
    assert(m(("a", 1000000000L)).contains(16.0))
    // point 3 (v=13): l' = .5*13 + .5*16 = 14.5; b' = .25*1.5 + .75*3 = 2.625
    assert(m(("a", 3000000000L)).contains(14.5 + 2.625))
    assert(m(("b", 2000000000L)).contains(120.0), "series do not leak")
  }

  test("holtForecast: projects l + h*b hourly past each series end") {
    val out = SF.holtForecast(pts, Seq("k"), "t", "v",
        alpha = 0.5, beta = 0.25, n = 3, stepNs = 1000000000L, "h")
      .orderBy("k", "t").as[(String, Long, Double)].collect()
    assert(out.count(_._1 == "a") == 3 && out.count(_._1 == "b") == 3)
    val b = out.filter(_._1 == "b")
    // series b ends at its seed state: l = 110, b = 10, t = 2e9
    assert(b.map(_._2).toSeq == Seq(3000000000L, 4000000000L, 5000000000L))
    assert(b.map(_._3).toSeq == Seq(120.0, 130.0, 140.0))
    // a 1-point series yields no forecast (no trend)
    val one = Seq(("c", 0L, 1.0)).toDF("k", "t", "v")
    assert(SF.holtForecast(one, Seq("k"), "t", "v", 0.5, 0.25, 2,
      1L, "h").count() == 0)
  }

  test("holtSeasonal: classical init, seasonal ring recursion, forecast") {
    // period-2 seasonality + trend; dyadic α=β=γ=0.5 makes every step
    // exact in binary, so the assertions are equalities, not tolerances
    val xs = Seq(("a", 0L, 10.0), ("a", 1L, 0.0), ("a", 2L, 12.0),
      ("a", 3L, 2.0), ("a", 4L, 14.0), ("a", 5L, 4.0)).toDF("k", "t", "v")
    val (fit, fc) = SF.holtSeasonal(xs, Seq("k"), "t", "v",
      alpha = 0.5, beta = 0.5, gamma = 0.5, n = 2, season = 2,
      stepNs = 1L, "h")
    // init: l = mean(10,0) = 5, b = (mean(12,2) − 5)/2 = 1, ring = [5,−5]
    val f = fit.orderBy("t").as[(String, Long, Double)].collect()
    assert(f.map(_._2).toSeq == Seq(2L, 3L, 4L, 5L), "fits from t = S on")
    assert(f.map(_._3).toSeq == Seq(11.0, 2.75, 13.6875, 4.546875))
    val p = fc.orderBy("t").as[(String, Long, Double)].collect()
    assert(p.map(_._2).toSeq == Seq(6L, 7L))
    assert(p.map(_._3).toSeq == Seq(15.79296875, 6.14453125))
    // a series shorter than two seasons yields nothing
    val short = Seq(("c", 0L, 1.0), ("c", 1L, 2.0), ("c", 2L, 3.0))
      .toDF("k", "t", "v")
    val (sf, sc) = SF.holtSeasonal(short, Seq("k"), "t", "v",
      0.5, 0.5, 0.5, n = 1, season = 2, stepNs = 1L, "h")
    assert(sf.count() == 0 && sc.count() == 0)
  }

  test("holtSeasonal: long raw series (many rings past init), bounded-state " +
      "scan matches the full-recursion reference exactly") {
    // 60 points per series at season=3 — 18 full rings past the 2·S init,
    // i.e. the shape the r9 verdict flagged: a RAW unbucketed series far
    // longer than the lookahead buffer. Two interleaved series in shuffled
    // input order prove the key-boundary flush and in-partition sort.
    val s = 3
    def series(key: String, off: Double): Seq[(String, Long, Double)] =
      (0 until 60).map { i =>
        (key, i.toLong, off + 0.5 * i + Seq(7.0, -2.0, -5.0)(i % s)
          + (if (i % 7 == 0) 1.25 else 0.0))
      }
    val data = scala.util.Random.shuffle(series("a", 0.0) ++ series("b", 100.0))
    val (fit, fc) = SF.holtSeasonal(data.toDF("k", "t", "v"), Seq("k"), "t",
      "v", alpha = 0.5, beta = 0.25, gamma = 0.5, n = 4, season = s,
      stepNs = 1L, "h")
    // reference: the straightforward whole-array recursion
    def ref(xs: Seq[Double]): (Seq[Double], Seq[Double]) = {
      val (al, be, ga) = (0.5, 0.25, 0.5)
      val mean1 = xs.take(s).sum / s
      val mean2 = xs.slice(s, 2 * s).sum / s
      var l = mean1; var b = (mean2 - mean1) / s
      val ring = Array.tabulate(s)(j => xs(j) - mean1)
      val fits = (s until xs.length).map { i =>
        val slot = i % s
        val f = l + b + ring(slot)
        val nl = al * (xs(i) - ring(slot)) + (1.0 - al) * (l + b)
        b = be * (nl - l) + (1.0 - be) * b
        ring(slot) = ga * (xs(i) - nl) + (1.0 - ga) * ring(slot)
        l = nl
        f
      }
      (fits, (1 to 4).map(h => l + h * b + ring((xs.length - 1 + h) % s)))
    }
    for (key <- Seq("a", "b")) {
      val vs = series(key, if (key == "a") 0.0 else 100.0).map(_._3)
      val (wantFit, wantFc) = ref(vs)
      val gotFit = fit.filter($"k" === key).orderBy("t")
        .as[(String, Long, Double)].collect()
      assert(gotFit.map(_._2).toSeq == (s.toLong until 60L),
        s"$key: fits at every bucket from t = S on")
      assert(gotFit.map(_._3).toSeq == wantFit, s"$key: fit recursion exact")
      val gotFc = fc.filter($"k" === key).orderBy("t")
        .as[(String, Long, Double)].collect()
      assert(gotFc.map(_._2).toSeq == (60L until 64L).toSeq)
      assert(gotFc.map(_._3).toSeq == wantFc, s"$key: forecast exact")
    }
  }

  test("promRate: reset-aware increase, edge extrapolation, zero guard") {
    // bucket [0, 10s): samples at 2s/4s/6s with one reset 13 -> 11
    val s1 = Seq(("a", 2000000000L, 10L), ("a", 4000000000L, 13L),
      ("a", 6000000000L, 11L)).toDF("k", "t", "v")
    val r1 = SF.promRate(s1, Seq("k"), "t", "v", 10000000000L, "rate")
      .select("time", "rate").as[(Long, Double)].head()
    // inc = 3 + 11 = 14; si = 4s, avg = 2s, thr = 2.2s;
    // extS = d2s = 2s (zero guard 4s*(10/14) = 2.857s doesn't bind);
    // extE = avg/2 = 1s (d2e = 4s >= thr); factor = 7/4
    assert(r1._1 == 10000000000L)
    assert(math.abs(r1._2 - 14.0 * 1.75 / 10.0) < 1e-12)
    // zero guard binds: first sample so low the counter can't extrapolate
    // past its own zero crossing
    val s2 = Seq(("a", 2000000000L, 1L), ("a", 8000000000L, 21L))
      .toDF("k", "t", "v")
    val r2 = SF.promRate(s2, Seq("k"), "t", "v", 10000000000L, "rate")
      .select("rate").as[Double].head()
    val expect = 20.0 * ((6e9 + 6e9 * (1.0 / 20.0) + 2e9) / 6e9) / 10.0
    assert(math.abs(r2 - expect) < 1e-12)
    // under two samples, or zero sampled interval: no output row
    assert(SF.promRate(Seq(("a", 1L, 5L)).toDF("k", "t", "v"),
      Seq("k"), "t", "v", 10000000000L, "r").count() == 0)
    assert(SF.promRate(Seq(("a", 1L, 5L), ("a", 1L, 9L)).toDF("k", "t", "v"),
      Seq("k"), "t", "v", 10000000000L, "r").count() == 0)
  }

  test("gaps: one row per over-threshold span, sized by gaps not points") {
    val out = SF.gaps(pts, Seq("k"), "t", thresholdNs = 1500000000L)
      .orderBy("k", "gap_start")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 1000000000L, 3000000000L, 2000000000L),
      ("b", 0L, 2000000000L, 2000000000L)))
  }

  test("lttbDownsample: endpoints kept, one pick per bucket against the " +
      "previous selection and next-bucket average; tiny series degrade") {
    // series: first(0,0); bucket0 candidates (1s,100) & (2s,0);
    // bucket1 candidates (11s,50) & (12s,60); last (21s,0).
    // bucket0 scores vs prev=(0,0) and next-avg=((11.5s),55):
    // (1s,100) area ~ |(0-11.5)(100-0) - (0-1)(55-0)|*2 >> (2s,0) ->
    // picks (1s,100); bucket1 vs prev=(1s,100), next=last(21s,0):
    // (11s,50): |(1-21)(50-100)-(1-11)(0-100)| = |1000-1000| = 0;
    // (12s,60): |(1-21)(60-100)-(1-12)(0-100)| = |800-1100| = 300 ->
    // picks (12s,60)
    val s = Seq(
      ("a", 0L, 0.0), ("a", 1000000000L, 100.0), ("a", 2000000000L, 0.0),
      ("a", 11000000000L, 50.0), ("a", 12000000000L, 60.0),
      ("a", 21000000000L, 0.0)).toDF("k", "t", "v")
    val got = SF.lttbDownsample(s, Seq("k"), "t", "v",
        bucketNs = 10000000000L)
      .as[(String, Long, Double, Boolean)].collect().toSeq.sortBy(_._2)
    assert(got == Seq(
      ("a", 0L, 0.0, true),
      ("a", 1000000000L, 100.0, false),
      ("a", 12000000000L, 60.0, false),
      ("a", 21000000000L, 0.0, true)), got)
    // 1-point and 2-point series: endpoints only, nothing else
    val tiny = Seq(("one", 5L, 1.0), ("two", 5L, 1.0), ("two", 9L, 2.0))
      .toDF("k", "t", "v")
    val t2 = SF.lttbDownsample(tiny, Seq("k"), "t", "v", bucketNs = 100L)
      .as[(String, Long, Double, Boolean)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(t2 == Seq(("one", 5L, 1.0, true),
      ("two", 5L, 1.0, true), ("two", 9L, 2.0, true)), t2)
  }

  test("ltobDownsample: endpoints always survive, interior by max area") {
    // series a in one 10s bucket: first/last points get infinite area so
    // the bucket keeps ONE of them (tie on area -> earliest = t0)
    val one = SF.ltobDownsample(
        pts.filter($"k" === "a").withColumn("c",
          org.apache.spark.sql.functions.col("v").cast("long")),
        Seq("k"), "t", "c", bucketNs = 10000000000L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(one == Seq(("a", 0L, 0L, 10L)))
    // 1s buckets: every point is alone in its bucket and survives
    val all = SF.ltobDownsample(
        pts.withColumn("c", org.apache.spark.sql.functions.col("v").cast("long")),
        Seq("k"), "t", "c", bucketNs = 1000000000L)
    assert(all.count() == 6)
    // interior argmax: 5 points, middle 3 interior, bucket covers all ->
    // the winner is an endpoint (infinite area) — now shrink to exclude
    // them: interior-only bucket picks the sharpest corner
    val tri = Seq(("x", 0L, 0L), ("x", 1000L, 0L), ("x", 2000L, 100L),
      ("x", 3000L, 0L), ("x", 4000L, 0L)).toDF("k", "t", "c")
    val picked = SF.ltobDownsample(tri, Seq("k"), "t", "c", bucketNs = 5000L)
      .as[(String, Long, Long, Long)].collect()
    assert(picked.length == 1 && picked.head._3 == 0L,
      "endpoint infinite area wins the single bucket")
    val interior = SF.ltobDownsample(
        tri.filter($"t" > 0L && $"t" < 4000L), Seq("k"), "t", "c",
        bucketNs = 5000L)
      .as[(String, Long, Long, Long)].collect()
    assert(interior.head._3 == 1000L,
      "ends of the restricted series keep infinite area; earliest wins ties")
  }

  test("all window transforms collapse into ONE Window operator (plan shape)") {
    val all = Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      SF.difference(_, Seq("k"), "t", "v", "diff"),
      SF.derivative(_, Seq("k"), "t", "v", 1000000000L, "dv"),
      SF.movingAverage(_, Seq("k"), "t", "v", 3, "ma"),
      SF.cumulativeSum(_, Seq("k"), "t", "v", "cs"),
      SF.elapsed(_, Seq("k"), "t", "el"))
      .foldLeft(pts)((df, f) => f(df))
    val plan = all.queryExecution.executedPlan.treeString
    assert(plan.linesIterator.count(_.trim.startsWith("+- Window")) +
      plan.linesIterator.count(_.trim.startsWith("Window")) == 1,
      s"equal window specs must collapse to one operator:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"one exchange on the series key:\n$plan")
  }

  test("cusum: accumulates sustained drift, resets at zero, alarms at h") {
    import spark.implicits._
    val df = Seq(("a", 1L, 50.0), ("a", 2L, 52.0), ("a", 3L, 53.0),
      ("a", 4L, 53.0), ("a", 5L, 46.0),
      ("b", 1L, 50.0)).toDF("k", "t", "v")
    val out = SF.cusum(df, Seq("k"), "t", "v",
        target = 50.0, slack = 1.0, threshold = 4.0)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    // sp: 0, 1, 3, 5 (alarm), then 5 + (46-51) -> 0
    assert(out(("a", 1L)) == ((0.0, 0.0, false)))
    assert(out(("a", 2L)) == ((1.0, 0.0, false)))
    assert(out(("a", 3L)) == ((3.0, 0.0, false)))
    assert(out(("a", 4L)) == ((5.0, 0.0, true)))
    assert(out(("a", 5L)) == ((0.0, 3.0, false)))
    // a new series starts from zero state
    assert(out(("b", 1L)) == ((0.0, 0.0, false)))
  }

  test("seasonalDecompose: 2xMA trend, phase means, additive identity") {
    import org.apache.spark.sql.functions.{lit, pmod}
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 1.0),
      ("a", 4L, 3.0), ("a", 5L, 1.0)).toDF("k", "t", "v")
    val out = SF.seasonalDecompose(df, Seq("k"), "t", "v", period = 2,
        phase = pmod($"t", lit(2L)))
      .collect()
      .map(r => r.getAs[Long]("t") ->
        (Option(r.getAs[Any]("trend")).map(_.asInstanceOf[Double]),
          r.getAs[Double]("seasonal"),
          Option(r.getAs[Any]("remainder")).map(_.asInstanceOf[Double])))
      .toMap
    // edges have no full centered window
    assert(out(1L)._1.isEmpty && out(5L)._1.isEmpty)
    // interior trend is the flat 2: (0.5*a + b + 0.5*c)/2 with a=c
    assert(Seq(2L, 3L, 4L).forall(t => out(t)._1.contains(2.0)))
    // phase means: even buckets +1, odd buckets -1
    assert(out(2L)._2 == 1.0 && out(4L)._2 == 1.0)
    assert(out(1L)._2 == -1.0 && out(3L)._2 == -1.0)
    // the decomposition reassembles exactly where trend exists
    assert(Seq(2L, 3L, 4L).forall(t => out(t)._3.contains(0.0)))
  }

  test("predictLinear: exact OLS on integer points; constant series is NULL") {
    // y = 3x + 7 exactly: slope 3, prediction at xmax+2 = 3*5+7 = 22
    val exact = Seq(("a", 0L, 7L), ("a", 1L, 10L), ("a", 2L, 13L),
      ("a", 3L, 16L),
      ("c", 0L, 5L), ("c", 4L, 5L), // constant: slope 0, predict 5
      ("d", 2L, 9L)) // single point: den = 0 -> NULL
      .toDF("k", "x", "y")
    val out = SF.predictLinear(exact, Seq("k"), "x", "y", horizon = 2L)
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .map { case (k, n, sl, p) => k -> ((n, sl, p)) }.toMap
    assert(out("a") == ((4L, Some(3.0), Some(22.0))),
      "a perfect line recovers exactly (integer co-moments, one division)")
    assert(out("c") == ((2L, Some(0.0), Some(5.0))))
    assert(out("d")._2.isEmpty && out("d")._3.isEmpty,
      "a single point has no regression (den = 0 -> NULL, never a throw)")
    // non-collinear data matches the closed-form OLS computed directly
    val pts = Seq(0L -> 2L, 1L -> 5L, 2L -> 4L, 3L -> 11L, 5L -> 9L)
    val df = pts.map { case (x, y) => ("m", x, y) }.toDF("k", "x", "y")
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map { case (x, y) => x.toDouble * y }.sum
    val sxx = pts.map { case (x, _) => x.toDouble * x }.sum
    val den = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / den
    val pred = (sy * sxx - sx * sxy + (n * sxy - sx * sy) * (5 + 2)) / den
    val got = SF.predictLinear(df, Seq("k"), "x", "y", horizon = 2L)
      .as[(String, Long, Double, Double)].collect().head
    assert(got._3 == slope && got._4 == pred,
      "integer sums are exact, so the doubles agree bit-for-bit with the model")
  }

  test("acf: matches the direct estimator; lag-1 of an alternating series is negative") {
    // alternating series: strong negative lag-1, positive lag-2
    val ys = Seq(10L, 2L, 10L, 2L, 10L, 2L, 10L, 2L)
    val df = ys.zipWithIndex.map { case (y, i) => ("a", i.toLong, y) }
      .toDF("k", "t", "y")
    def model(k: Int): Double = {
      val n = ys.size
      val mean = ys.sum.toDouble / n
      val num = (k until n).map(t => (ys(t) - mean) * (ys(t - k) - mean)).sum
      val den = ys.map(y => (y - mean) * (y - mean)).sum
      num / den
    }
    val got = SF.acf(df, Seq("k"), "t", "y", maxLag = 3)
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(got._2 == ys.size.toLong)
    assert(math.abs(got._3 - model(1)) < 1e-12 && got._3 < 0,
      s"alternation -> negative lag-1 acf, got ${got._3}")
    assert(math.abs(got._4 - model(2)) < 1e-12 && got._4 > 0)
    assert(math.abs(got._5 - model(3)) < 1e-12)
    // constant series: zero variance -> NULL at every lag, never a throw
    val const = Seq(("c", 0L, 4L), ("c", 1L, 4L), ("c", 2L, 4L))
      .toDF("k", "t", "y")
    val c = SF.acf(const, Seq("k"), "t", "y", maxLag = 2)
      .as[(String, Long, Option[Double], Option[Double])].collect().head
    assert(c._3.isEmpty && c._4.isEmpty)
    // a series shorter than the lag yields NULL for that lag only
    val short = Seq(("s", 0L, 1L), ("s", 1L, 9L)).toDF("k", "t", "y")
    val row = SF.acf(short, Seq("k"), "t", "y", maxLag = 3)
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(row._3.nonEmpty && row._4.isEmpty && row._5.isEmpty)
  }
}
