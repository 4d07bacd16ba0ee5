package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-series transform functions from the reference family's query
  * language: difference, derivative, moving_average, cumulative_sum.
  * The storage engine under the reference emits raw or aggregated series;
  * these InfluxQL-layer transforms map 1:1 onto Spark window functions
  * over a per-series partitioning — ONE exchange by series key and one
  * in-partition sort covers any number of them (Catalyst collapses equal
  * window specs into a single Window operator).
  *
  * At 100 TB the per-key linear scan is the algorithm (each output point
  * depends on its predecessors), so a window over `partitionBy(series)`
  * is the right physical plan — the thing to avoid is a window with NO
  * partition key, which would single-task the corpus; these helpers all
  * require at least one key column.
  */
object SeriesFunctions {

  private def series(keyCols: Seq[String], timeCol: String): WindowSpec = {
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless window is a single task)")
    Window.partitionBy(keyCols.map(col): _*).orderBy(col(timeCol))
  }

  /** Classical additive seasonal decomposition (the moving-average STL
    * precursor every monitoring stack ships): over a REGULAR series —
    * one row per (key, bucket) — split `value = trend + seasonal +
    * remainder` at a fixed `period`.
    *
    * trend = centered moving average (the classic 2×MA for even periods:
    * half-weight endpoints, so the window spans exactly one cycle);
    * NULL until a full window exists. seasonal = per-(key, phase) mean of
    * the detrended points, with `phase` supplied by the caller (e.g.
    * `(bucket_index) % period` — a column, so month-of-year or
    * hour-of-day phases both fit). remainder = value − trend − seasonal.
    *
    * Determinism: detrended points quantize to integer micro-units
    * before the phase mean (one exact integer sum + one division), so
    * the only float expressions are fixed-arity per-row formulas any
    * engine evaluates in the same order. Scale shape: the shared
    * one-exchange series window for the trend, then one groupBy to a
    * keys×period metadata frame joined back under AQE broadcast. */
  def seasonalDecompose(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, period: Int, phase: Column,
      trendOut: String = "trend", seasonalOut: String = "seasonal",
      remainderOut: String = "remainder"): DataFrame = {
    require(period >= 2, s"need period >= 2, got $period")
    val w = series(keyCols, timeCol)
    val v = col(valueCol)
    val half = period / 2
    // terms in window order so the left-assoc float sum is reproducible
    val terms: Seq[Column] =
      if (period % 2 == 0)
        (lit(0.5) * lag(v, half).over(w)) +:
          ((-(half - 1) to half - 1).map {
            case 0          => v
            case i if i < 0 => lag(v, -i).over(w)
            case i          => lead(v, i).over(w)
          }) :+ (lit(0.5) * lead(v, half).over(w))
      else
        (-half to half).map {
          case 0          => v
          case i if i < 0 => lag(v, -i).over(w)
          case i          => lead(v, i).over(w)
        }
    val trended = df
      .withColumn(trendOut, terms.reduceLeft(_ + _) / lit(period))
      .withColumn("__ph", phase)
      .withColumn("__dq",
        round((v - col(trendOut)) * 1e6).cast("long"))
    val seasonal = trended.groupBy((keyCols.map(col) :+ col("__ph")): _*)
      .agg(sum(col("__dq")).as("__s"), count(col("__dq")).as("__n"))
      // all-null phase group: no seasonal estimate (ANSI-safe 0-count)
      .select((keyCols.map(col) :+ col("__ph") :+
        when(col("__n") > 0L, col("__s").cast("double") / col("__n"))
          .as("__sq")): _*)
    trended
      .join(seasonal, keyCols :+ "__ph", "left")
      .withColumn(seasonalOut, col("__sq") / lit(1e6))
      .withColumn(remainderOut, v - col(trendOut) - col(seasonalOut))
      .drop("__ph", "__dq", "__sq")
  }

  /** value - previous value within the series; NULL for the first point
    * (InfluxQL `difference`). */
  def difference(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    df.withColumn(out, col(valueCol) - lag(col(valueCol), 1).over(w))
  }

  /** Rate of change per `unitNs` of elapsed time (InfluxQL `derivative`):
    * (v - v_prev) / ((t - t_prev) / unit). NULL for the first point;
    * equal-timestamp neighbors yield NULL (division guard) rather than an
    * ANSI divide-by-zero error. */
  def derivative(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, unitNs: Long, out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    val dv = col(valueCol) - lag(col(valueCol), 1).over(w)
    val dt = (col(timeCol) - lag(col(timeCol), 1).over(w)).cast("double")
    df.withColumn(out, when(dt > 0.0, dv / (dt / lit(unitNs.toDouble))))
  }

  /** Trailing moving average over the last `n` points (InfluxQL
    * `moving_average`): NULL until a full window of `n` points exists,
    * matching InfluxQL's emit-from-the-nth-point rule. */
  def movingAverage(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, "moving average window must be >= 1 point")
    val w = series(keyCols, timeCol)
    val frame = w.rowsBetween(-(n - 1), 0)
    df.withColumn(out,
      when(count(col(valueCol)).over(frame) === n,
        avg(col(valueCol)).over(frame)))
  }

  /** Flux `timedMovingAverage`: mean over the trailing `windowNs` of
    * EVENT TIME (`(t − windowNs, t]`, a RANGE frame) rather than the
    * last n rows — the right smoother for irregularly-sampled series,
    * where a row window spans wildly different durations. For
    * cross-engine exactness feed an integer-quantized value column (the
    * single sum/count division is then identical IEEE everywhere). */
  def timedMovingAverage(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, windowNs: Long,
      out: String): DataFrame = {
    require(windowNs >= 1, s"window must be positive: $windowNs")
    val w = series(keyCols, timeCol).rangeBetween(-(windowNs - 1), 0)
    df.withColumn(out, avg(col(valueCol)).over(w))
  }

  /** Running total within the series (InfluxQL `cumulative_sum`). */
  def cumulativeSum(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, out: String): DataFrame =
    df.withColumn(out, sum(col(valueCol))
      .over(series(keyCols, timeCol).rowsBetween(Window.unboundedPreceding, 0)))

  /** `non_negative_difference` / `non_negative_derivative`: the same
    * transforms with negative results suppressed to NULL — the Flux
    * `derivative(nonNegative: true)` rule (InfluxQL's spelling omits the
    * row instead; a `.filter(col(out).isNotNull)` on top recovers it). */
  def nonNegativeDifference(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, out: String): DataFrame =
    suppressNegative(difference(df, keyCols, timeCol, valueCol, out), out)

  def nonNegativeDerivative(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, unitNs: Long, out: String): DataFrame =
    suppressNegative(
      derivative(df, keyCols, timeCol, valueCol, unitNs, out), out)

  private def suppressNegative(df: DataFrame, out: String): DataFrame =
    df.withColumn(out, when(col(out) >= 0.0, col(out)))

  /** Flux/PromQL-style counter `increase`: the running total of
    * non-negative deltas within the series; a decrease is a counter
    * reset, and the post-reset value is what gets added (the counter
    * restarted from zero and counted up to it). The first point
    * contributes 0. Same one-exchange window shape as its siblings. */
  def increase(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("__incr_d",
        when(prev.isNull, lit(0.0))
          .when(col(valueCol) < prev, col(valueCol))
          .otherwise(col(valueCol) - prev))
      .withColumn(out, sum(col("__incr_d"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__incr_d")
  }

  /** PromQL `resets`: per series, how many times the counter DECREASED —
    * each drop is a counter restart (process restart, scrape of a new
    * instance). The count is an aggregate per series, one row each;
    * the drop test compares identical raw values on any engine (no
    * arithmetic), so the integer count is engine-proof by construction.
    * Same one-exchange window + keyed aggregate shape as its siblings. */
  def resets(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    val prev = lag(col(valueCol), 1).over(w)
    df.withColumn("__rst",
        when(prev.isNotNull && col(valueCol) < prev, 1L).otherwise(0L))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__rst")).as(out), count(lit(1)).as("n_points"))
  }

  /** Nanoseconds since the previous point (InfluxQL `elapsed`). */
  def elapsed(df: DataFrame, keyCols: Seq[String], timeCol: String,
      out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    df.withColumn(out, col(timeCol) - lag(col(timeCol), 1).over(w))
  }

  /** Gap (outage) detection: spans between consecutive points whose
    * elapsed time exceeds `thresholdNs`, one row per gap —
    * (keys…, gap_start, gap_end, gap_ns). The lag is the shared
    * one-exchange series window; the filter keeps only the rare
    * over-threshold rows, so the output is sized by gaps, not points. */
  def gaps(df: DataFrame, keyCols: Seq[String], timeCol: String,
      thresholdNs: Long): DataFrame = {
    val w = series(keyCols, timeCol)
    df.withColumn("__gap_prev", lag(col(timeCol), 1).over(w))
      .filter(col(timeCol) - col("__gap_prev") > thresholdNs)
      .select(keyCols.map(col) ++ Seq(col("__gap_prev").as("gap_start"),
        col(timeCol).as("gap_end"),
        (col(timeCol) - col("__gap_prev")).as("gap_ns")): _*)
  }

  /** PromQL-faithful `rate()` over fixed windows (the classic Prometheus
    * extrapolatedRate algorithm, promql/functions.go): per series and
    * per `windowNs` bucket, the reset-aware increase of the in-bucket
    * samples, extrapolated to the bucket edges — extend by the actual
    * edge distance when the first/last sample sits close to it
    * (< 1.1× the average sample spacing), by half an average spacing
    * otherwise, and never past the counter's zero crossing. Buckets with
    * under two samples (or zero sampled interval) emit nothing, like
    * Prometheus. Output: (keys…, time = bucket end ns, `out` =
    * value-units per second).
    *
    * Pass an integer-quantized value column (e.g. cents): the in-bucket
    * increase then sums exactly, and every remaining step is a mirrored
    * IEEE double expression any engine replays bit-identically. One
    * exchange: the in-bucket lag window and the bucket aggregate share
    * the (keys, bucket) partitioning. */
  def promRate(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, windowNs: Long, out: String): DataFrame = {
    require(keyCols.nonEmpty,
      "rate needs a partition key (a keyless window is a single task)")
    require(windowNs > 0, "window must be positive")
    // materialize the bucket column FIRST and key both the lag window
    // and the aggregate on the same attribute, so Catalyst plans a
    // single (keys, bucket) exchange feeding both
    val wIn = Window.partitionBy(keyCols.map(col) :+ col("__pr_b"): _*)
      .orderBy(col(timeCol))
    val prev = lag(col(valueCol), 1).over(wIn)
    val contrib = when(prev.isNull, lit(0L))
      .when(col(valueCol) < prev, col(valueCol))
      .otherwise(col(valueCol) - prev)
    val g = df.withColumn("__pr_b", expr(s"$timeCol div ${windowNs}L"))
      .withColumn("__pr_c", contrib)
      .groupBy(keyCols.map(col) :+ col("__pr_b").as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        min(col(timeCol)).as("ft"), max(col(timeCol)).as("lt"),
        min(struct(col(timeCol), col(valueCol))).as("fs"),
        sum(col("__pr_c")).as("inc"))
      .filter(col("n") >= 2 && col("lt") > col("ft"))
    val rangeStart = col("bucket") * windowNs
    val rangeEnd = (col("bucket") + 1) * windowNs
    val d2s = (col("ft") - rangeStart).cast("double")
    val d2e = (rangeEnd - col("lt")).cast("double")
    val si = (col("lt") - col("ft")).cast("double")
    val avgd = si / (col("n") - 1).cast("double")
    val thr = avgd * 1.1
    val fv = col("fs").getField(valueCol).cast("double")
    val incD = col("inc").cast("double")
    val extS0 = when(d2s >= thr, avgd / 2.0).otherwise(d2s)
    // counter zero guard: the guarded division keeps ANSI mode happy
    // (inc = 0 makes the condition NULL, i.e. false) without changing
    // any computed value
    val d2zGuard = si * (fv / when(incD > 0, incD))
    val extS = when(incD > 0 && fv >= 0 && d2zGuard < extS0,
      si * (fv / incD)).otherwise(extS0)
    val extE = when(d2e >= thr, avgd / 2.0).otherwise(d2e)
    val rate = incD * ((si + extS + extE) / si) / lit(windowNs / 1e9)
    g.select(keyCols.map(col) :+ rangeEnd.as("time") :+ rate.as(out): _*)
  }

  /** Largest-Triangle-One-Bucket downsampling (Steinarsson 2013, the
    * declarative sibling of LTTB): each point's "effective area" is the
    * doubled triangle area it forms with its immediate neighbors, and
    * each fixed `bucketNs` time bucket keeps its max-area point — the
    * visually dominant one. All-integer: time is taken to µs grain
    * (`t div 1000` — exact for the engine's µs-truncated ns longs, and
    * it keeps the cross product far from Long overflow), the value is
    * caller-pre-quantized (cents), and the area stays doubled/unsquared
    * so no division or sqrt appears — the argmax is exact. Endpoint
    * rule: a point missing a neighbor (series first/last) gets
    * Long.MaxValue area, so series endpoints always survive (LTTB's
    * keep-the-ends rule). Ties break to the earliest, then smallest,
    * point via one lexicographic max struct — a map-side-combining
    * aggregate, not a rank window. One exchange total: the neighbor
    * window and the bucket argmax share the series partitioning. */
  def ltobDownsample(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucket must be positive")
    val w = series(keyCols, timeCol)
    val tU = expr(s"$timeCol div 1000")
    val tPrev = lag(tU, 1).over(w)
    val tNext = lead(tU, 1).over(w)
    val v = col(valueCol)
    val vPrev = lag(v, 1).over(w)
    val vNext = lead(v, 1).over(w)
    val area2 = when(tPrev.isNull || tNext.isNull, lit(Long.MaxValue))
      .otherwise(abs((tPrev - tNext) * (v - vPrev) - (tPrev - tU) * (vNext - vPrev)))
    df.withColumn("__ltob_area", area2)
      .withColumn("__ltob_bucket", expr(s"$timeCol div ${bucketNs}L"))
      .groupBy(keyCols.map(col) :+ col("__ltob_bucket").as("bucket"): _*)
      .agg(max(struct(col("__ltob_area"), (-col(timeCol)).as("__nt"),
        (-v).as("__nv"), col(timeCol).as("t"), v.as("v"))).as("__m"))
      .select(keyCols.map(col) ++ Seq(col("bucket"),
        col("__m.t").as(timeCol), col("__m.v").as(valueCol)): _*)
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013, the
    * canonical dashboard downsampler), adapted to fixed TIME buckets:
    * the series' first and last points always survive; every other
    * point is a candidate in its `t div bucketNs` bucket, and each
    * bucket keeps the point forming the largest triangle with the
    * PREVIOUS bucket's selected point and the NEXT bucket's average
    * point (the last bucket uses the series' final point as its
    * "next"). Unlike [[ltobDownsample]] (each point scored against its
    * immediate neighbors — fully declarative), the previous-selection
    * dependency makes LTTB a per-series sequential recursion, so it
    * rides the documented `mapPartitions` scan (one shuffle on the key)
    * with O(two buckets) state.
    *
    * Exactness contract (the [[ltobDownsample]] discipline): `valueCol`
    * must be caller-pre-quantized to integral doubles (cents/micros);
    * times are taken to µs grain for the area only. The doubled area is
    * cross-multiplied by the next bucket's count — `|(q.t·n − Σt)·(p.v −
    * q.v) − (q.t − p.t)·(Σv − q.v·n)|`, exact BigInt integers on this
    * side and HUGEINT in any SQL replay — ties to the earliest
    * candidate. Returns (keys…, timeCol, valueCol, endpoint). */
  def lttbDownsample(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucket must be positive")
    scanSeriesFlush(df, keyCols, timeCol, valueCol)(() => new SeriesScanner {
      private case class P(t: Long, v: Long)
      private var first: P = null
      private var pend: P = null // one-point lookahead: the series LAST
      private var bufA = List.empty[P]; private var bktA = Long.MinValue
      private var bufB = List.empty[P]; private var bktB = Long.MinValue
      private var prev: P = null
      private def us(t: Long): Long = t / 1000L
      private def area2n(q: P, c: P, st: BigInt, sv: BigInt, n: Long): BigInt =
        ((BigInt(us(q.t)) * n - st) * (c.v - q.v) -
          BigInt(us(q.t) - us(c.t)) * (sv - BigInt(q.v) * n)).abs
      private def pick(cands: List[P], st: BigInt, sv: BigInt,
          n: Long): P =
        cands.minBy(c => (-area2n(prev, c, st, sv, n), c.t, c.v))
      private def bucketStats(b: List[P]): (BigInt, BigInt, Long) =
        (b.iterator.map(p => BigInt(us(p.t))).sum,
          b.iterator.map(p => BigInt(p.v)).sum, b.size.toLong)
      private def finalizeA(nextSt: BigInt, nextSv: BigInt,
          nextN: Long): List[(Long, Double, Boolean)] = {
        val sel = pick(bufA.reverse, nextSt, nextSv, nextN)
        prev = sel
        List((sel.t, sel.v.toDouble, false))
      }
      private def candidate(c: P): List[(Long, Double, Boolean)] = {
        val b = Math.floorDiv(c.t, bucketNs)
        if (bufA.isEmpty && bufB.isEmpty) { bufA = c :: Nil; bktA = b; Nil }
        else if (b == bktA && bufB.isEmpty) { bufA = c :: bufA; Nil }
        else if (bufB.isEmpty || b == bktB) {
          if (bufB.isEmpty) bktB = b
          bufB = c :: bufB; Nil
        } else { // b starts a third non-empty bucket: A is finalizable
          val (st, sv, n) = bucketStats(bufB)
          val out = finalizeA(st, sv, n)
          bufA = bufB; bktA = bktB
          bufB = c :: Nil; bktB = b
          out
        }
      }
      def step(t: Long, v: Double): List[(Long, Double, Boolean)] = {
        val p = P(t, math.rint(v).toLong)
        if (first == null) {
          first = p; prev = p
          List((p.t, p.v.toDouble, true))
        } else if (pend == null) { pend = p; Nil }
        else { val c = pend; pend = p; candidate(c) }
      }
      def finish(): List[(Long, Double, Boolean)] = {
        if (pend == null) Nil // 1-point series: first already emitted
        else {
          val last = pend
          val outA = if (bufA.nonEmpty) {
            if (bufB.nonEmpty) {
              val (st, sv, n) = bucketStats(bufB)
              finalizeA(st, sv, n)
            } else finalizeA(BigInt(us(last.t)), BigInt(last.v), 1L)
          } else Nil
          val outB = if (bufB.nonEmpty) {
            bufA = bufB; bktA = bktB; bufB = Nil
            finalizeA(BigInt(us(last.t)), BigInt(last.v), 1L)
          } else Nil
          outA ++ outB ++ List((last.t, last.v.toDouble, true))
        }
      }
    })(valueCol, "endpoint")
  }

  /** Chande momentum oscillator over the last `n` changes (InfluxQL
    * `chande_momentum_oscillator`): 100·(Σgains − Σlosses)/(Σgains +
    * Σlosses), emitted once a full window of `n` changes exists; a
    * flat window (zero denominator) scores 0. Pure window math — one
    * exchange + sort shared with every sibling transform. */
  def chandeMomentumOscillator(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, s"CMO period out of range: $n")
    val w = series(keyCols, timeCol)
    val frame = w.rowsBetween(-(n - 1), 0)
    val ch = col(valueCol) - lag(col(valueCol), 1).over(w)
    val d = df.withColumn("__ch", ch)
    val up = sum(greatest(col("__ch"), lit(0.0))).over(frame)
    val dn = sum(greatest(-col("__ch"), lit(0.0))).over(frame)
    d.withColumn(out,
        when(count(col("__ch")).over(frame) === n,
          when(up + dn === 0.0, 0.0)
            .otherwise(lit(100.0) * (up - dn) / (up + dn))))
      .drop("__ch")
  }

  /** Kaufman's efficiency ratio over the last `n` changes (InfluxQL
    * `kaufmans_efficiency_ratio`): |net change over n points| / Σ|change|,
    * emitted once `n` changes exist; zero volatility scores 0. */
  def kaufmanEfficiencyRatio(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, s"efficiency-ratio period out of range: $n")
    val w = series(keyCols, timeCol)
    val frame = w.rowsBetween(-(n - 1), 0)
    val ch = col(valueCol) - lag(col(valueCol), 1).over(w)
    val d = df.withColumn("__ch", ch)
    val vol = sum(abs(col("__ch"))).over(frame)
    val net = abs(col(valueCol) - lag(col(valueCol), n).over(w))
    d.withColumn(out,
        when(count(col("__ch")).over(frame) === n,
          when(vol === 0.0, 0.0).otherwise(net / vol)))
      .drop("__ch")
  }

  /** Exponential moving average (Flux `exponentialMovingAverage` rule:
    * the first EMA value IS the first point; after that
    * `ema = α·v + (1-α)·ema_prev`). The recursion makes every output
    * depend on ALL predecessors, so no window frame expresses it — this
    * is the one place the per-series scan drops to `mapPartitions`
    * (the documented last resort): one shuffle on the key, one
    * in-partition spillable sort, then a linear run-detecting pass with
    * O(1) state — the same physical shape as the series-set converter.
    * Returns (keys..., timeCol, out); key columns come back as strings
    * (they ride the scan as the run-detection key). */
  def exponentialMovingAverage(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, alpha: Double,
      out: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0, 1]: $alpha")
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    // null points carry no EMA contribution and the tuple decode below is
    // primitive (a null time/value would throw "Null value appeared in
    // non-nullable field") — drop them up front, like the sibling
    // window-based transforms whose window functions skip nulls
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var ema = 0.0
        it.map { case (k, t, v) =>
          if (k != curKey) { curKey = k; ema = v }
          else ema = alpha * v + (1.0 - alpha) * ema
          (k, t, ema)
        }
      }
      .toDF("__k", "__t", out)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(out)): _*)
  }

  /** DEMA and TEMA (Mulloy; InfluxQL `double_/triple_exponential_moving_
    * average`) in ONE series scan: the three chained EMA recursions
    * (e1 on the value, e2 on e1, e3 on e2) all update in O(1) state per
    * point, so one shuffle + sort + linear pass yields both outputs —
    * `dema = 2·e1 − e2`, `tema = 3·e1 − 3·e2 + e3`. Seeding follows the
    * same Flux rule as [[exponentialMovingAverage]]: each stage's first
    * value is its input's first value, so both start at the raw point. */
  def demaTema(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, alpha: Double, demaOut: String,
      temaOut: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0, 1]: $alpha")
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var e1 = 0.0; var e2 = 0.0; var e3 = 0.0
        it.map { case (k, t, v) =>
          if (k != curKey) { curKey = k; e1 = v; e2 = e1; e3 = e2 }
          else {
            e1 = alpha * v + (1.0 - alpha) * e1
            e2 = alpha * e1 + (1.0 - alpha) * e2
            e3 = alpha * e2 + (1.0 - alpha) * e3
          }
          (k, t, 2.0 * e1 - e2, 3.0 * e1 - 3.0 * e2 + e3)
        }
      }
      .toDF("__k", "__t", demaOut, temaOut)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(demaOut), col(temaOut)): _*)
  }

  /** Kaufman's adaptive moving average over an `n`-change efficiency
    * window (InfluxQL `kaufmans_adaptive_moving_average`; Kaufman's
    * published fast=2 / slow=30 smoothing bounds). Per point once `n`
    * changes exist: `er = |v − v_n| / Σ|Δv|` over the trailing window,
    * `sc = (er·(2/3 − 2/31) + 2/31)²`, `kama ← kama + sc·(v − kama)`;
    * the first eligible output seeds at the raw point (the same rule the
    * sibling EMA uses) and warm-up points emit NULL. The recursion makes
    * every output depend on all predecessors, so this rides the same
    * documented `mapPartitions` scan as EMA — one shuffle on the key,
    * O(n) ring-buffer state per task, never per key count. */
  def kaufmanAdaptiveMovingAverage(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, s"KAMA period out of range: $n")
    scanSeries(df, keyCols, timeCol, valueCol) { () =>
      // ring of the last n+1 values; er recomputed oldest->newest so the
      // accumulation order is fixed regardless of how rows arrive
      val ring = new Array[Double](n + 1)
      var seen = 0
      var kama = 0.0
      (v: Double) => {
        if (seen <= n) ring(seen) = v
        else { System.arraycopy(ring, 1, ring, 0, n); ring(n) = v }
        seen += 1
        if (seen < n + 1) None
        else if (seen == n + 1) { kama = v; Some(v) }
        else {
          var vol = 0.0
          var i = 1
          while (i <= n) { vol += math.abs(ring(i) - ring(i - 1)); i += 1 }
          val er = if (vol == 0.0) 0.0 else math.abs(ring(n) - ring(0)) / vol
          val sc = { val s = er * (2.0 / 3.0 - 2.0 / 31.0) + 2.0 / 31.0; s * s }
          kama += sc * (v - kama)
          Some(kama)
        }
      }
    }(out)
  }

  /** TRIX (InfluxQL `triple_exponential_derivative`): the 1-point percent
    * change of a triple-smoothed EMA with `α = 2/(n+1)` — each stage seeds
    * at its input's first value (Flux rule), and the output is
    * `100·(e3 − e3_prev)/e3_prev` from the second point on (NULL first
    * point; a zero previous e3 yields NULL, division guard). Same single
    * mapPartitions scan as the sibling recursions: O(1) state. */
  def tripleExponentialDerivative(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, s"TRIX period out of range: $n")
    val alpha = 2.0 / (n + 1)
    scanSeries(df, keyCols, timeCol, valueCol) { () =>
      var first = true
      var e1 = 0.0; var e2 = 0.0; var e3 = 0.0
      (v: Double) => {
        if (first) { first = false; e1 = v; e2 = v; e3 = v; None }
        else {
          val prev = e3
          e1 = alpha * v + (1.0 - alpha) * e1
          e2 = alpha * e1 + (1.0 - alpha) * e2
          e3 = alpha * e2 + (1.0 - alpha) * e3
          if (prev == 0.0) None else Some(100.0 * (e3 - prev) / prev)
        }
      }
    }(out)
  }

  /** Shared shape for the sequential per-series recursions: shuffle on the
    * key, spillable in-partition sort, one linear pass where `mk()` builds
    * a fresh per-series state machine returning `Option[Double]` per point
    * (None = warm-up NULL). Null times/values are dropped up front like
    * the sibling transforms' `lag` would skip them. */
  /** Tabular CUSUM change detection (Page 1954 — the classic sequential
    * drift detector): per series,
    * `S⁺ ← max(0, S⁺ + (v − target − slack))` and
    * `S⁻ ← max(0, S⁻ + (target − v − slack))`, alarming when either
    * side exceeds `threshold`. Catches small sustained shifts a
    * point-wise z-score ([[anomalyFlags]]) never accumulates.
    *
    * Exactness: feed integer-quantized values (cents) and integer
    * target/slack/threshold — the recursion is then pure integer
    * arithmetic carried exactly in doubles (< 2⁵³), so any engine
    * replays it bit-identically (the oracle uses a recursive CTE on
    * BIGINTs). Shape: the [[scanSeries]] posture — shuffle on the
    * series key, spillable in-partition sort, O(1) state per series;
    * sequential recursion is the documented mapPartitions last resort. */
  def cusum(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, target: Double, slack: Double, threshold: Double,
      posOut: String = "cusum_pos", negOut: String = "cusum_neg",
      alarmOut: String = "alarm"): DataFrame = {
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var sp = 0.0
        var sn = 0.0
        it.map { case (k, t, v) =>
          if (k != curKey) { curKey = k; sp = 0.0; sn = 0.0 }
          sp = math.max(0.0, sp + (v - target - slack))
          sn = math.max(0.0, sn + (target - v - slack))
          (k, t, sp, sn, sp > threshold || sn > threshold)
        }
      }
      .toDF("__k", "__t", posOut, negOut, alarmOut)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(posOut), col(negOut),
      col(alarmOut)): _*)
  }

  /** Per-series sequential recursion with BOUNDED lookahead and an
    * end-of-series flush — the [[scanSeries]] shape (shuffle on the
    * series key, spillable in-partition sort, per-series state)
    * generalized for recursions that (a) may emit zero or several rows
    * per input and (b) must emit trailing rows when a series ends
    * (forecast horizons). `mk()` builds one scanner per series;
    * `step`/`finish` return EAGER lists so state mutation order never
    * depends on downstream consumption. State and per-step emission must
    * be O(bounded-parameter), never O(series length) — this is what keeps
    * the shape spill-safe on a raw unbucketed series. */
  private trait SeriesScanner {
    def step(t: Long, v: Double): List[(Long, Double, Boolean)]
    def finish(): List[(Long, Double, Boolean)]
  }

  private def scanSeriesFlush(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String)(mk: () => SeriesScanner)(
      out: String, flagOut: String): DataFrame = {
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { rows =>
        new Iterator[(Seq[String], Long, Double, Boolean)] {
          private var outBuf: Iterator[(Seq[String], Long, Double, Boolean)] =
            Iterator.empty
          private var curKey: Seq[String] = null
          private var sc: SeriesScanner = null
          private var done = false
          private def tag(k: Seq[String], xs: List[(Long, Double, Boolean)]) =
            xs.iterator.map { case (t, x, f) => (k, t, x, f) }
          private def fill(): Unit =
            while (!outBuf.hasNext && !done) {
              if (rows.hasNext) {
                val (k, t, v) = rows.next()
                if (k != curKey) {
                  val flushed =
                    if (sc == null) Iterator.empty else tag(curKey, sc.finish())
                  curKey = k
                  sc = mk()
                  val stepped = tag(k, sc.step(t, v)) // eager: step runs NOW
                  outBuf = flushed ++ stepped
                } else outBuf = tag(curKey, sc.step(t, v))
              } else {
                done = true
                if (sc != null) { outBuf = tag(curKey, sc.finish()); sc = null }
              }
            }
          def hasNext: Boolean = { fill(); outBuf.hasNext }
          def next(): (Seq[String], Long, Double, Boolean) = {
            fill(); outBuf.next()
          }
        }
      }
      .toDF("__k", "__t", out, flagOut)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(out), col(flagOut)): _*)
  }

  private def scanSeries(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String)(mk: () => Double => Option[Double])(
      out: String): DataFrame = {
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var step: Double => Option[Double] = null
        it.map { case (k, t, v) =>
          if (k != curKey) { curKey = k; step = mk() }
          (k, t, step(v))
        }
      }
      .toDF("__k", "__t", out)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(out)): _*)
  }

  /** Relative strength index over `n` changes (Wilder; InfluxQL
    * `relative_strength_index`): the first average gain/loss is the plain
    * mean of the first `n` changes, after which Wilder smoothing applies
    * (`a ← (a·(n−1) + x)/n`); `rsi = 100 − 100/(1 + ag/al)`, 100 when
    * the loss average is zero. Warm-up points (fewer than `n` changes)
    * emit NULL. One scan, O(1) state — the seed is two running sums. */
  def relativeStrengthIndex(df: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCol: String, n: Int, out: String): DataFrame = {
    require(n >= 1, s"RSI period out of range: $n")
    require(keyCols.nonEmpty,
      "series functions need a partition key (a keyless scan is a single task)")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val scanned = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var i = 0; var prev = 0.0
        var sg = 0.0; var sl = 0.0; var ag = 0.0; var al = 0.0
        it.map { case (k, t, v) =>
          if (k != curKey) {
            curKey = k; i = 1; prev = v; sg = 0.0; sl = 0.0; ag = 0.0; al = 0.0
          } else {
            i += 1
            val g = math.max(v - prev, 0.0)
            val l = math.max(-(v - prev), 0.0)
            prev = v
            if (i <= n + 1) {
              sg += g; sl += l
              if (i == n + 1) { ag = sg / n; al = sl / n }
            } else {
              ag = (ag * (n - 1) + g) / n
              al = (al * (n - 1) + l) / n
            }
          }
          val rsi: Option[Double] =
            if (i >= n + 1)
              Some(if (al == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + ag / al))
            else None
          (k, t, rsi)
        }
      }
      .toDF("__k", "__t", out)
    scanned.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col("__t").as(timeCol), col(out)): _*)
  }

  /** Rolling z-score anomaly flags over an INTEGER-quantized value
    * column (e.g. cents): a point is anomalous when it sits more than
    * `sigmas` standard deviations from the mean of the previous `n`
    * points (the trailing window EXCLUDES the current point — an
    * anomaly must not drag its own baseline). The test is evaluated
    * WITHOUT division or sqrt: with window sums s = Σx, ss = Σx²,
    *   (v − s/n)² > σ²·(n·ss − s²)/n²  ⇔  (v·n − s)² > σ²·(n·ss − s²)
    * — all-long arithmetic, so the flag is EXACT and engine-identical
    * (no float comparison anywhere). Points without a full trailing
    * window emit NULL. One exchange + sort shared with the siblings. */
  def anomalyFlags(df: DataFrame, keyCols: Seq[String], timeCol: String,
      quantCol: String, n: Int, sigmas: Int, out: String): DataFrame = {
    require(n >= 2, s"baseline window must be >= 2 points: $n")
    require(sigmas >= 1, s"sigma threshold out of range: $sigmas")
    val w = series(keyCols, timeCol).rowsBetween(-n, -1)
    val v = col(quantCol).cast("long")
    val s = sum(v).over(w)
    val ss = sum(v * v).over(w)
    val cnt = count(v).over(w)
    val dev = v * cnt - s // (v − mean)·n, exact
    df.withColumn(out,
      when(cnt === n,
        dev * dev > lit(sigmas.toLong * sigmas) * (cnt * ss - s * s)))
  }

  /** Flux `stateCount`: for each point, how many CONSECUTIVE points
    * (this one included) have satisfied `pred`; `-1` outside the state —
    * the alerting streak counter ("N readings above threshold in a
    * row"). Window math: with per-series row numbers, the streak length
    * is `rn − rn_of_last_non_matching_point`; one exchange + sort shared
    * with every sibling transform. */
  def stateCount(df: DataFrame, keyCols: Seq[String], timeCol: String,
      pred: Column, out: String): DataFrame = {
    val w = series(keyCols, timeCol)
    val upTo = w.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__lastF",
        max(when(!pred, col("__rn"))).over(upTo))
      .withColumn(out,
        when(pred, col("__rn") - coalesce(col("__lastF"), lit(0)))
          .otherwise(lit(-1)).cast("long"))
      .drop("__rn", "__lastF")
  }

  /** Flux `stateDuration`: elapsed time (in `unitNs` units, integer
    * division) since the current state began — 0 at the state's first
    * point, `-1` outside it. The state-start time needs a second window
    * PARTITIONED BY the streak id (the running count of non-matching
    * points); Catalyst plans the second exchange on the finer
    * (series, streak) key. */
  def stateDuration(df: DataFrame, keyCols: Seq[String], timeCol: String,
      pred: Column, unitNs: Long, out: String): DataFrame = {
    require(unitNs > 0, s"unit must be positive: $unitNs")
    val w = series(keyCols, timeCol)
    val upTo = w.rowsBetween(Window.unboundedPreceding, 0)
    val withSid = df.withColumn("__sid",
      sum(when(pred, 0).otherwise(1)).over(upTo))
    val wSid = Window
      .partitionBy((keyCols.map(col) :+ col("__sid")): _*)
      .orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    withSid
      .withColumn("__t0", min(when(pred, col(timeCol))).over(wSid))
      .withColumn(out,
        when(pred, expr(s"(`$timeCol` - __t0) div ${unitNs}L"))
          .otherwise(lit(-1L)))
      .drop("__sid", "__t0")
  }

  /** Holt linear-trend (double exponential) smoothing — the seasonless
    * core of InfluxQL's `holt_winters` (the reference family fits
    * α/β by Nelder–Mead; we take them as explicit parameters so results
    * are deterministic and engine-reproducible). Carries a level `l` and
    * trend `b` per series and emits the one-step-ahead fit `l + b` after
    * each observed point:
    *   l' = α·v + (1−α)·(l + b);  b' = β·(l' − l) + (1−β)·b
    * seeded at the second point with l = v₂, b = v₂ − v₁ (first point
    * emits NULL). O(1) state on the shared shuffle+sort+scan shape. */
  def holtLinear(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, alpha: Double, beta: Double, out: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of range: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta out of range: $beta")
    scanSeries(df, keyCols, timeCol, valueCol) { () =>
      var i = 0; var l = 0.0; var b = 0.0
      (v: Double) => {
        i += 1
        if (i == 1) { l = v; None }
        else {
          if (i == 2) { b = v - l; l = v }
          else {
            val nl = alpha * v + (1.0 - alpha) * (l + b)
            b = beta * (nl - l) + (1.0 - beta) * b
            l = nl
          }
          Some(l + b)
        }
      }
    }(out)
  }

  /** Holt linear-trend FORECAST — the h-step extrapolation InfluxQL's
    * `HOLT_WINTERS(…, N, 0)` returns: run the smoothing recursion to the
    * series end, then emit N points `l + i·b` at `tᴺ + i·stepNs`. The
    * recursion rides the shared per-series scan; the final (l, b, t)
    * state per series is a last-row aggregate (max-time argmax — bounded,
    * map-side combining), and the forecast rows are a ×N explode of that
    * k-row frame: corpus-scan cost + O(series · N) generation, no second
    * pass over the data. */
  /** Additive seasonal Holt-Winters (triple exponential smoothing):
    * level/trend as [[holtLinear]] plus an S-slot seasonal ring. The
    * reference's 1.x holt_winters fits (α, β, γ) per call with a
    * Nelder-Mead optimization — seed- and iteration-order-sensitive, so
    * no second engine can replay it — hence this engine's deterministic
    * contract: EXPLICIT smoothing parameters and the classical
    * initialization (level = mean of season one, trend =
    * (mean₂ − mean₁)/S, seasonalᵢ = xᵢ − mean₁), recurrence from t = S.
    * A series shorter than 2·S yields nothing (the init needs two full
    * seasons).
    *
    * Shape: the [[scanSeriesFlush]] posture — shuffle on the series key,
    * spillable in-partition sort, and O(S + n) state per series: the
    * classical init needs the first 2·S points (a bounded lookahead, so
    * exactly those rows are buffered; the fits for rows S..2S−1 are
    * emitted in one burst when row 2S−1 arrives), after which the scan
    * streams with just the S-slot ring, and the forecast tail flushes at
    * the series boundary. State never grows with series length, so the
    * public operator is safe on a raw unbucketed series, not only on the
    * planner's GROUP BY time() frames.
    *
    * Returns `(fit, forecast)`: fit = one-step-ahead prediction
    * `l + b + s[t mod S]` at every observed bucket from t = S on
    * (holt_winters_with_fit's observed half); forecast = `n` points past
    * the last bucket, `l + h·b + s[(T−1+h) mod S]`. */
  def holtSeasonal(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, alpha: Double, beta: Double, gamma: Double,
      n: Int, season: Int, stepNs: Long,
      out: String): (DataFrame, DataFrame) = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of range: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta out of range: $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma out of range: $gamma")
    require(n >= 1, s"forecast horizon out of range: $n")
    require(season >= 2, s"seasonal period out of range: $season")
    val s = season
    val rows = scanSeriesFlush(df, keyCols, timeCol, valueCol) { () =>
      new SeriesScanner {
        // lookahead buffer: ONLY the first 2S rows of the series
        private val buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)](2 * s)
        private var i = 0 // rows seen so far (this row's 0-based index)
        private var l = 0.0
        private var b = 0.0
        private var ring: Array[Double] = null // non-null once initialized
        private var lastT = 0L
        private def advance(v: Double, slot: Int): Unit = {
          val nl = alpha * (v - ring(slot)) + (1.0 - alpha) * (l + b)
          b = beta * (nl - l) + (1.0 - beta) * b
          ring(slot) = gamma * (v - nl) + (1.0 - gamma) * ring(slot)
          l = nl
        }
        def step(t: Long, v: Double): List[(Long, Double, Boolean)] = {
          lastT = t
          if (ring == null) {
            buf += ((t, v)); i += 1
            if (i < 2 * s) Nil
            else {
              // two full seasons in hand: classical init, then replay
              // the buffered second season's fits in arrival order
              val mean1 = buf.iterator.take(s).map(_._2).sum / s
              val mean2 = buf.iterator.slice(s, 2 * s).map(_._2).sum / s
              l = mean1
              b = (mean2 - mean1) / s
              ring = Array.tabulate(s)(j => buf(j)._2 - mean1)
              val fits = List.newBuilder[(Long, Double, Boolean)]
              var j = s
              while (j < 2 * s) {
                val (tj, vj) = buf(j)
                val slot = j % s
                fits += ((tj, l + b + ring(slot), false))
                advance(vj, slot)
                j += 1
              }
              buf.clear()
              fits.result()
            }
          } else {
            val slot = i % s
            val fit = (t, l + b + ring(slot), false)
            advance(v, slot)
            i += 1
            fit :: Nil
          }
        }
        def finish(): List[(Long, Double, Boolean)] =
          if (ring == null) Nil // shorter than two seasons: no output
          else (1 to n).iterator.map { h =>
            (lastT + h.toLong * stepNs,
              l + h * b + ring((i - 1 + h) % s), true)
          }.toList
      }
    }(out, "__fc")
    (rows.filter(!col("__fc")).drop("__fc"),
      rows.filter(col("__fc")).drop("__fc"))
  }

  def holtForecast(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, alpha: Double, beta: Double, n: Int, stepNs: Long,
      out: String): DataFrame = {
    require(n >= 1, s"forecast horizon out of range: $n")
    val spark = df.sparkSession
    import spark.implicits._
    val packed = df.na.drop(Seq(timeCol, valueCol)).select(
        array(keyCols.map(col(_).cast("string")): _*).as("__k"),
        col(timeCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .as[(Seq[String], Long, Double)]
    val states = packed
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"))
      .mapPartitions { it =>
        var curKey: Seq[String] = null
        var i = 0; var l = 0.0; var b = 0.0
        it.map { case (k, t, v) =>
          if (k != curKey) { curKey = k; i = 0 }
          i += 1
          if (i == 1) { l = v; b = 0.0 }
          else if (i == 2) { b = v - l; l = v }
          else {
            val nl = alpha * v + (1.0 - alpha) * (l + b)
            b = beta * (nl - l) + (1.0 - beta) * b
            l = nl
          }
          (k, t, l, b, i)
        }
      }
      .toDF("__k", "__t", "__l", "__b", "__i")
    // last state per series: max-time argmax via struct-max aggregate
    // (bounded, partial-aggregating — never a window over few partitions)
    val last = states
      .groupBy(col("__k"))
      .agg(max(struct(col("__t"), col("__i"), col("__l"), col("__b"))).as("__s"))
      .select(col("__k"), col("__s.__t").as("__t"), col("__s.__i").as("__i"),
        col("__s.__l").as("__l"), col("__s.__b").as("__b"))
      .filter(col("__i") >= 2) // a 1-point series has no trend to project
    val horizon = last.select(col("__k"), col("__t"), col("__l"), col("__b"),
        explode(sequence(lit(1), lit(n))).as("__h"))
      .select(col("__k"),
        (col("__t") + col("__h").cast("long") * lit(stepNs)).as(timeCol),
        (col("__l") + col("__h").cast("double") * col("__b")).as(out))
    horizon.select(keyCols.zipWithIndex.map { case (k, i) =>
      col("__k")(i).as(k)
    } ++ Seq(col(timeCol), col(out)): _*)
  }

  /** PromQL `predict_linear` / `deriv`: per-series ordinary least squares
    * of an INTEGER value column over an INTEGER x column (a bucket index
    * or re-based time), evaluated at `x_max + horizon`.
    *
    * Exactness discipline (the events_correlation co-moment spelling):
    * slope, intercept and the prediction are each a ratio of EXACT
    * integer polynomials in the per-key sums —
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²)
    *   intercept = (Σy·Σxx − Σx·Σxy) / (n·Σxx − (Σx)²)
    *   ŷ(x*)    = (Σy·Σxx − Σx·Σxy + (n·Σxy − Σx·Σy)·x*) / (n·Σxx − (Σx)²)
    * — numerator and denominator accumulate order-free in decimal(38,0)
    * (DuckDB twin: HUGEINT), and the ONLY float op per output is the one
    * final division of identical exact operands: bit-equal on any engine,
    * any partitioning. The built-in regr_slope/regr_intercept aggregates
    * accumulate doubles in partition order — banned here for that reason.
    *
    * Magnitude discipline: decimal(38,0) holds products of the RAW sums,
    * so feed a RE-BASED x (x − min(x), like feeding integer cents for y):
    * with x re-based, Σy·Σxx stays far under 10³⁸ even at 10¹²-row keys.
    * A constant series (den = 0) yields NULL slope/prediction.
    *
    * Scale shape: one partial-aggregating groupBy per key — no window, no
    * second pass; the output is one row per series. */
  def predictLinear(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String, horizon: Long, slopeOut: String = "slope",
      predictOut: String = "predicted"): DataFrame = {
    require(keyCols.nonEmpty, "predictLinear needs a series key")
    val dec = "decimal(38,0)"
    val xd = col(xCol).cast(dec)
    val yd = col(yCol).cast(dec)
    val g = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(xd).as("__sx"), sum(yd).as("__sy"),
        sum(xd * yd).as("__sxy"), sum(xd * xd).as("__sxx"),
        max(col(xCol)).as("__xmax"))
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val slopeNum = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val interNum = col("__sy") * col("__sxx") - col("__sx") * col("__sxy")
    val xStar = col("__xmax").cast(dec) + lit(horizon).cast(dec)
    val predNum = interNum + slopeNum * xStar
    g.select(keyCols.map(col) ++ Seq(
      col("__n").cast("long").as("n"),
      when(den =!= 0, slopeNum.cast("double") / den.cast("double"))
        .as(slopeOut),
      when(den =!= 0, predNum.cast("double") / den.cast("double"))
        .as(predictOut)): _*)
  }

  /** Per-series autocorrelation function at lags 1..`maxLag` over an
    * INTEGER value column — the stationarity/seasonality probe next to
    * [[seasonalDecompose]]. Uses the standard ACF estimator
    *   r_k = Σ_{t>k}(y_t − ȳ)(y_{t−k} − ȳ) / Σ_t(y_t − ȳ)²
    * with the FULL-series mean and variance in the denominator.
    *
    * Exactness: multiply the estimator through by n² so every term is an
    * exact integer polynomial in per-key sums —
    *   num_k = n²·P_k − n·S·(A_k + B_k) + m_k·S²
    *   den   = n²·Σy² − n·S²
    * where P_k = Σ y_t·y_{t−k}, A_k = Σ_{t>k} y_t, B_k = Σ_{t>k} y_{t−k},
    * m_k = n − k (rows where the lag exists), S = Σy. Sums accumulate
    * order-free in decimal(38,0) (DuckDB: HUGEINT); each r_k is ONE
    * final division of identical exact operands. A constant series
    * (den = 0) yields NULL.
    *
    * Scale shape: one keyed window (the shared series exchange) computes
    * the lag columns, one partial-aggregating groupBy reduces to a row
    * per series — output is series-count-sized, never corpus-sized. */
  def acf(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, maxLag: Int, outPrefix: String = "acf"): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val dec = "decimal(38,0)"
    val w = series(keyCols, timeCol)
    val y = col(valueCol).cast(dec)
    val lagged = (1 to maxLag).foldLeft(df) { (acc, k) =>
      acc.withColumn(s"__l$k", lag(col(valueCol), k).over(w).cast(dec))
    }
    val perLag = (1 to maxLag).flatMap { k =>
      val lk = col(s"__l$k")
      Seq(sum(when(lk.isNotNull, y * lk)).as(s"__p$k"),
        sum(when(lk.isNotNull, y)).as(s"__a$k"),
        sum(when(lk.isNotNull, lk)).as(s"__b$k"),
        count(lk).cast(dec).as(s"__m$k"))
    }
    val aggs = Seq(count(lit(1)).cast(dec).as("__n"), sum(y).as("__s"),
      sum(y * y).as("__syy")) ++ perLag
    val g = lagged.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val n = col("__n"); val s = col("__s")
    val den = n * n * col("__syy") - n * s * s
    val outs = (1 to maxLag).map { k =>
      val num = n * n * col(s"__p$k") - n * s * (col(s"__a$k") + col(s"__b$k")) +
        col(s"__m$k") * s * s
      when(den =!= 0, num.cast("double") / den.cast("double"))
        .as(s"$outPrefix$k")
    }
    g.select(keyCols.map(col) ++ Seq(col("__n").cast("long").as("n")) ++
      outs: _*)
  }
}
