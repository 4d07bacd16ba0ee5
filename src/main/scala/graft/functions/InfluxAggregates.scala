package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series aggregates from the reference family's query language that
  * sit a layer above the storage engine (the InfluxQL function surface,
  * like [[SeriesFunctions]] and [[graft.operators.GapFill]]): spread,
  * stddev, mode, percentile, integral, top/bottom.
  *
  * All of them are ONE hash-partitioned groupBy per call site — plain
  * codegen'd aggregates with map-side partial aggregation — except the
  * ones whose semantics are inherently order-dependent (integral needs
  * consecutive-point deltas, top/bottom keep the point's timestamp):
  * those use one window over the series partitioning, the same single
  * exchange + in-partition sort every other per-series operator here
  * rides.
  */
object InfluxAggregates {

  /** max - min (InfluxQL `spread`). A plain two-agg projection. */
  def spread(value: Column): Column = max(value) - min(value)

  /** Sample standard deviation (InfluxQL `stddev` divides by n-1). */
  def stddev(value: Column): Column = stddev_samp(value)

  /** Most frequent value; ties break to the SMALLEST value (InfluxQL
    * `mode`). Needs a count per distinct value first, so the caller runs
    * [[modeOf]] over a pre-counted frame — expressed as min_by over
    * (-count, value): the minimum of that pair is the highest count,
    * then the smallest value. */
  def modeOf(countCol: Column, valueCol: Column): Column =
    min_by(valueCol, struct((-countCol).as("nc"), valueCol.as("v")))

  /** Per-key mode in one shot: two cascaded hash aggregations (value
    * counting, then the min_by tie-break) — both shuffles are on keys
    * that only shrink the data, never a windowed sort. */
  def mode(df: DataFrame, keyCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val keys = keyCols.map(col)
    df.groupBy((keys :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(keys: _*)
      .agg(modeOf(col("__n"), col(valueCol)).as(out))
  }

  /** InfluxQL `percentile(field, p)`: the nearest-rank element — the
    * k-th smallest non-null value with k = floor(p/100 * n + 0.5)
    * (influxdb/query/call_iterator.go percentile rank rule). When k falls
    * outside [1, n] (e.g. percentile(field, 1) over 5 points gives k=0),
    * upstream emits NO point for that series — matched here: the rank
    * filter simply selects nothing, so the key is absent from the output.
    * (k > n cannot happen for p <= 100: floor(p/100*n + 0.5) <=
    * floor(n + 0.5) = n.) An EXACT per-series percentile: one window
    * ranking pass. Null values are excluded from ranking and count. */
  def percentile(df: DataFrame, keyCols: Seq[String], valueCol: String,
      p: Double, out: String): DataFrame = {
    require(p > 0 && p <= 100, s"percentile out of (0, 100]: $p")
    val keys = keyCols.map(col)
    val nn = df.filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val k = floor(lit(p / 100.0) *
      count(lit(1)).over(Window.partitionBy(keys: _*)) + lit(0.5))
    nn.withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__k", k)
      .filter(col("__rk") === col("__k"))
      .select((keys :+ col(valueCol).as(out)): _*)
  }

  /** InfluxQL `median`: the middle value of the sorted non-null values;
    * an EVEN count averages the two middle values — which is exactly why
    * this is NOT `percentile(50)` (nearest-rank picks one element). One
    * ranking window pass, then the two (or one, coinciding) middle ranks
    * average per key. */
  def median(df: DataFrame, keyCols: Seq[String], valueCol: String,
      out: String): DataFrame = {
    val keys = keyCols.map(col)
    val nn = df.filter(col(valueCol).isNotNull)
    val w = Window.partitionBy(keys: _*).orderBy(col(valueCol))
    val n = count(lit(1)).over(Window.partitionBy(keys: _*))
    nn.withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__lo", ((n + 1L) / 2L).cast("long"))
      .withColumn("__hi", ((n + 2L) / 2L).cast("long"))
      .filter(col("__rk") === col("__lo") || col("__rk") === col("__hi"))
      .groupBy(keys: _*)
      .agg(avg(col(valueCol)).as(out))
  }

  /** The percentile SCALE path: `percentile_approx` (Spark's
    * QuantileSummaries sketch — one hash aggregate with map-side partial
    * merge, no per-key window sort). [[percentile]] is exact nearest-rank
    * and needs one sorted window pass per series; at corpus scale prefer
    * this sketch and bound the error with `accuracy` (error <=
    * 1/accuracy relative rank). */
  def percentileApprox(df: DataFrame, keyCols: Seq[String], valueCol: String,
      p: Double, out: String, accuracy: Int = 10000): DataFrame = {
    require(p > 0 && p <= 100, s"percentile out of (0, 100]: $p")
    df.groupBy(keyCols.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(p / 100.0), lit(accuracy))
        .as(out))
  }

  /** InfluxQL `integral(field, unit)`: trapezoidal area under the series
    * on the time axis, in units of `unitNs` (default 1s). Consecutive
    * points i-1, i contribute (v[i-1] + v[i]) / 2 * (t[i] - t[i-1]) /
    * unit; a single-point series integrates to 0. One window (lag) +
    * one groupBy — the per-point term is computed in the same sorted
    * pass the series partitioning already provides. */
  def integral(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, unitNs: Long, out: String): DataFrame = {
    require(unitNs > 0, "integral unit must be positive ns")
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(timeCol))
    val pv = lag(col(valueCol), 1).over(w)
    val pt = lag(col(timeCol), 1).over(w)
    val term = (col(valueCol) + pv) / 2.0 *
      ((col(timeCol) - pt).cast("double") / lit(unitNs.toDouble))
    df.withColumn("__term", term)
      .groupBy(keys: _*)
      .agg(coalesce(sum(col("__term")), lit(0.0)).as(out))
  }

  /** Flux-style cumulative histogram (`histogram()` with explicit
    * upperBounds): one row per (keys..., le) with the count of values
    * `<= le`. Computed as ONE wide aggregate — a `sum(value <= b)`
    * column per bound, map-side partial aggregation, then an in-row
    * unpivot back to (le, n) rows. No explode of raw rows: the
    * rows×bounds blowup happens only on the already-aggregated frame. */
  def histogram(df: DataFrame, keyCols: Seq[String], valueCol: String,
      bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted,
      "histogram bounds must be non-empty and ascending")
    val keys = keyCols.map(col)
    val aggs = bounds.zipWithIndex.map { case (b, i) =>
      sum(when(col(valueCol) <= b, 1L).otherwise(0L)).as(s"__b$i")
    }
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .select(keys :+ explode(array(bounds.zipWithIndex.map { case (b, i) =>
        struct(lit(b).as("le"), col(s"__b$i").as("n"))
      }: _*)).as("__h"): _*)
      .select(keys :+ col("__h.le").as("le") :+ col("__h.n").as("n"): _*)
  }

  /** Flux `histogramQuantile(quantile: q)`: estimate the q-quantile from
    * a CUMULATIVE histogram (the shape [[histogram]] emits — one row per
    * (keys..., le) with the count of values <= le). Linear interpolation
    * inside the first bucket whose cumulative count reaches q·total,
    * with the Flux rule that the first bucket's lower bound is 0. One
    * lag window over the (small) histogram frame + a filter — the raw
    * data never re-scans. */
  def histogramQuantile(hist: DataFrame, keyCols: Seq[String],
      leCol: String, countCol: String, q: Double, out: String): DataFrame = {
    require(q > 0 && q <= 1, s"quantile out of (0, 1]: $q")
    val keys = keyCols.map(col)
    val byKey = Window.partitionBy(keys: _*)
    val w = byKey.orderBy(col(leCol))
    val total = max(col(countCol)).over(byKey)
    val target = lit(q) * total.cast("double")
    val prevLe = coalesce(lag(col(leCol), 1).over(w), lit(0.0))
    val prevN = coalesce(lag(col(countCol), 1).over(w), lit(0L))
    hist
      .withColumn("__t", target)
      .withColumn("__ple", prevLe)
      .withColumn("__pn", prevN)
      .filter(col(countCol).cast("double") >= col("__t") &&
        col("__pn").cast("double") < col("__t"))
      .withColumn(out,
        // the filter guarantees count > prev count here, so the
        // interpolation denominator is never zero
        col("__ple") + (col("__t") - col("__pn")) *
          (col(leCol) - col("__ple")) /
          (col(countCol) - col("__pn")).cast("double"))
      .select(keys :+ col(out): _*)
  }

  /** InfluxQL `top(field, N)` / `bottom(field, N)`: the N largest
    * (smallest) points per series WITH their timestamps; ties break to
    * the earlier timestamp (call_iterator.go top/bottom keep the first
    * point encountered in time order). One window rank per call. */
  def topN(df: DataFrame, keyCols: Seq[String], timeCol: String,
      valueCol: String, n: Int, bottom: Boolean = false): DataFrame = {
    require(n >= 1, "top/bottom needs n >= 1")
    // Window rank, MEASURED against the bounded-aggregate alternative
    // (TopK.topPointsD/L) at ×10/×100 series count (r14, local[32],
    // scale_runs in SCALE_r14.md):
    //  - tall series (rows/series >> n): Spark's WindowGroupLimit rule
    //    already prunes map-side to n rows per (partition, series) —
    //    the shuffle is aggregate-sized WITHOUT the aggregate.
    //  - wide series (×100 series count, rows/(task×series) ≈ n): NO
    //    formulation can shuffle less than ~the data (k×series×tasks ≈
    //    rows); the aggregate shuffled MORE bytes than raw rows
    //    (188 MB vs 157 MB — serialized Seq buffers cost more per point
    //    than Tungsten rows) and ran 2.6× slower, because
    //    ObjectHashAggregate falls back to sort-based aggregation past
    //    128 distinct keys per task, paying the window's sort PLUS udaf
    //    serialization.
    // So the window is Pareto-better here and the r13 hypothesis that
    // the aggregate would drop the ×100 shuffle is recorded as refuted.
    // The TopPoints aggregators remain public in TopK for genuinely
    // tall single-group workloads (e.g. global top-k over a 100 TB
    // corpus, where a window would sort one giant partition).
    //
    // Output contract: (keyCols..., timeCol, valueCol) ONLY — kept
    // aligned with the aggregate formulation so the implementations
    // stay swappable.
    val keys = keyCols.map(col)
    val ord =
      if (bottom) Seq(col(valueCol).asc, col(timeCol).asc)
      else Seq(col(valueCol).desc, col(timeCol).asc)
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    df.filter(col(valueCol).isNotNull)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .select(keys :+ col(timeCol) :+ col(valueCol): _*)
  }

  /** HDR-histogram-style log-linear sketch over a POSITIVE INTEGER value
    * column (the at-scale quantile path: fixed-size, mergeable bucket
    * counts — the thing DDSketch/HdrHistogram serve where an exact
    * percentile would need a full sort). Bucket layout: octave
    * `msb = ⌊log₂ x⌋` with `subBits`-bit linear sub-buckets, i.e.
    * `idx = msb·2^subBits + (⌊x·2^subBits / 2^msb⌋ − 2^subBits)`;
    * relative error ≤ 2^−(subBits+1) per bucket. Unlike γ-log sketches
    * the bucketing NEVER touches libm or doubles: `msb` is the bit
    * length of an integer (`length(bin(x)) − 1`, exact in any engine)
    * and `⌊x·2^subBits / 2^msb⌋` is a plain bit shift —
    * `x >> (msb−subBits)` (or `x << (subBits−msb)` for tiny x) — so the
    * bucket index is exact for EVERY positive int64, with no
    * x·2^subBits < 2⁵³ ceiling. The midpoint `rep` is also exact in f64:
    * 2^msb is a power of two (exact at any msb ≤ 62) times a dyadic
    * rational with a ≤(subBits+2)-bit numerator.
    *
    * Returns one row per (keys..., idx) with the count and the exact
    * midpoint representative `rep = 2^msb·(2·sub + 1) / 2^(subBits+1)`
    * (a dyadic rational — exact double). Counts merge by addition across
    * chunks/streams/shards, so the sketch is a metadata-sized mergeable
    * state at any corpus size. */
  def hdrSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
      subBits: Int = 5): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits out of [1,16]: $subBits")
    val keys = keyCols.map(col)
    val sub = 1L << subBits
    val x = col(valueCol).cast("long")
    // All-integer bucketing: ⌊x·2^subBits / 2^msb⌋ = x >> (msb−subBits)
    // when msb ≥ subBits (both shifts of a positive long — no overflow,
    // no double rounding, valid for every positive int64), else
    // x << (subBits−msb) (x < 2^subBits ≤ 2^16 there, tiny). shiftright/
    // shiftleft with a COLUMN shift amount need the SQL builder form.
    val m = when(col("__msb") >= lit(subBits.toLong),
        expr(s"shiftright(__x, cast(__msb - $subBits as int))"))
      .otherwise(expr(s"shiftleft(__x, cast($subBits - __msb as int))"))
    // bucket spans [2^msb·m/2^subBits, 2^msb·(m+1)/2^subBits); midpoint
    // = 2^msb·(2m+1)/2^(subBits+1): 2^msb via an integer shift cast to
    // double (a power of two — exact at any msb ≤ 62), times a dyadic
    // rational with a small numerator — exact in f64 for all of int64
    val rep = expr("cast(shiftleft(1L, cast(__msb as int)) as double)") *
      (lit(2L) * col("__m") + lit(1L)).cast("double") / lit(2.0 * sub)
    df.filter(x > 0)
      .withColumn("__x", x)
      .withColumn("__msb", (length(bin(col("__x"))) - 1).cast("long"))
      .withColumn("__m", m)
      .withColumn("__idx", col("__msb") * lit(sub) + (col("__m") - lit(sub)))
      .withColumn("__rep", rep)
      .groupBy(keys :+ col("__idx") :+ col("__rep"): _*)
      .agg(count(lit(1)).as("n"))
      .select(keys ++ Seq(col("__idx").as("idx"), col("__rep").as("rep"),
        col("n")): _*)
  }

  /** Quantile estimates from an [[hdrSketch]]: for each requested
    * quantile `pct/100`, the representative of the first bucket (by idx)
    * whose cumulative count reaches rank `⌈n·pct/100⌉`. The rank test is
    * the EXACT integer cross-multiplication `cum·100 ≥ n·pct` — never
    * `ceil(0.9·n)`, whose double product can straddle an integer — and
    * the pick is integer comparisons over the (metadata-sized) bucket
    * frame: one keyed window + filter, the raw data never re-scans.
    * Output: one row per (keys..., pct) with the estimate and the total
    * count. */
  def hdrQuantiles(sketch: DataFrame, keyCols: Seq[String],
      pcts: Seq[Int], out: String = "est"): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles out of [1,100]: $pcts")
    val dec = "decimal(38,0)"
    val keys = keyCols.map(col)
    val byKey = Window.partitionBy(keys: _*)
    val w = byKey.orderBy(col("idx"))
    val cum = sum(col("n")).over(w)
    val total = sum(col("n")).over(byKey)
    val pctRows = pcts.map(p => struct(lit(p).as("pct")))
    // cum·100 ≥ ⌈tot·pct/100⌉·100 ⟺ cum·100 ≥ tot·pct (cum, rank ints):
    // the bucket containing rank r is the first with cum ≥ r, and
    // r = ⌈tot·pct/100⌉ ≤ c ⟺ tot·pct ≤ c·100 for integer c
    sketch
      .withColumn("__cum", cum.cast(dec)).withColumn("__tot", total)
      .withColumn("__prev", col("__cum") - col("n").cast(dec))
      .select(keys ++ Seq(col("rep"), col("__cum"), col("__prev"),
        col("__tot"), explode(array(pctRows: _*)).as("__p")): _*)
      .withColumn("__target", col("__tot").cast(dec) * col("__p.pct").cast(dec))
      .filter(col("__cum") * lit(100) >= col("__target") &&
        col("__prev") * lit(100) < col("__target"))
      .select(keys ++ Seq(col("__p.pct").as("pct"), col("rep").as(out),
        col("__tot").as("n_total")): _*)
  }
}
