package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Scalar int8 quantization of embedding columns — the standard 4×
  * memory/IO reduction before ANN indexing or training export (a 100 TB
  * float corpus becomes 25 TB of codes plus a dim-sized codebook).
  *
  * Per-dimension min/max codebook, `code = floor((x-mn)·255/(mx-mn)+0.5)`
  * clamped to [0, 255]; degenerate dimensions (mx == mn) code to 0.
  * `floor(v + 0.5)` is spelled out (not `round`) so every engine applies
  * the same half-up rule to the same IEEE doubles — inputs are exact
  * f32→f64 casts and the affine transform is evaluated in the same
  * operation order everywhere, so codes are bit-reproducible.
  *
  * Scale shape: the stats pass is a posexplode + groupBy(dim) that
  * REDUCES to a dim-sized frame (64–4096 rows — driver metadata, same
  * posture as k-means centroids at `Clustering.kmeansAssign`); the
  * codebook returns to executors as two broadcast array literals, and
  * encoding is a zero-shuffle per-row `transform`. No (vec × dim) row
  * explosion ever shuffles.
  */
object Quantization {

  /** Per-dimension (min, max) over the corpus: `dim` is 0-based. */
  def int8Stats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(VF.asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))

  /** Exact corpus covariance matrix over an embedding column — the
    * statistic behind whitening / PCA / OPQ rotation fits (the dim×dim
    * second-moment summary a 100 TB corpus reduces to before any
    * eigen-work happens driver-side).
    *
    * Returns the upper triangle (i, j, cov) for 1 ≤ i ≤ j ≤ dim with
    * `cov = (n·Σxy − Σx·Σy) / (n²·10¹²)` over vectors quantized to the
    * 1e-6 grid (`floor(x·1e6 + 0.5)` as longs — the [[Clustering]]
    * discipline): every sum is an exact order-free integer/decimal sum,
    * so any engine derives the identical IEEE double from identical
    * operands, and no float-accumulation order can leak in.
    *
    * Scale shape: the pair expansion is n·d(d+1)/2 rows of three scalars
    * — the inherent FLOP count of a covariance pass, spent map-side; the
    * shuffle carries only the d(d+1)/2 partially-aggregated group sums
    * per task (map-side combine collapses everything else), and the
    * output frame is d² driver-scale metadata. Products accumulate in
    * decimal(38,0): |q| ≤ ~2²² per component keeps n·Σxy inside 38
    * digits beyond 10¹² rows. */
  def covariance(emb: DataFrame, vecCol: String): DataFrame = {
    val q = emb.select(transform(VF.asDouble(col(vecCol)),
      x => floor(x * 1e6 + lit(0.5)).cast("long")).as("__q"))
    val n = q.agg(count(lit(1)).as("__n"))
    val sx = q.select(posexplode(col("__q")).as(Seq("__i0", "__qi")))
      .select((col("__i0") + 1).cast("int").as("i"),
        col("__qi").cast("decimal(38,0)").as("__qd"))
      .groupBy("i").agg(sum(col("__qd")).as("__s"))
    val sxy = q
      .select(col("__q"), posexplode(col("__q")).as(Seq("__i0", "__qi")))
      .select(col("__i0"), col("__qi"),
        posexplode(slice(col("__q"), col("__i0") + 1,
          size(col("__q")) - col("__i0"))).as(Seq("__j0", "__qj")))
      .select((col("__i0") + 1).cast("int").as("i"),
        (col("__i0") + 1 + col("__j0")).cast("int").as("j"),
        (col("__qi").cast("decimal(38,0)") * col("__qj")).as("__p"))
      .groupBy("i", "j").agg(sum(col("__p")).as("__sxy"))
    sxy
      .join(sx.select(col("i"), col("__s").as("__sxi")), "i")
      .join(sx.select(col("i").as("j"), col("__s").as("__sxj")), "j")
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"),
        round((col("__n") * col("__sxy") - col("__sxi") * col("__sxj"))
          .cast("double")
          / (col("__n").cast("double") * col("__n") * lit(1e12)), 6)
          .as("cov"))
  }

  /** Dominant principal component by FIXED-ROUND power iteration over the
    * integer-micro covariance — the whitening/PCA primitive that stays
    * engine-reproducible where an eigensolver would not (LAPACK/Jacobi
    * implementations differ across libraries in iteration order and sign
    * convention; a fixed recurrence on an integer grid is bit-identical
    * everywhere).
    *
    * The corpus reduces to the d×d [[covariance]] matrix once (that pass
    * is the only corpus-sized work — at 100 TB everything after is
    * metadata-sized); the matrix quantizes to covariance micros
    * `m = floor(cov·1e6 + 0.5)` and the iteration runs `iters` rounds of
    *   `w = M v`  (exact BIGINT: |m| ≤ ~1e7 micros, |v| ≤ 1e6, d ≤ 4096
    *   keeps every sum well under 2^63),
    *   `v ← floor(w / max|w| · 1e6 + 0.5)`  (two exact-integer-to-double
    *   casts < 2^53, one IEEE divide of identical operands, one floor),
    * starting from the all-ones vector (sign convention: the loading of
    * the dominant direction the ones-vector projects onto positively).
    * A fixed iteration count (not a convergence test) keeps the output a
    * pure function of the input on every engine. Returns (dim 1-based,
    * loading = v/1e6) — max-norm-normalized, so the peak |loading| is 1.
    * Callers wanting unit L2 rescale driver-side. */
  def topComponent(emb: DataFrame, vecCol: String, iters: Int = 3): DataFrame = {
    // the d(d+1)/2-row quantized covariance is referenced by both union
    // branches of the full matrix, the start vector, and every round's
    // join — an eager localCheckpoint runs the corpus pass exactly ONCE
    // (without it round k replays the covariance ~2k+1 times; measured
    // warm at sf0.1: 4.6s without the checkpoint, 3.1s with)
    val covM = covariance(emb, vecCol)
      .select(col("i"), col("j"),
        floor(col("cov") * lit(1e6) + lit(0.5)).cast("long").as("m"))
      .localCheckpoint()
    val full = covM.unionByName(covM.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("m")))
    var v = covM.filter(col("i") === col("j")) // one row per dimension
      .select(col("i").as("j"), lit(1000000L).as("v"))
    for (_ <- 1 to iters) {
      val w = full.join(broadcast(v), "j")
        .groupBy("i").agg(sum(col("m") * col("v")).as("w"))
      val wmax = w.agg(max(abs(col("w"))).as("__wm"))
      v = w.crossJoin(broadcast(wmax))
        .select(col("i").as("j"),
          when(col("__wm") === 0L, lit(0L)).otherwise(
            floor(col("w").cast("double") / col("__wm").cast("double")
              * lit(1e6) + lit(0.5)).cast("long")).as("v"))
    }
    v.select(col("j").as("dim"), (col("v") / lit(1e6)).as("loading"))
  }

  /** Exact Pearson correlation between two INTEGER columns — the
    * cross-signal audit primitive (e.g. does text quality correlate with
    * embedding norm?). Inputs are expected pre-quantized to an integer
    * grid (the micro-unit discipline); every sum runs in decimal(38,0)
    * so the four moments are exact order-free integer sums, and
    * `r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))` is
    * evaluated as IEEE doubles over those identical exact operands —
    * bit-reproducible on any engine.
    *
    * Operand bound (not unlimited): the variance term n·Σx² must fit
    * decimal(38,0), so with micro-quantized inputs (|x| ≤ ~1e6, x² ≤
    * 1e12) the product stays exact up to n·Σx² < 1e38 — roughly n <
    * 3e12 rows of full-magnitude values, but only ~2e5 rows if callers
    * feed 64 summed squared micro-coordinates per row (norm²-style
    * inputs; DuckDB's HUGEINT twin hits the same ~1.7e38 ceiling).
    * Under ANSI mode an overflow THROWS rather than corrupting r;
    * rescale such inputs (e.g. norm² / 64) before calling at larger n.
    * Returns one row
    * (n, r); r is NULL when either column has zero variance (a raw 0/0
    * would THROW under Spark 4's default ANSI mode, the same hazard
    * [[graft.pipeline.Similarity]] guards on its cosine paths).
    *
    * Scale shape: a single full-scan aggregate with map-side partials —
    * one reduce to one row, nothing else. */
  def pearsonExact(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    val dx = col("n") * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("n") * col("__syy") - col("__sy") * col("__sy")
    df.agg(count(lit(1)).as("n"), sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"), sum(x * y).as("__sxy"))
      .select(col("n"),
        round(when(dx > 0 && dy > 0,
          (col("n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
            / (sqrt(dx.cast("double")) * sqrt(dy.cast("double")))), 6).as("r"))
  }

  /** Encode every vector against the corpus codebook. Output keeps the
    * id column and adds `codes: array<int>` (one int8 code per dim). */
  def quantizeInt8(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val stats = int8Stats(emb, vecCol).orderBy("dim").collect()
    val mns = stats.map(_.getAs[Double]("mn"))
    val mxs = stats.map(_.getAs[Double]("mx"))
    val mnArr = array(mns.map(lit): _*)
    val mxArr = array(mxs.map(lit): _*)
    emb.select(col(idCol),
      zip_with(VF.asDouble(col(vecCol)),
        zip_with(mnArr, mxArr, (a, b) => struct(a.as("mn"), b.as("mx"))),
        (x, s) => {
          val mn = s.getField("mn"); val mx = s.getField("mx")
          when(mx === mn, lit(0)).otherwise(
            greatest(lit(0), least(lit(255),
              floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("int"))))
        }).as("codes"))
  }
}
