package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic sampling and benchmark decontamination — training-data
  * curation operators a 100 TB pipeline runs between dedup and export.
  *
  * Both samplers are PURE FILTERS on a content-derived hash: zero
  * shuffles, pushdown-friendly, and — unlike `DataFrame.sample` — stable
  * across runs, partitionings, and engines (the md5-based `hash60` is
  * reproducible in any SQL engine, which is also what makes the DuckDB
  * oracle exact). Hash-based selection is how production corpus work
  * keeps samples consistent between pipeline re-runs: membership is a
  * property of the ROW, not of the scan order.
  */
object Sampling {

  private def bucketOf(keyCol: Column, outOf: Int): Column =
    pmod(TextFunctions.hash60(keyCol.cast("string")), lit(outOf.toLong))

  /** Keep rows whose key hashes into `keep` of `outOf` buckets
    * (keep/outOf ≈ sampling rate). */
  def deterministicSample(df: DataFrame, keyCol: String,
      keep: Int, outOf: Int = 100): DataFrame = {
    require(keep >= 0 && keep <= outOf, s"keep=$keep outside [0, $outOf]")
    df.filter(bucketOf(col(keyCol), outOf) < keep.toLong)
  }

  /** EXACT-size deterministic sample: the `n` smallest content hashes per
    * stratum — reservoir sampling's fixed-count guarantee without RNG or
    * sequential state, so the draw is stable across runs, partitionings
    * and engines. Unlike rate-based membership it is NOT stable under
    * corpus growth (a new smaller hash displaces the current largest
    * member — the price of an exact count). The bounded [[graft.functions
    * .TopK]] aggregate means every map task ships at most n rows per
    * stratum; no corpus sort, no single-reducer window. */
  def fixedSizeSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "sample size must be >= 1")
    // TopK keeps the LARGEST scores (ties to the smaller id), so score
    // by negated hash to draw the smallest-hash members
    df.groupBy(col(strataCol))
      .agg(graft.functions.TopK.topK(n)(
        -TextFunctions.hash60(col(keyCol).cast("string")),
        col(keyCol)).as("__tk"))
      .select(col(strataCol), posexplode(col("__tk")).as(Seq("__pos", "__s")))
      .select(col(strataCol), (col("__pos") + 1).cast("int").as("draw"),
        col("__s.id").as(keyCol))
  }

  /** Per-stratum rates: keep a `strata -> keep` fraction of each stratum
    * (e.g. downsample dominant languages, keep all of rare ones); strata
    * not listed fall back to `defaultKeep`. Still one pass, no shuffle —
    * the rate lookup is a chained CASE on the stratum column. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Int], defaultKeep: Int, outOf: Int = 100): DataFrame = {
    (rates.values.toSeq :+ defaultKeep).foreach(k =>
      require(k >= 0 && k <= outOf, s"keep=$k outside [0, $outOf]"))
    val keepCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep.toLong)) {
      case (acc, (stratum, keep)) =>
        when(col(strataCol) === stratum, lit(keep.toLong)).otherwise(acc)
    }
    df.filter(bucketOf(col(keyCol), outOf) < keepCol)
  }

  /** Benchmark decontamination: per document, the fraction of its
    * distinct word n-gram shingles that also occur anywhere in the
    * benchmark corpus, plus the contamination verdict at `threshold`.
    * The standard eval-leakage guard (n-gram overlap flavor) run before
    * training exports.
    *
    * Scale shape: the benchmark side (eval sets — small by construction)
    * reduces to a distinct hash set and BROADCASTS under the join; the
    * corpus side is one explode + one `groupBy(id)` — a single shuffle of
    * partial counts, no corpus self-join, no driver-side state. Plain
    * `count` (NOT count_distinct) is correct because [[TextFunctions
    * .shingles]] is distinct per document already — count_distinct here
    * would trigger Catalyst's expand/gid rewrite and a second
    * (id, hash)-grain shuffle for nothing. `hash60` keeps the shingle
    * join on fixed-width longs instead of strings. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 3, threshold: Double = 0.2): DataFrame = {
    val benchHashes = benchmark
      .select(explode_outer(TextFunctions.shingles(col(textCol), n)).as("s"))
      .filter(col("s").isNotNull) // outer+filter: see DocDedup.explodePairs
      .select(TextFunctions.hash60(col("s")).as("h"))
      .distinct()
      .withColumn("bench_hit", lit(1))
    val docHashes = docs
      .select(col(idCol), explode_outer(TextFunctions.shingles(col(textCol), n)).as("s"))
      .select(col(idCol), TextFunctions.hash60(col("s")).as("h"))
    docHashes
      .join(broadcast(benchHashes), Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("h")).as("n_shingles"),
        count(when(col("bench_hit") === 1, true)).as("n_overlap"))
      .withColumn("overlap",
        round(col("n_overlap") / greatest(col("n_shingles"), lit(1L)), 6))
      .withColumn("contaminated", col("overlap") >= threshold)
  }

  /** Semantic (embedding-space) decontamination: flag corpus rows whose
    * embedding is within cosine `threshold` of ANY benchmark embedding —
    * the paraphrase-robust complement of the n-gram [[decontaminate]]
    * (eval leakage survives rewording that defeats shingle overlap).
    *
    * Scale shape: the benchmark side (eval sets — small by construction)
    * BROADCASTS under a nested-loop join; per-row max-cosine partial
    * aggregation combines map-side, so the one shuffle carries a single
    * (id, max) row per corpus row — never the benchmark fan-out. Same
    * posture as the ANN brute-force scorer ([[Similarity.bruteForceTopK]]).
    */
  def decontaminateSemantic(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    // vectors are micro-quantized BEFORE any dot (VF.microVec — the
    // quantize-the-vectors discipline): dots and norms become exact
    // order-free integer sums, so every cosine below is bit-equal on any
    // engine. Norms factor out of the pair loop: computed once per
    // vector on each side BEFORE the join instead of |bench| (resp.
    // |corpus|) times inside it — same IEEE expression (dot / (n1 · n2)),
    // ~3x less float work per pair
    val bench = broadcast(benchmark
      .select(VF.microVec(col(vecCol)).as("__bvec"))
      .withColumn("__bnorm", VF.norm(col("__bvec"))))
    // the max cosine quantizes to integer micro-units before the
    // threshold compare and the exposure ([[Similarity.micro]]'s
    // quantize-before-compare rule — round(max, 6) >= t put the verdict
    // on a 1-ulp cross-engine knife edge, the r8 ann_recall_eval
    // fragility class). Quantizing AFTER the max is value-identical to
    // per-pair quantization (floor(x·1e6+0.5) is monotone
    // non-decreasing, so max∘q = q∘max) at |benchmark| fewer ops per
    // corpus row in the cross-join hot loop. The norm product is
    // guarded: Spark 4's default ANSI mode turns a zero-norm division
    // into a job-killing DIVIDE_BY_ZERO; a zero-norm pair scores NULL
    // and max ignores it.
    val normProd = col("__cnorm") * col("__bnorm")
    corpus.select(col(idCol), VF.microVec(col(vecCol)).as("__cvec"))
      .withColumn("__cnorm", VF.norm(col("__cvec")))
      .crossJoin(bench)
      .select(col(idCol),
        when(normProd =!= 0.0,
          VF.dot(col("__cvec"), col("__bvec")) / normProd).as("__cos"))
      .groupBy(col(idCol))
      .agg(Similarity.micro(max("__cos")).as("__qmax"))
      .select(col(idCol), (col("__qmax") / lit(1e6)).as("max_cos"),
        (col("__qmax") >= math.rint(threshold * 1e6)).as("contaminated"))
  }

  /** Weight-proportional Bernoulli sampling: keep each row with
    * probability `rate * weight` where `weight` ∈ [0, 1] is a per-row
    * column (e.g. a quality score) — importance sampling for corpus
    * curation ("keep good documents more often"), the standard soft
    * alternative to a hard quality cutoff.
    *
    * Like the other samplers this is a PURE FILTER on a content-derived
    * hash — zero shuffles, stable across runs/partitionings/engines. The
    * acceptance test is EXACT integer arithmetic: the weight is quantized
    * to ppm (`round(w * 1e6)` — exact for weights already rounded to ≤6
    * decimals), the rate is a rational `rateNum/rateDen`, and the test is
    * `(hash60 mod 1e6) * rateDen < w_ppm * rateNum` — no float compare
    * anywhere, so any SQL engine reproduces the member set bit-exactly. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      rateNum: Int, rateDen: Int): DataFrame = {
    require(rateNum >= 0 && rateDen > 0 && rateNum <= rateDen,
      s"rate $rateNum/$rateDen outside [0, 1]")
    val wPpm = round(col(weightCol) * 1e6).cast("long")
    df.filter(
      pmod(TextFunctions.hash60(col(keyCol).cast("string")), lit(1000000L))
        * rateDen.toLong < wPpm * rateNum.toLong)
  }

  /** Exact-size WEIGHTED sampling (Efraimidis & Spirakis 2006, A-ES):
    * each row draws a deterministic pseudo-uniform u from its content
    * hash and ranks by `ln(u)/w` — the n LARGEST keys per stratum are
    * the sample. The log form is order-equivalent to the paper's
    * `u^(1/w)` but avoids pow(), whose last-ulp behavior differs across
    * libm implementations; keys quantize to integer nano-units before
    * ranking so the top-n cut is an exact integer comparison in any
    * engine (ties to the smaller id). Non-positive weights never select.
    *
    * Scale shape: the bounded [[graft.functions.TopK]] aggregate — every
    * map task reduces to n rows per stratum, no per-stratum sort. */
  def weightedFixedSample(df: DataFrame, strataCol: String, keyCol: String,
      weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    // u = (h + 1) / 2^60 in (0, 1]; the h -> double rounding is the same
    // nearest-even cast in any engine
    val u = (TextFunctions.hash60(col(keyCol).cast("string")).cast("double")
      + 1.0) / lit(1152921504606846976L)
    df.filter(col(weightCol) > 0)
      .withColumn("__kq",
        round(log(u) / col(weightCol) * 1e9).cast("long"))
      .groupBy(col(strataCol))
      .agg(graft.functions.TopK.topK(n)(col("__kq").cast("double"),
        col(keyCol)).as("tk"))
      .select(col(strataCol), posexplode(col("tk")).as(Seq("rk", "x")))
      .select(col(strataCol), (col("rk") + 1).cast("int").as("rank"),
        col("x.id").as(keyCol))
  }

  /** Data mixing with epoch upsampling: each stratum (language, source,
    * domain) gets a fractional epoch count — e.g. `en -> 1.0, de -> 2.5`
    * means every German document appears twice and a deterministic half
    * of them a third time. Emits one row per (row, epoch) with the epoch
    * index, ready to union into a training shuffle.
    *
    * Epochs are fixed-point eppm (epochs × 1e6) so the fractional-part
    * selection is the same exact integer hash test as [[weightedSample]].
    * Scale shape: a per-row `explode(sequence(...))` — output grows with
    * Σ epochs·rows (unavoidable: that IS the requested corpus), but there
    * is no shuffle, no join, and the repeat factor is computed row-local,
    * so it parallelizes with the scan. */
  def mixEpochs(df: DataFrame, strataCol: String, keyCol: String,
      epochsPpm: Map[String, Long], defaultPpm: Long = 1000000L): DataFrame = {
    (epochsPpm.values.toSeq :+ defaultPpm).foreach(e =>
      require(e >= 0, s"negative epochs $e"))
    val ppm = epochsPpm.toSeq.sortBy(_._1).foldLeft(lit(defaultPpm)) {
      case (acc, (stratum, e)) =>
        when(col(strataCol) === stratum, lit(e)).otherwise(acc)
    }
    val fullEpochs = (ppm / 1000000L).cast("long")
    val fracPpm = pmod(ppm, lit(1000000L))
    val extra = (pmod(TextFunctions.hash60(col(keyCol).cast("string")),
      lit(1000000L)) < fracPpm).cast("long")
    df.withColumn("__n", fullEpochs + extra)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1L)))
      .drop("__n")
  }

  /** Token-budget corpus selection: keep the highest-`qualityCol` rows
    * whose running `tokensCol` total stays within `budgetTokens` —
    * "fill the training budget best-first", the selection step after
    * scoring/dedup.
    *
    * Equivalent to ORDER BY (quality DESC, id) + running-sum <= budget,
    * WITHOUT the global sort: quality rounds into at most
    * 10^bucketDecimals+1 monotone buckets, so a tiny aggregate frame
    * (one row per bucket) carries the cross-bucket running total, and
    * only the single boundary bucket needs an in-bucket running sum —
    * a window partitioned BY that bucket, never the corpus. Rounding is
    * monotone, so (bucket DESC, quality DESC, id) orders identically to
    * (quality DESC, id) and the selection is EXACTLY the naive one. */
  def budgetSelect(df: DataFrame, idCol: String, qualityCol: String,
      tokensCol: String, budgetTokens: Long,
      bucketDecimals: Int = 2): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    import org.apache.spark.sql.expressions.Window
    val bk = round(col(qualityCol), bucketDecimals).as("__bk")
    val perBucket = df.select(bk, col(tokensCol))
      .groupBy("__bk").agg(sum(tokensCol).as("__btoks"))
    // the cross-bucket running total: <= 10^d+1 rows, the single-task
    // window is the POINT (a driver-sized frame, like a metadata op)
    val wb = Window.orderBy(col("__bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = perBucket
      .withColumn("__before", coalesce(sum("__btoks").over(wb), lit(0L)))
      .select(col("__bk"), col("__before"),
        (col("__before") + col("__btoks") <= budgetTokens).as("__full"),
        (lit(budgetTokens) - col("__before")).as("__rem"))
    val joined = df.withColumn("__bk", round(col(qualityCol), bucketDecimals))
      .join(broadcast(marked), Seq("__bk"))
    val helpers = Seq("__bk", "__before", "__full", "__rem")
    // fully-selected buckets pass straight through; ONLY the boundary
    // bucket's rows reach the in-bucket running-sum window (the filter
    // sits under it, so the window sorts one bucket, not the corpus)
    val wIn = Window.partitionBy(col("__bk"))
      .orderBy(col(qualityCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundary = joined.filter(!col("__full") && col("__rem") > 0)
      .withColumn("__cum", sum(tokensCol).over(wIn))
      .filter(col("__cum") <= col("__rem"))
      .drop("__cum")
    joined.filter(col("__full")).unionByName(boundary)
      .drop(helpers: _*)
  }

  /** Exact per-stratum LOWER MEDIAN (the value at rank ⌈n/2⌉) without a
    * per-stratum corpus sort: the [[budgetSelect]] two-level shape —
    * coarse value buckets on a driver-sized histogram locate the bucket
    * containing the median rank; ONLY that one bucket per stratum runs an
    * in-bucket row_number. The lower median (not the interpolated mid) is
    * chosen because it is an ELEMENT of the data — no averaging step
    * whose float behavior an oracle would have to replicate. */
  private def lowerMedian(df: DataFrame, idCol: String, strataCol: String,
      valueCol: String, out: String, bucketDecimals: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bk = round(col(valueCol), bucketDecimals)
    val perBucket = df.groupBy(col(strataCol), bk.as("__bk"))
      .agg(count(lit(1)).as("__bn"))
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col(strataCol))
    val target = perBucket
      .withColumn("__before", coalesce(sum("__bn").over(wb), lit(0L)))
      .withColumn("__n", sum("__bn").over(wn))
      .withColumn("__k", expr("(__n + 1) div 2"))
      .filter(col("__before") < col("__k") &&
        col("__k") <= col("__before") + col("__bn"))
      .select(col(strataCol), col("__bk"), col("__before"), col("__k"))
    val wIn = Window.partitionBy(col(strataCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.withColumn("__bk", bk)
      .join(broadcast(target), Seq(strataCol, "__bk"))
      .withColumn("__rn", row_number().over(wIn))
      .filter(col("__before") + col("__rn") === col("__k"))
      .select(col(strataCol), col(valueCol).as(out))
  }

  /** Deterministic train/val/test split assignment: the split is a pure
    * function of the row's key hash (`pmod(hash60(key), 1e6)` against
    * ppm thresholds), so membership survives reshuffles, reruns,
    * incremental appends, and engine changes — the property that stops
    * eval leakage when the corpus is rebuilt. Zero shuffles. */
  def assignSplits(df: DataFrame, keyCol: String, valPpm: Long,
      testPpm: Long, out: String = "split"): DataFrame = {
    require(valPpm >= 0 && testPpm >= 0 && valPpm + testPpm <= 1000000L,
      s"val+test ppm out of range: $valPpm + $testPpm")
    val h = pmod(TextFunctions.hash60(col(keyCol).cast("string")),
      lit(1000000L))
    df.withColumn(out,
      when(h < valPpm, "val")
        .when(h < valPpm + testPpm, "test")
        .otherwise("train"))
  }

  /** Rebalance a corpus to a TARGET stratum distribution (the dataset
    * mixing step that downsamples over-represented languages/sources to
    * hit training proportions): given target shares (ppm, caller-normalized
    * to sum 1e6), find the largest feasible output size
    * `T = min_s(count_s / share_s)` — the binding stratum keeps ~everything
    * — and keep each stratum at acceptance rate `share_s·T / count_s`.
    * Strata absent from the target are dropped.
    *
    * Membership is the same EXACT integer hash test as the other samplers
    * (`pmod(hash60(key), 1e6)·count_s < share_ppm·T` — all-long products,
    * headroom to ~10^12-row strata), so the kept set is deterministic
    * across runs/partitionings/engines; proportions hold in expectation
    * like any Bernoulli sampler. Scale shape: one strata-sized count
    * aggregate + two broadcast joins; the corpus itself only scans and
    * filters — zero corpus shuffles. */
  def rebalance(df: DataFrame, strataCol: String, keyCol: String,
      sharesPpm: Map[String, Long]): DataFrame = {
    require(sharesPpm.nonEmpty, "rebalance needs target shares")
    sharesPpm.foreach { case (s, p) =>
      require(p > 0, s"share for '$s' must be positive (drop it to exclude)") }
    val spark = df.sparkSession
    import spark.implicits._
    val shares = sharesPpm.toSeq.sortBy(_._1)
      .toDF(strataCol, "__share_ppm")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .join(broadcast(shares), strataCol) // inner: unlisted strata drop out
    val tq = counts.agg(min(expr("__cnt * 1000000 div __share_ppm")).as("__t"))
    df.join(broadcast(counts), strataCol)
      .crossJoin(broadcast(tq))
      .filter(
        pmod(TextFunctions.hash60(col(keyCol).cast("string")), lit(1000000L))
          * col("__cnt") < col("__share_ppm") * col("__t"))
      .drop("__cnt", "__share_ppm", "__t")
  }

  /** Temperature-rescaled multilingual sampling weights — the mT5/XLM-R
    * curriculum `q_l ∝ p_l^α` with α = 1/2: low-resource strata are
    * up-weighted and high-resource ones damped, flattening the natural
    * distribution without inverting it. One row per stratum: natural
    * count and share, the temperature share, and `boost` = q/p (the
    * per-stratum up/down-sampling factor an epoch mixer applies).
    *
    * α is FIXED at 1/2: p^(1/2) is one IEEE-correctly-rounded sqrt, so
    * results are bit-reproducible across engines. A general α would ride
    * pow = exp(α·ln p) through libm, whose last ulp differs across
    * implementations (this repo's pow()-ban discipline). Each √count is
    * quantized to integer micros BEFORE the cross-strata normalization,
    * so the denominator is an exact order-free integer sum.
    *
    * Scale shape: one count per stratum (map-side partials into a
    * stratum-sized frame), then arithmetic on that frame alone — the
    * corpus is scanned once and never shuffled. */
  def temperatureMix(df: DataFrame, strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("__sq",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long"))
    val tot = counts.agg(sum("n_docs").as("__tn"), sum("__sq").as("__tsq"))
    counts.crossJoin(broadcast(tot))
      .select(col(strataCol), col("n_docs"),
        round(col("n_docs") / col("__tn"), 6).as("p_natural"),
        round(col("__sq") / col("__tsq"), 6).as("q_temp"),
        // q/p = (√n_l·Σn) / (Σ√n·n_l), computed as DOUBLE products: a
        // long·long spelling overflows 2^63 past ~4e8 rows per stratum
        // (√n·1e6 · Σn ≈ 2e19), silently wrapping or throwing under
        // ANSI. Each long→double conversion and each product is one
        // correctly-rounded IEEE op on identical operands in any engine,
        // so the spelling stays bit-reproducible at any corpus size
        round((col("__sq").cast("double") * col("__tn").cast("double"))
          / (col("__tsq").cast("double") * col("n_docs").cast("double")), 6)
          .as("boost"))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151): give
    * every stratum (language) as close to a UNIFORM share of the training
    * budget as possible, capped at `capEpochs` passes over its data —
    * the successor to temperature sampling that bounds low-resource
    * repetition explicitly instead of implicitly. Water-filling closed
    * form: sort strata by capacity `n_docs·capEpochs` ascending; stratum
    * k is CAPPED (gets its full capacity) iff
    * `capacity_k·(N−k+1) ≤ budget − Σ_{j<k} capacity_j` (the criterion is
    * monotone in k, so capped strata are a prefix); every uncapped
    * stratum gets the integer-division even split of what remains.
    *
    * Exactness: the criterion is an exact integer cross-multiplication
    * (no division), allocations are integer docs (floor division), and
    * `epochs` is exposed as an integer-micro ratio — every step replays
    * bit-equal on any engine. Scale shape: one corpus aggregate reduces
    * to a strata-sized frame (languages — tens of rows at any corpus
    * size); the windows below are over THAT frame, never corpus rows.
    * Returns (stratum, n_docs, capacity, capped, alloc_docs, epochs). */
  def unimaxMix(df: DataFrame, strataCol: String, budget: Long,
      capEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(capEpochs >= 1, s"capEpochs must be >= 1, got $capEpochs")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("capacity", col("n_docs") * lit(capEpochs.toLong))
    val byCap = Window.orderBy(col("capacity"), col(strataCol))
    val before = byCap.rowsBetween(Window.unboundedPreceding, -1)
    val all = byCap.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    counts
      .withColumn("__k", row_number().over(byCap))
      .withColumn("__cumb", coalesce(sum("capacity").over(before), lit(0L)))
      .withColumn("__nn", count(lit(1)).over(all))
      .withColumn("capped",
        col("capacity") * (col("__nn") - col("__k") + 1) <=
          lit(budget) - col("__cumb"))
      .withColumn("__kk", max(when(col("capped"), col("__k"))
        .otherwise(lit(0L))).over(all))
      .withColumn("__ss", sum(when(col("capped"), col("capacity"))
        .otherwise(lit(0L))).over(all))
      .withColumn("alloc_docs", when(col("capped"), col("capacity"))
        .otherwise(expr(s"($budget - __ss) div (__nn - __kk)")))
      .withColumn("epochs",
        expr("(alloc_docs * 1000000) div n_docs").cast("double") / lit(1e6))
      .select(col(strataCol), col("n_docs"), col("capacity"), col("capped"),
        col("alloc_docs"), col("epochs"))
  }

  /** Greedy maximum-coverage subset selection (the facility-location /
    * submodular-coverage recipe behind diversity-first data selection):
    * pick `k` documents one at a time, each round taking the document
    * covering the most shingles NOT yet covered by earlier picks — the
    * classic (1−1/e)-approximate greedy for submodular coverage. Returns
    * (rank, doc_id, gain, covered): the marginal new-shingle count of
    * each pick and the running covered total (= Σ gains, since every
    * gain is by construction new).
    *
    * Scale shape: the corpus is shingled ONCE (localCheckpointed — all k
    * rounds reuse it); each round is one shingle-keyed anti-join + one
    * doc-grain count aggregate + a 1-row driver argmax, with the covered
    * set checkpointed per round so round r never replays rounds 1..r−1
    * (the MMR/connectedComponents discipline). Determinism: gains are
    * exact integer counts, ties to the smallest doc id; a document whose
    * shingles are fully covered simply has no uncovered rows and cannot
    * be re-picked. */
  def coverageSelect(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val sh = docs.select(col(idCol).as("id"),
        explode_outer(TextFunctions.shingles(col(textCol), n)).as("s"))
      .filter(col("s").isNotNull)
      .localCheckpoint()
    var covered: DataFrame = spark.emptyDataset[String].toDF("s")
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
    var cum = 0L
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val top = sh.join(covered, Seq("s"), "left_anti")
        .groupBy("id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every shingle covered
      else {
        val id = top(0).getLong(0)
        val gain = top(0).getLong(1)
        cum += gain
        picks += ((r, id, gain, cum))
        // r16: re-shingle the ONE picked document from the docs frame
        // (a pushdown-prunable point lookup) instead of filtering the
        // occurrence-grain checkpoint — the old form re-read the whole
        // exploded corpus (25.9 MB at sf0.1) once per round just to
        // extract one doc's shingles. The anti-join keeps the union
        // DISJOINT by construction, so the per-round distinct (one more
        // shuffle of the covered set) is gone too. Same covered set:
        // shingles() is per-doc distinct and the anti-join removes
        // already-covered entries, which distinct() used to dedup.
        val pickedSh = docs.filter(col(idCol) === id)
          .select(explode_outer(TextFunctions.shingles(col(textCol), n)).as("s"))
          .filter(col("s").isNotNull)
        covered = covered
          .unionByName(pickedSh.join(covered, Seq("s"), "left_anti"))
          .localCheckpoint()
        r += 1
      }
    }
    picks.toSeq.toDF("rank", "doc_id", "gain", "covered")
  }

  /** Robust outlier flagging by the median-absolute-deviation rule:
    * a row is an outlier in its stratum when
    * `|x − median| > cut · 1.4826 · MAD` (1.4826 scales MAD to σ under
    * normality — the standard robust z-score corpus-curation filter,
    * immune to the outliers it hunts, unlike mean/stddev).
    *
    * Both medians are exact per-stratum lower medians via the
    * driver-sized-histogram shape ([[lowerMedian]]) — no corpus-wide or
    * per-stratum full sort at any point; medians broadcast back.
    * Determinism: medians are data ELEMENTS (6-decimal scores), the
    * deviation and threshold are single IEEE expressions on identical
    * operands in any engine. */
  def madOutliers(df: DataFrame, idCol: String, strataCol: String,
      valueCol: String, cut: Double = 3.0,
      bucketDecimals: Int = 2): DataFrame = {
    // r16: the input frame is read by THREE separate consumers (the
    // median histogram, the MAD histogram via withDev, and the final
    // select), and each re-executed its upstream plan — for the quality
    // MAD query that meant computing the 4-regexp qualityScore over the
    // whole corpus three times (profiled: 3 × ~6-8 s of task time at
    // sf0.1). One eager checkpoint of the narrow (id, stratum, value)
    // frame computes it once; intra-query intermediate, rebuilt from
    // parquet per invocation (executor-loss trade-off: see
    // DocDedup.ngramJaccardPairs). All input columns are kept — callers
    // rely on the output carrying their extra columns through.
    val dfPinned = df.localCheckpoint()
    val med = lowerMedian(dfPinned, idCol, strataCol, valueCol, "__med",
      bucketDecimals)
    val withDev = dfPinned.join(broadcast(med), strataCol)
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = lowerMedian(withDev, idCol, strataCol, "__dev", "__mad",
      bucketDecimals)
    withDev.join(broadcast(mad), strataCol)
      .withColumn("dev", col("__dev"))
      .withColumn("outlier",
        col("__dev") > lit(cut) * lit(1.4826) * col("__mad"))
      .drop("__med", "__dev", "__mad")
  }
}
