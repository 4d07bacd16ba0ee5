package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Language-model quality scoring, CCNet-style: production corpus
  * pipelines filter documents by how surprising a language model finds
  * them (high perplexity = noise/garble, suspiciously low = boilerplate).
  * The external-LM dependency is replaced by the classic self-trained
  * add-α bigram model — trained on the corpus IN the same job, which is
  * exactly how repetition-heavy machine text gets caught (it scores too
  * predictable) and garble gets caught (too surprising).
  */
object LanguageModel {

  /** Per-document mean bigram log-loss (bits per bigram; perplexity =
    * 2^bits): `P(w2|w1) = (c(w1w2) + α) / (c(w1) + α·V)` with corpus
    * unigram/bigram counts and vocabulary size V.
    *
    * Shape: two counting aggregates (token and bigram occurrences — the
    * same explode the dedup shingle index pays), then the occurrence
    * stream joins its two count tables on token keys and aggregates per
    * document. The count tables shrink with vocabulary, not corpus, so
    * at scale they broadcast (AQE decides); nothing here is quadratic.
    * Documents with no bigram (fewer than 2 tokens) are absent from the
    * output — they have no defined loss. */
  def bigramLogLoss(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "add-alpha smoothing needs alpha > 0")
    val uni = docs
      .select(explode_outer(TF.tokens(col(textCol))).as("__w1"))
      .filter(col("__w1").isNotNull) // outer+filter: a bare explode's
      // inferred size()>0 predicate inlines the tokenizer into a Filter
      .groupBy("__w1").agg(count(lit(1)).as("__cw"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val occ = docs
      .select(col(idCol), explode_outer(TF.ngrams(col(textCol), 2)).as("__bg"))
      .filter(col("__bg").isNotNull)
    val bgCounts = occ.groupBy("__bg").agg(count(lit(1)).as("__cbg"))
    occ
      .join(bgCounts, "__bg")
      .withColumn("__w1", split(col("__bg"), " ").getItem(0))
      .join(uni, "__w1")
      .crossJoin(broadcast(vocab))
      // per-term log-likelihoods quantize to integer micro-bits BEFORE
      // the aggregate (the naiveBayesClassify discipline): an exposed
      // -avg(raw log2) is a float accumulated in engine order through an
      // engine libm — the r8 text_nb_lang fragility. `bits_q` is the
      // exact integer micro-bit sum; `bits_per_bigram` derives from it
      // by one deterministic division chain (identical operands in any
      // engine). Consumers that must be quantization-boundary-proof
      // coarsen bits_q further (see text_lm_score's milli-bit contract).
      // Spelling note: this LM family quantizes with round() — Spark and
      // DuckDB both round halves away from zero, and the downstream
      // milli-bit coarsening absorbs a ±1 flip — while the cosine family
      // uses floor(x+0.5) ([[graft.pipeline.Similarity.micro]]); the
      // two spellings differ only at exact negative half-micros and
      // each family's oracles mirror its own spelling verbatim.
      .withColumn("__lpq", round(log2((col("__cbg") + alpha) /
        (col("__cw") + lit(alpha) * col("__v"))) * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), (-sum(col("__lpq"))).as("bits_q"))
      .withColumn("bits_per_bigram",
        col("bits_q").cast("double") / col("n_bigrams") / lit(1e6))
  }

  /** Per-document bits-per-bigram under an interpolated Kneser-Ney
    * bigram model (Kneser & Ney 1995; Chen & Goodman 1999 — the smoothing
    * every n-gram quality filter graduated to after add-α):
    *
    * `P(w2|w1) = (c(w1w2) − D)/c(w1·) + D·N1+(w1·)/c(w1·) · N1+(·w2)/B`
    *
    * with D the absolute discount, `N1+(w1·)` the distinct-successor
    * count, `N1+(·w2)` the distinct-PREDECESSOR count (the continuation
    * probability that makes "Francisco" cheap despite "San Francisco"
    * being frequent), and B the number of distinct bigram types. Scoring
    * is in-corpus, so every scored bigram has c ≥ 1 > D and the max(·,0)
    * clamp is vacuous — spelled without it on both engines.
    *
    * Scale shape: [[bigramLogLoss]]'s exactly — one bigram explode into
    * vocab-sized count tables (bigram types, contexts, continuations)
    * that join back to the occurrence stream under AQE broadcast; no
    * corpus self-join. Determinism: each occurrence's log2 P is
    * quantized to integer micro-bits before the per-document sum (the
    * NB/Zipf discipline), so the mean is one exact integer division
    * replayed identically by any engine. */
  def knBigramScore(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "KN discount must be in (0, 1)")
    val occ = docs
      .select(col(idCol), explode_outer(TF.ngrams(col(textCol), 2)).as("__bg"))
      .filter(col("__bg").isNotNull)
    val bg = occ.groupBy("__bg").agg(count(lit(1)).as("__c12"))
      .withColumn("__w1", split(col("__bg"), " ").getItem(0))
      .withColumn("__w2", split(col("__bg"), " ").getItem(1))
    val ctx = bg.groupBy("__w1")
      .agg(sum("__c12").as("__c1"), count(lit(1)).as("__n1f"))
    val cont = bg.groupBy("__w2").agg(count(lit(1)).as("__n1r"))
    val types = bg.agg(count(lit(1)).as("__b"))
    occ
      .join(bg, "__bg").join(ctx, "__w1").join(cont, "__w2")
      .crossJoin(broadcast(types))
      .withColumn("__p",
        (col("__c12") - lit(discount)) / col("__c1")
          + (lit(discount) * col("__n1f") / col("__c1"))
            * (col("__n1r") / col("__b")))
      .withColumn("__lq", round(log2(col("__p")) * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__lq").as("__s"))
      .select(col(idCol), col("n_bigrams"),
        (-col("__s").cast("double") / col("n_bigrams") / lit(1e6))
          .as("bits_per_bigram"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed token features are —
    * `w(d) = Σ_tokens log p_target(bucket) − log p_raw(bucket)` with
    * token features hashed into `buckets` cells and both distributions
    * add-α smoothed over the bucket counts. Positive weight = more
    * probable under the target than under the raw corpus; resampling
    * keeps the high-weight tail.
    *
    * `isTarget` marks the target-domain rows (they score too — DSIR
    * weighs the whole raw pool). Scale shape: one token explode into a
    * BUCKETS-sized count frame (the hashing trick's whole point: vocab
    * collapses to a fixed-width table no matter the corpus), the
    * per-bucket log-ratio quantized to integer micro-bits on that
    * metadata frame, broadcast back, one per-document sum. Zero corpus
    * self-joins; membership in the weight is deterministic, so reruns
    * and engines agree bit-exactly. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256,
      alpha: Double = 0.5): DataFrame = {
    require(buckets > 0 && alpha > 0, "need buckets > 0 and alpha > 0")
    val occ = docs
      .select(col(idCol), isTarget.as("__tgt"),
        explode_outer(TF.tokens(col(textCol))).as("__t"))
      .filter(col("__t").isNotNull)
      .withColumn("__bk", pmod(TF.hash60(col("__t")), lit(buckets.toLong)))
    val cnts = occ.groupBy("__bk").agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__ct"))
    val totals = cnts.agg(sum("__cr").as("__nr"), sum("__ct").as("__nt"))
    val ratio = cnts.crossJoin(broadcast(totals))
      .select(col("__bk"),
        round((log2((col("__ct") + alpha) / (col("__nt") + lit(alpha * buckets)))
          - log2((col("__cr") + alpha) / (col("__nr") + lit(alpha * buckets))))
          * 1e6).cast("long").as("__wq"))
    occ.join(broadcast(ratio), "__bk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum("__wq").as("__s"))
      .select(col(idCol), col("n_tokens"),
        (col("__s").cast("double") / lit(1e6)).as("weight"),
        (col("__s") > 0L).as("target_like"))
  }

  /** Self-trained multinomial Naive Bayes classifier: train per-class
    * token counts on a labeled column (language, source, quality tier)
    * and score every document — the classic fastText-free corpus labeler
    * (e.g. re-labeling documents whose declared language looks wrong).
    *
    * `score(d, c) = log2 P(c) + Σ_t log2 (cnt(c,t) + α) / (N_c + α·V)`
    *
    * Determinism across engines: every per-token log-likelihood and the
    * class prior are QUANTIZED to integer micro-bits
    * (`round(log2(...) * 1e6)` as BIGINT) before summation, so document
    * scores are exact integer sums — no float-accumulation-order
    * dependence, and the argmax (ties to the lexicographically smallest
    * class) compares identically in any engine.
    *
    * Scale shape: one token-explode into TWO count aggregates (per-class
    * totals: #classes rows; per-(class, token): vocab×classes rows — both
    * shrink with vocabulary, not corpus, so they broadcast under AQE).
    * The scoring pass re-explodes tokens, maps each occurrence against
    * the broadcast count tables per class (#classes-way fan-out of the
    * occurrence stream — classes are few by construction), and one
    * groupBy(doc, class) + argmax window finishes. No corpus self-join.
    * Returns (id, pred, score_q) with score_q the winning class's
    * integer micro-bit score. */
  def naiveBayesClassify(docs: DataFrame, idCol: String, labelCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "add-alpha smoothing needs alpha > 0")
    import org.apache.spark.sql.expressions.Window
    val occ = docs
      .select(col(idCol), explode_outer(TF.tokens(col(textCol))).as("__t"))
      .filter(col("__t").isNotNull)
    val classTok = docs
      .select(col(labelCol).as("__c"),
        explode_outer(TF.tokens(col(textCol))).as("__t"))
      .filter(col("__t").isNotNull)
      .groupBy("__c", "__t").agg(count(lit(1)).as("__ct"))
    val classTotals = classTok.groupBy("__c").agg(sum("__ct").as("__n"))
    val vocab = occ.select(countDistinct("__t").as("__v"))
    val priors = docs.groupBy(col(labelCol).as("__c"))
      .agg(count(lit(1)).as("__docs"))
    val priorsQ = priors
      .crossJoin(broadcast(priors.agg(sum("__docs").as("__total"))))
      .select(col("__c"),
        round(log2(col("__docs") / col("__total")) * 1e6).cast("long")
          .as("__prior_q"))
    // per-occurrence × per-class quantized log-likelihood; unseen
    // (class, token) pairs fall back to the zero-count smoothed mass
    val scored = occ
      .crossJoin(broadcast(classTotals.join(priorsQ, "__c")))
      .crossJoin(broadcast(vocab))
      .join(broadcast(classTok), Seq("__c", "__t"), "left")
      .withColumn("__llq",
        round(log2((coalesce(col("__ct"), lit(0L)) + alpha) /
          (col("__n") + lit(alpha) * col("__v"))) * 1e6).cast("long"))
      .groupBy(col(idCol), col("__c"), col("__prior_q"))
      .agg(sum("__llq").as("__sum_llq"))
      .select(col(idCol), col("__c"),
        (col("__prior_q") + col("__sum_llq")).as("score_q"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_q").desc, col("__c").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("__c").as("pred"), col("score_q"))
  }

  /** The first BPE merge-selection step (Sennrich et al. 2016): weighted
    * adjacent-symbol-pair frequencies over the corpus, the statistic a
    * tokenizer trainer maximizes at every merge. Returns the `topN`
    * (pair, count) candidates, count desc / pair asc.
    *
    * Scale shape — the defining BPE trick carries over to Spark: pair
    * counting runs on the WORD-FREQUENCY TABLE (vocab-sized, one corpus
    * token-count aggregate), not the corpus — each distinct word
    * contributes its pairs once, weighted by its count. The per-word
    * char-pair explode is ∝ Σ word lengths over the VOCAB; the final
    * top-N is a bounded orderBy+limit on the pair table. */
  def bpePairCandidates(docs: DataFrame, textCol: String,
      topN: Int = 20): DataFrame = {
    require(topN >= 1, "need a positive candidate count")
    val vocab = docs
      .select(explode_outer(TF.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull) // outer+filter: see DocDedup.explodePairs
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    vocab
      .filter(length(col("tok")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, length(tok) - 1)," +
          " i -> concat(substr(tok, i, 1), ' ', substr(tok, i + 1, 1)))"))
        .as("pair"))
      .groupBy("pair").agg(sum("cnt").as("count"))
      .orderBy(col("count").desc, col("pair").asc)
      .limit(topN)
  }

  /** Iterated BPE merge TRAINING (Sennrich et al. 2016 §3.2): `rounds`
    * greedy merge selections, each the argmax weighted adjacent-pair
    * count over the current symbolization, applied corpus-wide before
    * the next count. Returns the merge table
    * (round, pair, merged, count) — the tokenizer-training artifact a
    * BPE encoder replays in order.
    *
    * Scale shape — the defining BPE trick ([[bpePairCandidates]]): every
    * round runs on the WORD-FREQUENCY TABLE (vocab-sized), never the
    * corpus; the corpus is scanned exactly once to build it. Each round
    * is one vocab aggregate + a 1-row driver argmax + one vocab-wide
    * projection, with the vocab localCheckpointed per round so round r
    * never replays rounds 1..r−1 (the connectedComponents discipline).
    *
    * Determinism: counts are exact integer sums (ties: pair ascending),
    * and the merge application is two passes of LITERAL-substring
    * `replace` over the space-padded symbol string — the first pass
    * consumes the shared separator space of back-to-back occurrences,
    * the second catches the ones it skipped, and a merge can never
    * create a new occurrence of its own pair (the merged symbol is
    * space-free) — so the double-pass is exactly greedy non-overlapping
    * merging, replayed bit-identically by any engine's `replace`. */
  def bpeMergeRounds(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one merge round")
    val spark = docs.sparkSession
    import spark.implicits._
    def escSql(s: String): String =
      s.replace("\\", "\\\\").replace("'", "''")
    var vocab = docs
      .select(explode_outer(TF.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull && length(col("tok")) >= 1)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      // initial symbolization: characters joined by single spaces
      .select(expr("array_join(transform(sequence(1, length(tok)), " +
        "i -> substring(tok, i, 1)), ' ')").as("syms"), col("cnt"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (r <- 1 to rounds) {
      val top = vocab
        .select(col("cnt"), split(col("syms"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("cnt"), explode(expr("transform(sequence(1, size(a) - 1), " +
          "i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"))
          .as("pair"))
        .groupBy("pair").agg(sum("cnt").as("count"))
        .orderBy(col("count").desc, col("pair").asc)
        .limit(1).collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val merged = pair.replace(" ", "")
        out += ((r, pair, merged, cnt))
        val f = escSql(" " + pair + " ")
        val t = escSql(" " + merged + " ")
        vocab = vocab.select(trim(expr(
          s"replace(replace(' ' || syms || ' ', '$f', '$t'), '$f', '$t')"))
          .as("syms"), col("cnt"))
          .localCheckpoint()
      }
    }
    out.toSeq.toDF("round", "pair", "merged", "count")
  }

  /** CCNet-style perplexity terciles: within each stratum (CCNet cuts
    * per language), rank documents by LM score ascending and label the
    * first ⌈n/3⌉ `head`, the next third `middle`, the rest `tail` —
    * the bucketing CCNet's pipeline feeds to its quality filter.
    *
    * Scale shape — NO corpus-wide window: scores coarse-bucket to
    * `bucketDecimals` decimals (≤ strata × 10^d rows — a driver-sized
    * metadata frame, like [[graft.pipeline.Sampling.budgetSelect]]'s
    * running totals); each coarse bucket knows its global rank range
    * `(before, before+count]`, so every bucket whose range sits inside
    * one tercile labels its rows by broadcast-join alone. ONLY the ≤2
    * buckets per stratum that straddle a cut line run an in-bucket
    * row_number — the window sorts one coarse bucket, not the corpus.
    * Determinism: ranking is over (score, id); the coarse bucket is a
    * monotone function of score, so two-level rank ≡ global rank —
    * exactly the equality the oracle asserts. Callers pass a score
    * already rounded to stable decimals (e.g. `round(bits, 6)`). */
  def perplexityBuckets(df: DataFrame, idCol: String, strataCol: String,
      scoreCol: String, bucketDecimals: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bk = round(col(scoreCol), bucketDecimals)
    val perBucket = df.groupBy(col(strataCol), bk.as("__bk"))
      .agg(count(lit(1)).as("__bn"))
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wn = Window.partitionBy(col(strataCol))
    val lo = col("__before") + 1L
    val hi = col("__before") + col("__bn")
    def label(r: Column): Column =
      when(r <= col("__c1"), "head")
        .when(r <= col("__c2"), "middle").otherwise("tail")
    val marked = perBucket
      .withColumn("__before", coalesce(sum("__bn").over(wb), lit(0L)))
      .withColumn("__n", sum("__bn").over(wn))
      .withColumn("__c1", expr("(__n + 2) div 3"))
      .withColumn("__c2", expr("(2 * __n + 2) div 3"))
      .withColumn("__uniform", label(lo) === label(hi))
      .withColumn("__lbl", label(lo))
      .drop("__bn", "__n")
    val joined = df.withColumn("__bk", bk)
      .join(broadcast(marked), Seq(strataCol, "__bk"))
    val easy = joined.filter(col("__uniform"))
      .withColumn("bucket", col("__lbl"))
    val wIn = Window.partitionBy(col(strataCol), col("__bk"))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    val hard = joined.filter(!col("__uniform"))
      .withColumn("bucket",
        label(col("__before") + row_number().over(wIn)))
    easy.unionByName(hard)
      .drop("__bk", "__before", "__c1", "__c2", "__uniform", "__lbl")
  }

  /** Jensen–Shannon divergence (bits) between each stratum's unigram
    * distribution and the REST of the corpus — the vocabulary-drift
    * audit between corpus slices (sources, snapshots, languages): 0 =
    * identical wording mix, 1 = disjoint vocabularies.
    *
    * JSD(P‖Q) = ½Σ p·log2(p/m) + ½Σ q·log2(q/m), m = (p+q)/2. Shape:
    * one token count per (stratum, term), a vocab-sized global count
    * table, and the strata totals (driver-sized) broadcast back; the
    * per-term frame is vocab × strata — vocabulary-, not corpus-,
    * proportional. Each term's contribution quantizes to integer
    * nano-bits BEFORE the sum (the NB/Zipf discipline), so the two
    * engine's sums are identical integers. */
  def jsDivergence(docs: DataFrame, strataCol: String,
      textCol: String): DataFrame = {
    val tok = docs
      .select(col(strataCol).as("s"), explode_outer(TF.tokens(col(textCol))).as("t"))
      .filter(col("t").isNotNull && length(col("t")) > 0)
    val sc = tok.groupBy("s", "t").agg(count(lit(1)).as("c"))
    val gc = sc.groupBy("t").agg(sum("c").as("g"))
    val st = sc.groupBy("s").agg(sum("c").as("ns"))
    val tot = st.agg(sum("ns").as("N"))
    val full = gc.crossJoin(broadcast(st))
      .join(sc, Seq("s", "t"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("cp", coalesce(col("c"), lit(0L)))
      .withColumn("cq", col("g") - col("cp"))
      .withColumn("p", col("cp").cast("double") / col("ns"))
      .withColumn("q", col("cq").cast("double") / (col("N") - col("ns")))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("bp", when(col("cp") > 0,
        floor(col("p") * log2(col("p") / col("m")) * lit(1e9) + lit(0.5))
          .cast("long")).otherwise(lit(0L)))
      .withColumn("bq", when(col("cq") > 0,
        floor(col("q") * log2(col("q") / col("m")) * lit(1e9) + lit(0.5))
          .cast("long")).otherwise(lit(0L)))
    full.groupBy(col("s").as(strataCol))
      .agg(((sum("bp") + sum("bq")).cast("double") / lit(2e9)).as("js_bits"))
  }
}
