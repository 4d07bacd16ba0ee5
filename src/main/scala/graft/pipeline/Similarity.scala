package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast
  * — one scan of the corpus, no shuffle of corpus rows, scales linearly.
  *
  * Scale path: IVF — k-means-style inverted lists. Every vector is
  * assigned to its nearest centroid once (a broadcast join against the
  * centroid table); queries probe only `nprobe` nearest lists, cutting the
  * scanned fraction to ~nprobe/nlist of the corpus. Centroids here are
  * seeded deterministically from the corpus itself (no RNG), so results
  * are reproducible and oracle-checkable.
  *
  * Norm discipline: `cosine(a, b)` per candidate pair is three
  * interpreted array passes (dot + two norms). Every operator here
  * computes each vector's norm ONCE (below any join, where the optimizer
  * cannot pull it up) and scores pairs as `dot / (na * nb)` — the same
  * float expression order as `cosine`, so results are bit-equal, at a
  * third of the array passes.
  */
object Similarity {

  /** (id, __e f64 vector, __n norm) projection — the scoring currency. */
  private def normed(df: DataFrame, idCol: String, vecCol: String,
      outVec: String, outNorm: String, extra: Seq[Column] = Nil): DataFrame =
    df.select(Seq(col(idCol), asDouble(col(vecCol)).as(outVec)) ++ extra: _*)
      .withColumn(outNorm, sqrt(dot(col(outVec), col(outVec))))

  /** Cosine from a precomputed dot and two norms, null-safe for zero-norm
    * vectors: under ANSI SQL (Spark 4 default) `x / 0.0` THROWS rather
    * than returning NULL, so the denominator is guarded — a zero-norm
    * vector has no direction, scores NULL, and ranks nowhere (rankTopK
    * and threshold filters both drop nulls). Identical float expression
    * order to the unguarded `dot / (na * nb)` for every non-zero pair. */
  private def cosExpr(dotCol: Column, na: Column, nb: Column): Column =
    when(na * nb =!= 0.0, dotCol / (na * nb))

  /** Quantize a cosine to integer micro-units (halfway-mode-safe
    * `floor(x·1e6 + 0.5)`, the [[pqTopK]] form; exact as a double since
    * |cos|·1e6 ≪ 2^53). Ranking raw doubles is not engine-version-proof:
    * DuckDB's `list_dot_product` and the JVM's fold can differ by 1 ulp
    * (pairwise vs sequential summation), and a 1-ulp cosine at ranks
    * k/k+1 swaps them (r8 verdict: `ann_recall_eval`). After
    * quantization an ulp wobble flips the score only at a .5-micro
    * boundary, and even then changes the output only if it crosses
    * another candidate's value — ties already break by id. */
  private[pipeline] def micro(c: Column): Column =
    // floor() yields bigint; TopK's encoder scores doubles — the cast
    // back is exact (|cos|·1e6 ≪ 2^53). Shared across the pipeline
    // package: every quantize-before-rank/filter site must use THIS
    // spelling (floor(x·1e6+0.5), not round()) or the cross-engine
    // bit-exactness contract silently forks.
    floor(c * lit(1e6) + lit(0.5)).cast("double")

  /** Rank the scored candidates: top-k rows per group via the bounded
    * [[graft.functions.TopK]] aggregate — partial aggregation means each
    * map task ships at most k rows per group, so a handful of query groups
    * over a huge corpus is NOT a single-reducer sort (which is what a
    * row_number window would do). Output matches the window formulation
    * exactly (score desc, id asc ties). */
  private def rankTopK(scored: DataFrame, k: Int, groupCol: String,
      scoreCol: String, idCol: String): DataFrame =
    // Null scores (e.g. a zero-norm vector: x/0 is NULL in Spark SQL, even
    // for doubles) would hit TopK's non-nullable input encoder; the window
    // formulation this replaced ranked them last, i.e. never in the top-k
    // for any k < group size — dropping them up front is the same answer.
    scored.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(k)(col(scoreCol), col(idCol)).as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col(groupCol), col("s.id").as("neighbor_id"),
        col("s.score").as(scoreCol), (col("pos") + 1).cast("int").as("rank"))

  /** Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * THE standard way to combine a lexical and a semantic ranking (or any
    * set of rankings) without score calibration: each list contributes
    * `1/(k0 + rank)` per item, fused items rank by the sum. `k0 = 60` is
    * the canonical constant.
    *
    * Every input must carry (groupCol, idCol, rankCol). Contributions
    * quantize to integer micro-units BEFORE the sum (ranks are small
    * integers, so `floor(1e6/(k0+rank) + 0.5)` is the same value on any
    * engine and the sum is order-free); the exposed `rrf` is micro/1e6.
    *
    * Scale shape: one union of the (already bounded) candidate lists,
    * one (group, id) aggregate, then the bounded TopK per group — never
    * a corpus pass; fusion only ever touches retrieval outputs. */
  def rrfFuse(lists: Seq[DataFrame], groupCol: String, idCol: String,
      rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "RRF needs at least one ranked list")
    val contribs = lists.map(_.select(col(groupCol), col(idCol),
        floor(lit(1e6) / (lit(k0) + col(rankCol)) + lit(0.5))
          .cast("long").as("__c")))
      .reduce(_ unionByName _)
    val scored = contribs
      .groupBy(col(groupCol), col(idCol))
      .agg(sum(col("__c")).as("__s"))
      .select(col(groupCol), col(idCol),
        col("__s").cast("double").as("rrf"))
    rankTopK(scored, k, groupCol, "rrf", idCol)
      .select(col(groupCol), col("neighbor_id"),
        (col("rrf") / lit(1e6)).as("rrf"), col("rank"))
  }

  /** Brute-force top-k by cosine. `queries` must be small (it is broadcast).
    * Ties break by ascending corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      microRank: Boolean = false): DataFrame = {
    val c = normed(corpus, idCol, vecCol, "__e", "__n")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol),
        (if (microRank) micro(cos) else cos).as("cos"))
    rankTopK(scored, k, qIdCol, "cos", idCol)
  }

  /** Assign each corpus vector to its best (cosine) centroid: broadcast
    * join + argmax AGGREGATE `max(struct(aff, -c_id))`. Partial
    * aggregation collapses the corpus x nlist expansion back to one row
    * per vector before the shuffle — a windowed row_number would shuffle
    * the full expansion and sort per-vector groups. Ties take the
    * smallest c_id. Output keeps the f64 vector and its norm for
    * downstream scoring. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      cIdCol: String = "c_id", cVecCol: String = "c_vec",
      microRank: Boolean = false, carryCols: Seq[String] = Nil): DataFrame = {
    val c = normed(corpus, idCol, vecCol, "__e", "__n", carryCols.map(col))
    val cent = normed(centroids, cIdCol, cVecCol, "__ce", "__cn")
    val aff = cosExpr(dot(col("__e"), col("__ce")), col("__n"), col("__cn"))
    c.crossJoin(broadcast(cent))
      .withColumn("aff", if (microRank) micro(aff) else aff)
      .groupBy(col(idCol))
      .agg(first(col("__e")).as("__e"),
        (Seq(first(col("__n")).as("__n"),
          max(struct(col("aff").as("a"), (-col(cIdCol)).as("nc"))).as("m")) ++
        carryCols.map(n => first(col(n)).as(n))): _*)
      .select(Seq(col(idCol), col("__e"), col("__n"),
        (-col("m.nc")).as(cIdCol)) ++ carryCols.map(col): _*)
  }

  /** The persistable IVF index of a corpus: every vector assigned to its
    * nearest centroid list, carrying the normalized vector and its norm —
    * exactly what [[ivfTopKIndexed]] scores against. Computed ONCE per
    * corpus build and persisted (parquet, partitioned by `c_id`), so
    * serving-time queries never re-assign the corpus — the same
    * pay-the-corpus-cost-once posture as [[DocDedup.lshIndex]]. At
    * 100 TB the index build is the one full-corpus job; every query
    * batch afterwards touches only the probed lists. */
  def ivfIndex(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      microRank: Boolean = false, carryCols: Seq[String] = Nil): DataFrame =
    assignToCentroids(corpus, centroids, idCol, vecCol,
      microRank = microRank, carryCols = carryCols)

  /** Filtered vector search (the label/ACL/date-predicate variant every
    * vector store exposes): top-k over only the index rows satisfying
    * `pred`. This is PRE-filtering — the predicate is applied to the
    * index scan BEFORE any distance is computed, so a selective filter
    * cuts scoring cost proportionally; post-filtering (rank first, drop
    * after) under-fills k whenever fewer than k of the true top
    * candidates match. The filterable attributes must have been carried
    * INTO the index at build time (`ivfIndex(carryCols = ...)`) — the
    * production posture: attributes ride the same parquet rows as the
    * lists, so on a persisted index the predicate pushes down to the
    * scan (row-group stats / partition pruning) and filtered search
    * never touches an attribute side-table at query time.
    *
    * Recall caveat (standard for IVF pre-filtering): probes are chosen
    * by query-centroid affinity BEFORE the filter, so a highly selective
    * predicate concentrated in un-probed lists lowers recall — widen
    * `nprobe` as selectivity rises. */
  def filteredTopKIndexed(index: DataFrame, centroids: DataFrame,
      queries: DataFrame, pred: Column, k: Int, nprobe: Int,
      idCol: String = "vec_id",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      microRank: Boolean = false): DataFrame =
    ivfTopKIndexed(index.filter(pred), centroids, queries, k, nprobe,
      idCol, qIdCol, qVecCol, microRank)

  /** IVF top-k against a prebuilt [[ivfIndex]]: assign each QUERY to its
    * `nprobe` nearest centroid lists, score only those lists' members.
    * The index side is never re-shuffled — the probe table broadcasts
    * onto it. */
  def ivfTopKIndexed(index: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      microRank: Boolean = false,
      excludeSelf: Boolean = true): DataFrame = {
    val cent = normed(centroids, "c_id", "c_vec", "__ce", "__cn")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
    val probeAff =
      cosExpr(dot(col("__qe"), col("__ce")), col("__qn"), col("__cn"))
    val probes = rankTopK(
      q.crossJoin(broadcast(cent))
        .select(col(qIdCol), col("c_id").as("__cid"),
          (if (microRank) micro(probeAff) else probeAff).as("aff")),
      nprobe, qIdCol, "aff", "__cid")
      .select(col(qIdCol), col("neighbor_id").as("c_id"))
      .join(q, qIdCol)
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    // excludeSelf drops an index row whose id equals the query's — right
    // for retrieval/eval (a query must not retrieve itself). Dedup-style
    // callers pass false: there an id ALREADY in the index (at-least-once
    // replay of a delivered batch) must match its indexed copy at
    // cos = 1e6 and flag as a duplicate instead of slipping past.
    val joined = index.join(broadcast(probes), "c_id")
    val scored = (if (excludeSelf) joined.filter(col(idCol) =!= col(qIdCol))
      else joined)
      .select(col(qIdCol), col(idCol),
        (if (microRank) micro(cos) else cos).as("cos"))
    rankTopK(scored, k, qIdCol, "cos", idCol)
  }

  /** Range search against a prebuilt [[ivfIndex]]: EVERY index row within
    * cosine ≥ `minCosMicro/1e6` of each query, not a fixed top-k — the
    * radius-query variant every vector store exposes next to k-NN (find
    * all near-duplicates / all matches above a similarity floor, where
    * the hit count is data-dependent). Same probing shape as
    * [[ivfTopKIndexed]] — the index is never re-shuffled, the probe table
    * broadcasts onto it — but the verdict is a THRESHOLD on the
    * integer-micro cosine (exact comparison, no ranking state), so the
    * scan needs no TopK aggregate at all: candidates stream through a
    * codegen'd filter and the output is exactly the qualifying pairs.
    * Approximation contract matches IVF k-NN: hits living in un-probed
    * lists are missed — widen `nprobe` to trade cost for recall. */
  def ivfRangeIndexed(index: DataFrame, centroids: DataFrame,
      queries: DataFrame, minCosMicro: Long, nprobe: Int,
      idCol: String = "vec_id",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      excludeSelf: Boolean = true): DataFrame = {
    val cent = normed(centroids, "c_id", "c_vec", "__ce", "__cn")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
    val probeAff =
      cosExpr(dot(col("__qe"), col("__ce")), col("__qn"), col("__cn"))
    val probes = rankTopK(
      q.crossJoin(broadcast(cent))
        .select(col(qIdCol), col("c_id").as("__cid"),
          micro(probeAff).as("aff")),
      nprobe, qIdCol, "aff", "__cid")
      .select(col(qIdCol), col("neighbor_id").as("c_id"))
      .join(q, qIdCol)
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val joined = index.join(broadcast(probes), "c_id")
    (if (excludeSelf) joined.filter(col(idCol) =!= col(qIdCol)) else joined)
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        micro(cos).as("cos_micro"))
      .filter(col("cos_micro") >= minCosMicro)
  }

  /** ColBERT-style late-interaction retrieval (Khattab & Zaharia, SIGIR
    * 2020 "maxsim"): documents and queries are BAGS of vectors (passage
    * chunks / query tokens), and
    *   score(q, d) = Σ_{query parts p} max_{doc chunks c} cos(p, c)
    * — each query part finds its best-matching chunk independently, so
    * a long document can't dilute a strong local match the way a single
    * pooled vector does.
    *
    * Exactness: cosines are micro-quantized per (part, chunk) pair
    * (integer), the per-part max and the per-doc sum are exact integer
    * aggregates, and ranking ties break by ascending doc id — engine-
    * and partitioning-proof end to end. Scale shape: the query-part
    * table broadcasts onto ONE chunk-corpus scan; both reductions are
    * partial-aggregating groupBys (max then sum collapse the pair
    * expansion map-side), and the final ranking is the bounded TopK
    * aggregate — never a corpus window. `excludeDocOf` drops candidate
    * docs equal to a query's own source doc (eval hygiene). */
  def maxSimTopK(chunks: DataFrame, queryParts: DataFrame, k: Int,
      docCol: String = "doc_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      excludeSelfDoc: Boolean = true): DataFrame = {
    val c = chunks.select(col(docCol), asDouble(col(vecCol)).as("__e"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
    val q = queryParts
      .select(col(qIdCol), col("part_id"), asDouble(col(qVecCol)).as("__qe"))
      .withColumn("__qn", sqrt(dot(col("__qe"), col("__qe"))))
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val joined = c.crossJoin(broadcast(q))
    val scoped =
      if (excludeSelfDoc) joined.filter(col(docCol) =!= col(qIdCol))
      else joined
    val perPart = scoped
      .select(col(qIdCol), col(docCol), col("part_id"),
        micro(cos).cast("long").as("__m"))
      .filter(col("__m").isNotNull)
      .groupBy(col(qIdCol), col(docCol), col("part_id"))
      .agg(max(col("__m")).as("__best"))
    val scored = perPart
      .groupBy(col(qIdCol), col(docCol))
      .agg(sum(col("__best")).cast("double").as("maxsim"))
    rankTopK(scored.select(col(qIdCol), col(docCol), col("maxsim")),
      k, qIdCol, "maxsim", docCol)
  }

  /** Recall@k of IVF retrieval for EVERY nprobe in 1..maxProbe at once —
    * the table that picks the nprobe operating point (recall climbs, cost
    * grows linearly; serve at the knee). Output: one row per nprobe with
    * total hits against brute-force ground truth and the mean recall.
    *
    * One corpus pass: candidates are scored ONCE against the maxProbe
    * widest probe set; a candidate found via probe rank `pr` then joins
    * every curve np >= pr through a bounded explode (≤ maxProbe rows per
    * candidate) — never maxProbe separate corpus scans. Ranking is the
    * bounded TopK aggregate per (query, np) group, and with `microRank`
    * the scores ride integer-micro cosines (engine-proof, the
    * quantize-before-dot discipline). */
  def ivfRecallCurve(corpus: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, maxProbe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      microRank: Boolean = false): DataFrame = {
    require(maxProbe >= 1, s"maxProbe must be >= 1, got $maxProbe")
    val index = ivfIndex(corpus, centroids, idCol, vecCol,
      microRank = microRank)
    val cent = normed(centroids, "c_id", "c_vec", "__ce", "__cn")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
    val probeAff =
      cosExpr(dot(col("__qe"), col("__ce")), col("__qn"), col("__cn"))
    val probes = rankTopK(
      q.crossJoin(broadcast(cent))
        .select(col(qIdCol), col("c_id").as("__cid"),
          (if (microRank) micro(probeAff) else probeAff).as("aff")),
      maxProbe, qIdCol, "aff", "__cid")
      .select(col(qIdCol), col("neighbor_id").as("c_id"),
        col("rank").as("__pr"))
      .join(q, qIdCol)
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val base = lit(maxProbe + 1L)
    val scored = index.join(broadcast(probes), "c_id")
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col("__pr"), col(idCol),
        (if (microRank) micro(cos) else cos).as("cos"))
      .withColumn("__np",
        explode(sequence(col("__pr").cast("long"), lit(maxProbe.toLong))))
      // composite (query, np) group packed into one long for the bounded
      // TopK ranking; decoded right after
      .withColumn("__g", col(qIdCol) * base + col("__np"))
    val truth = bruteForceTopK(corpus, queries, k, idCol, vecCol,
        qIdCol, qVecCol, microRank = microRank)
      .select(col(qIdCol), col("neighbor_id"), lit(1L).as("__hit"))
    val nQueries = queries.count()
    rankTopK(scored, k, "__g", "cos", idCol)
      .select(((col("__g") - pmod(col("__g"), base)) / base).cast("long")
          .as(qIdCol),
        pmod(col("__g"), base).cast("int").as("nprobe"), col("neighbor_id"))
      .join(truth, Seq(qIdCol, "neighbor_id"), "left")
      .groupBy("nprobe")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("nprobe"), col("hits"),
        round(col("hits") / lit(k.toLong * nQueries), 6).as("recall"))
  }

  /** IVF top-k: probe the `nprobe` centroid lists nearest to each query.
    * Approximate — recall depends on nprobe/nlist; exactness returns as
    * nprobe -> nlist. One-shot form of [[ivfIndex]] + [[ivfTopKIndexed]]. */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      microRank: Boolean = false): DataFrame =
    ivfTopKIndexed(
      ivfIndex(corpus, centroids, idCol, vecCol, microRank = microRank),
      centroids, queries, k, nprobe, idCol, qIdCol, qVecCol, microRank)

  /** Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
    * 1998): greedily pick k of the top-`n` retrieval candidates
    * maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — relevance traded
    * against redundancy with what is already selected.
    *
    * Scale shape: the CORPUS is touched only by the stage-1 retrieval
    * (the [[bruteForceTopK]] broadcast + bounded-TopK posture); the
    * greedy loop then runs k rounds over the n-per-query candidate pool —
    * a queries×n METADATA frame (the k-means-centroid discipline), each
    * round one argmax aggregate + one join, lineage truncated per round
    * by an eager localCheckpoint so round r never replays rounds 1..r−1.
    *
    * Exactness discipline: similarities quantize to integer micro-units
    * and λ is the rational `lambdaNum/lambdaDen`, so every score
    * comparison is integer arithmetic any engine replays identically;
    * ties break to the smallest candidate id. Round 1 (empty S) is pure
    * relevance, scaled by λden so it never mixes scales with later
    * rounds. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, n: Int, k: Int,
      lambdaNum: Long = 1L, lambdaDen: Long = 2L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    require(k >= 1 && n >= k, s"need n >= k >= 1, got n=$n k=$k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      "lambda must be a rational in [0, 1]")
    val mu = lit(1000000.0)
    val c = normed(corpus, idCol, vecCol, "__e", "__n")
    val cands = bruteForceTopK(corpus, queries, n, idCol, vecCol,
      qIdCol, qVecCol)
    var pool = cands.join(c, cands("neighbor_id") === c(idCol))
      .select(col(qIdCol), col("neighbor_id"),
        round(col("cos") * mu).cast("long").as("qsim"),
        col("__e"), col("__n"))
      .withColumn("maxsel", lit(Long.MinValue))
      .localCheckpoint()
    val rounds = (1 to k).map { step =>
      val score = when(col("maxsel") === Long.MinValue,
          col("qsim") * lambdaDen)
        .otherwise(col("qsim") * lambdaNum -
          lit(lambdaDen - lambdaNum) * col("maxsel"))
      val best = pool.withColumn("__sc", score)
        .groupBy(col(qIdCol))
        .agg(max(struct(col("__sc").as("sc"),
          (-col("neighbor_id")).as("nid"), col("qsim").as("qs"),
          col("__e").as("e"), col("__n").as("nm"))).as("b"))
        .select(col(qIdCol), (-col("b.nid")).as("sel_id"),
          col("b.qs").as("sel_qsim"), col("b.e").as("sel_e"),
          col("b.nm").as("sel_n"))
        .localCheckpoint()
      pool = pool.join(best, Seq(qIdCol))
        .filter(col("neighbor_id") =!= col("sel_id"))
        .withColumn("maxsel", greatest(col("maxsel"),
          round(cosExpr(dot(col("__e"), col("sel_e")),
            col("__n"), col("sel_n")) * mu).cast("long")))
        .select(col(qIdCol), col("neighbor_id"), col("qsim"),
          col("__e"), col("__n"), col("maxsel"))
        .localCheckpoint()
      best.select(col(qIdCol), lit(step).cast("int").as("rank"),
        col("sel_id").as("neighbor_id"),
        (col("sel_qsim") / mu).as("cos"))
    }
    rounds.reduce(_ unionByName _)
  }

  /** Hard-negative mining for contrastive training (DPR/Contriever
    * recipe): for each query, the top-k most-similar corpus vectors that
    * sit OUTSIDE the query's own semantic cluster — similar enough to be
    * hard, different enough (by the cluster oracle) to be negatives.
    *
    * `clusters` is an (id, cluster) frame covering corpus AND query ids
    * (e.g. [[Clustering.kmeansAssign]]). Scale shape: one co-partitioned
    * id join to attach corpus clusters, the query side broadcast with its
    * clusters attached, then the [[bruteForceTopK]] posture — broadcast
    * nested-loop + bounded TopK; the cluster filter prunes pairs BEFORE
    * the aggregate. */
  def hardNegatives(corpus: DataFrame, clusters: DataFrame,
      queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      clusterCol: String = "cluster", microRank: Boolean = false): DataFrame = {
    val c = normed(corpus, idCol, vecCol, "__e", "__n")
      .join(clusters, idCol)
    val qClusters = clusters
      .withColumnRenamed(idCol, qIdCol)
      .withColumnRenamed(clusterCol, "__qc")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
      .join(qClusters, qIdCol)
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol) && col(clusterCol) =!= col("__qc"))
      .select(col(qIdCol), col(idCol),
        (if (microRank) micro(cos) else cos).as("cos"))
    rankTopK(scored, k, qIdCol, "cos", idCol)
  }

  /** Semi-hard triplet mining (FaceNet recipe, Schroff et al. 2015 §3.2):
    * for each anchor, the positive is its most-similar SAME-label vector
    * and the negative is the most-similar DIFFERENT-label vector that is
    * still strictly LESS similar than the positive — inside the margin
    * band where the triplet loss has gradient (an easy negative
    * contributes nothing; the hardest negative can collapse training).
    * Anchors with no semi-hard negative (the positive is the weakest
    * match) are dropped, as in the reference recipe.
    *
    * Scale shape: the anchor batch broadcasts onto one corpus scan
    * (the [[bruteForceTopK]] posture); positive and negative are
    * struct-max AGGREGATES over that scored stream (map-side partials,
    * ties to the lowest id) — never a window over corpus rows. The
    * negative's "below the positive" bound rides a broadcast join of the
    * per-anchor positive row back onto the same scored stream. With
    * `microRank` the comparisons run on integer-micro cosines
    * (quantize-before-rank, engine-proof). */
  def semiHardTriplets(corpus: DataFrame, anchors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      qLabelCol: String = "q_label",
      microRank: Boolean = false): DataFrame = {
    val c = normed(corpus, idCol, vecCol, "__e", "__n", Seq(col(labelCol)))
    val q = normed(anchors, qIdCol, qVecCol, "__qe", "__qn",
      Seq(col(qLabelCol)))
    val cos = cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol), col(labelCol), col(qLabelCol),
        (if (microRank) micro(cos) else cos).as("cos"))
      .filter(col("cos").isNotNull)
    val pos = scored.filter(col(labelCol) === col(qLabelCol))
      .groupBy(col(qIdCol))
      .agg(max(struct(col("cos").as("c"), (-col(idCol)).as("ni"))).as("m"))
      .select(col(qIdCol), (-col("m.ni")).as("pos_id"),
        col("m.c").as("pos_cos"))
    val neg = scored.filter(col(labelCol) =!= col(qLabelCol))
      .join(broadcast(pos), qIdCol)
      .filter(col("cos") < col("pos_cos"))
      .groupBy(col(qIdCol))
      .agg(max(struct(col("cos").as("c"), (-col(idCol)).as("ni"))).as("m"))
      .select(col(qIdCol), (-col("m.ni")).as("neg_id"),
        col("m.c").as("neg_cos"))
    // both sides are anchor-batch-sized; broadcast skips a stats-blind SMJ
    broadcast(pos).join(neg, qIdCol)
      .select(col(qIdCol), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("gap"))
  }

  /** PQ asymmetric-distance top-k (ADC — Jégou et al. 2011, §IV): score
    * corpus vectors from their PQ codes alone. For each query, a distance
    * table `dt[j][c] = <q_j, codebook_j[c]>` is built ONCE (m·k dots);
    * a corpus row's score is then m table LOOKUPS summed —
    * `Σ_j dt[j][code_j] ≈ <q, x>` — never a full-dimension dot per pair.
    * That is the PQ bargain: the scan touches only the m·log2(k)-bit
    * codes (not the vectors), so the candidate pass runs on a corpus
    * compressed ~100× and the per-pair cost drops from O(dim) to O(m).
    *
    * Scale shape: codebooks are driver metadata (from
    * [[Clustering.pqFit]]); the per-query tables enter the plan as
    * broadcast literal arrays; scoring is a broadcast nested-loop over
    * the code table + the bounded TopK aggregate — the exact posture of
    * [[bruteForceTopK]], minus the vector reads.
    *
    * Determinism: the query vector is micro-quantized and the codebooks
    * arrive as integer micro-units ([[Clustering.pqFit]]), so each table
    * entry is an EXACT integer dot (scale 1e12 — |entry| ≤ sub·1e12 ≪
    * 2^53) with no accumulation-order dependence anywhere, and the
    * exposed score's `/1e12` is one IEEE op on identical operands in any
    * engine. */
  def pqTopK(codes: DataFrame, codebooks: Seq[(Int, Int, Seq[Long])],
      queries: DataFrame, k: Int,
      idCol: String = "vec_id", qIdCol: String = "q_id",
      qVecCol: String = "q_vec"): DataFrame = {
    val q = queries.select(col(qIdCol), asDouble(col(qVecCol)).as("__qe"))
    val (withTables, scoreQ) = adcTables(q, codebooks)
    val scored = codes.crossJoin(broadcast(withTables))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol),
        (scoreQ.cast("double") / lit(1e12)).as("score"))
    rankTopK(scored, k, qIdCol, "score", idCol)
  }

  /** Attach per-query ADC distance tables (`__dt0 … __dt{m-1}`) to a frame
    * carrying the f64 query vector in `__qe`; returns the augmented frame
    * plus the integer score expression `Σ_j dt[j][code_j]` (scale 1e12 —
    * micro query × micro codebook) that scores any row of a PQ code table
    * joined alongside. The query vector is micro-quantized HERE, so every
    * table entry is an exact order-free integer dot on any engine (the
    * quantize-the-vectors-not-the-dot discipline). Shared by [[pqTopK]]
    * (flat scan) and [[ivfPqTopK]] (cell-pruned scan). */
  private def adcTables(q: DataFrame,
      codebooks: Seq[(Int, Int, Seq[Long])]): (DataFrame, Column) = {
    val m = codebooks.map(_._1).max + 1
    val sub = codebooks.head._3.size
    val q2 = q.withColumn("__qq", microVec(col("__qe")))
    // per-query distance tables: for subspace j an array over codes c of
    // the exact integer dot <qq_j, cb[j][c]> — computed on the (tiny)
    // query side
    val withTables = (0 until m).foldLeft(q2) { (acc, j) =>
      val qSub = slice(col("__qq"), j * sub + 1, sub)
      // dense array INDEXED BY CODE ID — an emptied cluster leaves a gap
      // in the id space (updateCentroids drops it); a positional array
      // would silently shift every later code's entry
      val byCode = codebooks.collect { case (`j`, c, cq) => c -> cq }.toMap
      val entries = (0 to byCode.keys.max).map { c =>
        byCode.get(c) match {
          case Some(cq) =>
            dot(qSub, array(cq.map(v => lit(v.toDouble)): _*)).cast("long")
          case None => lit(null).cast("long") // unassignable code id
        }
      }
      acc.withColumn(s"__dt$j", array(entries: _*))
    }
    val scoreQ = (0 until m).map(j =>
      element_at(col(s"__dt$j"), col(s"code_$j") + 1)).reduce(_ + _)
    (withTables.drop("__qq"), scoreQ)
  }

  /** IVF-PQ top-k (Jégou et al. 2011, §V — the composed index every
    * billion-scale ANN service runs): the coarse quantizer prunes the
    * corpus to the `nprobe` cells nearest each query, and within those
    * cells candidates are scored by PQ asymmetric distance — so the scan
    * touches ~nprobe/nlist of a corpus that is itself ~100× compressed
    * (codes, not vectors). Recall returns as nprobe → nlist, at which
    * point this degrades gracefully into [[pqTopK]].
    *
    * Inputs are the two fitted artifacts: `cells` =
    * [[Clustering.kmeansFit]] assignments (id, cluster) with `centroids`
    * its driver-metadata centroid list, and `codes` + `codebooks` =
    * [[Clustering.pqFit]]. Scale shape: probe selection is pure
    * expression math on the (tiny) query side against centroid literal
    * arrays; the candidate restriction is ONE broadcast hash join of the
    * code table against (query × nprobe) probe rows on the cell id —
    * corpus rows in unprobed cells are filtered at the join, never
    * scored; then the [[pqTopK]] posture (integer-micro table lookups +
    * bounded TopK) finishes. Zero corpus shuffles.
    *
    * Determinism: probe ranking runs on micro-quantized cosines over
    * exact integer dots (micro query × micro centroids — the same
    * all-integer discipline as [[Clustering.assignOnce]]) and breaks
    * affinity ties to the smaller cell id (the `array_sort` struct
    * carries (−affMicro, cell)); ADC scores are exact integer sums, ties
    * to the smaller corpus id. */
  def ivfPqTopK(codes: DataFrame, cells: DataFrame,
      centroids: Seq[(Int, Seq[Long])],
      codebooks: Seq[(Int, Int, Seq[Long])],
      queries: DataFrame, k: Int, nprobe: Int,
      idCol: String = "vec_id", cellCol: String = "cluster",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    require(nprobe >= 1, s"need nprobe >= 1, got $nprobe")
    val q = queries.select(col(qIdCol), asDouble(col(qVecCol)).as("__qe"))
      .withColumn("__qq", microVec(col("__qe")))
      .withColumn("__qn", sqrt(dot(col("__qq"), col("__qq"))))
    // (−micro-affinity, cell) structs: array_sort ranks aff desc, cell asc
    val affs = centroids.sortBy(_._1).map { case (c, cq) =>
      val cn = math.sqrt(cq.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
      // a zero-norm side has no direction: rank it last (Long.MaxValue on
      // the negated axis) instead of letting ANSI mode throw on x/0
      val na = when(col("__qn") * lit(cn) =!= 0.0,
        -floor(dot(col("__qq"), array(cq.map(v => lit(v.toDouble)): _*))
          / (col("__qn") * lit(cn)) * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(lit(Long.MaxValue))
      struct(na.as("na"), lit(c).as("c"))
    }
    val probes = q
      .withColumn("__p", explode(slice(array_sort(array(affs: _*)), 1, nprobe)))
      .select(col(qIdCol), col("__qe"), col("__p.c").as(cellCol))
    val (withTables, scoreQ) = adcTables(probes, codebooks)
    val scored = codes.join(cells.select(col(idCol), col(cellCol)), idCol)
      .join(broadcast(withTables), cellCol)
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol),
        (scoreQ.cast("double") / lit(1e12)).as("score"))
    rankTopK(scored, k, qIdCol, "score", idCol)
  }

  // ------------------------- binary (sign) embeddings + Hamming top-k

  /** Sign-bit binarization of an embedding column — the "binary
    * quantization" retrieval baseline (Charikar 2002 sign-projection
    * duality, applied directly to the coordinates): bit j of word w is
    * set iff `x[32w + j] >= 0`. Packs 32 dims per 64-bit word (not 64 —
    * bit 63 would need `1L << 63`, which overflow-checked engines
    * refuse, and 32-per-word keeps every shift and OR exact everywhere),
    * a 64x compression of an f64 vector. A short final word zero-fills
    * its missing dims on both engines. */
  def binarySign(df: DataFrame, idCol: String, vecCol: String,
      out: String = "bits"): DataFrame = {
    // r16: native SignPackExpr kernel — the composed
    // transform(sequence)/aggregate(zip_with) form was CodegenFallback
    // and walked an interpreted tree per vector ELEMENT; the kernel runs
    // the identical bit math (x >= 0 under Spark's NaN-is-largest
    // comparison semantics sets the bit, null does not, null/empty
    // vector → empty array) in one codegen'd loop, pinned by
    // BitKernelsSpec.
    val words = org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.SignPackExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(asDouble(col(vecCol)))))
    df.select(col(idCol), words.as(out))
  }

  /** Hamming top-k over [[binarySign]] words: per-pair cost is dim/32
    * XOR+popcount word ops instead of dim multiplies — the coarse stage
    * of binary-quantized retrieval (rescore survivors with the exact
    * cosine when recall matters). Same posture as [[bruteForceTopK]]
    * (queries broadcast, bounded TopK aggregate); distances are small
    * integers, so results are exact on any engine; ties break by
    * ascending id. */
  def hammingTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", bitsCol: String = "bits",
      qIdCol: String = "q_id", qBitsCol: String = "q_bits"): DataFrame = {
    // r16: native popcount fold (see HammingDistExpr) — this runs once
    // per (query, corpus) pair on the broadcast scan, where the composed
    // aggregate(zip_with(...)) paid an interpreted walk per word per pair
    val dist = org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.HammingDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(col(bitsCol)),
        org.apache.spark.sql.graft.ColumnBridge.toExpr(col(qBitsCol))))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol), (-dist).cast("double").as("score"))
    rankTopK(scored, k, qIdCol, "score", idCol)
      .select(col(qIdCol), col("rank"), col("neighbor_id"),
        (-col("score")).cast("int").as("hamming"))
  }

  /** Two-stage cascade retrieval: Hamming over [[binarySign]] words
    * prunes the corpus to `coarseK` candidates per query, then the EXACT
    * cosine rescores just those — the standard coarse-filter/fine-rank
    * deployment of binary quantization (recall returns as coarseK
    * grows). Scale shape: the coarse stage is the [[hammingTopK]]
    * broadcast+popcount scan; the rescore joins only queries x coarseK
    * candidate rows back to the corpus BY ID (a keyed hash join pulling
    * candidate vectors alone — the full-dimension math never touches
    * non-candidates), then the bounded TopK finishes. */
  def cascadeTopK(corpus: DataFrame, queries: DataFrame, coarseK: Int,
      k: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    require(coarseK >= k, s"need coarseK >= k, got coarseK=$coarseK k=$k")
    val bits = binarySign(corpus, idCol, vecCol)
    val qbits = binarySign(queries, qIdCol, qVecCol, out = "q_bits")
    val cands = hammingTopK(bits, qbits, coarseK, idCol, "bits",
        qIdCol, "q_bits")
      .select(col(qIdCol), col("neighbor_id").as(idCol))
    val c = normed(corpus, idCol, vecCol, "__e", "__n")
    val q = normed(queries, qIdCol, qVecCol, "__qe", "__qn")
    val scored = cands.join(c, idCol).join(broadcast(q), qIdCol)
      .select(col(qIdCol), col(idCol),
        cosExpr(dot(col("__e"), col("__qe")), col("__n"), col("__qn"))
          .as("cos"))
    rankTopK(scored, k, qIdCol, "cos", idCol)
  }

  /** Deterministic ±1 hyperplanes for sign-bit LSH (seeded LCG, no RNG
    * state): reproducible across runs and engines, so an external oracle
    * can re-derive the identical buckets. */
  def lshPlanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    var x = 0x9E3779B97F4A7C15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
    Seq.fill(nPlanes)(Seq.fill(dim)(if ((next() & 1L) == 1L) 1.0 else -1.0))
  }

  /** Random-hyperplane LSH bucketing for cosine: sign bits of projections
    * onto `planes` (a small in-memory matrix, broadcast as literal
    * columns). Vectors sharing a signature land in one bucket; near-dup
    * search joins within buckets only. */
  def cosineLshBuckets(df: DataFrame, vecCol: String, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(col(vecCol), planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** All pairs with cosine >= threshold among LSH-bucket collisions.
    * Each vector's norm (and f64 cast) is computed ONCE below the join —
    * the pair stage is a single dot product per collision.
    *
    * `maxBucket` bounds the quadratic in-bucket join: with p planes a
    * bucket holds ~N/2ᵖ of the corpus, so too few planes for the corpus
    * size degenerates to a near-self-join — buckets beyond the cap are
    * dropped (their pairs would be mostly sub-threshold noise at
    * quadratic cost), the same guard DocDedup applies to its LSH/SimHash
    * buckets. Size the planes so real buckets stay far under the cap. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val b0 = df.select(col(idCol), asDouble(col(vecCol)).as("__e"),
        cosineLshBuckets(df, vecCol, planes).as("bucket"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
    val small = b0.groupBy("bucket").count()
      .filter(col("count") <= maxBucket).drop("count")
    val b = b0.join(small, Seq("bucket"), "left_semi")
    // membership quantizes to integer micro-units before the threshold
    // compare (and `cos` is exposed as micro/1e6): a raw-double
    // `cos >= t` puts pair membership on a 1-ulp knife edge whenever a
    // pair's cosine sits at the threshold — the cross-engine fragility
    // class of the r8 ann_recall_eval miss, applied to a filter
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("__qm", micro(
        cosExpr(dot(col("a.__e"), col("b.__e")), col("a.__n"), col("b.__n"))))
      .filter(col("__qm") >= math.rint(threshold * 1e6))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        (col("__qm") / lit(1e6)).as("cos"))
  }
}
