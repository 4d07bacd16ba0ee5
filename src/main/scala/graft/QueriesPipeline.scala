package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.pipeline.{Clustering, DocDedup, LanguageModel, Multimodal,
  Packing, Quantization, Ranking, Sampling, Similarity}
import graft.sources.Tables

/** Training-data-pipeline correctness-gate queries (documents/embeddings):
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * Same oracle conventions as QueriesCore. The MinHash/SimHash token
  * hashing is md5-hex based so the DuckDB oracle can reproduce it exactly.
  */
object QueriesPipeline {
  type Builder = (SparkSession, String) => DataFrame

  // DuckDB twins of TextFunctions.normalize / tokens / hash60
  private val dNorm = raw"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
  private val dToks = s"regexp_split_to_array($dNorm, ' ')"
  private def dHash60(x: String) =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  // shared oracle CTE: distinct word-3-gram shingles per document
  private val dShingles = s"""
    toks AS (SELECT doc_id, $dToks AS w FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
      FROM toks WHERE len(w) >= 3)"""

  private val dJaccardPairs = s"""WITH $dShingles,
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
    SELECT id1, id2,
      round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard
    FROM pairs JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
    WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7
    ORDER BY id1, id2"""

  // the MinHash permutation parameters the dedup queries run with,
  // exported to the oracle as a VALUES table so DuckDB replays the exact
  // all-integer signature arithmetic (h·a + b mod 2³¹−1 stays under 2⁶³)
  private val dMinHashParams = DocDedup.MinHashParams(numPerms = 32, bands = 16)
  private val dPerms = dMinHashParams.abs.zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  // nDCG@10 discount table, micro-quantized ONCE driver-side and injected
  // into BOTH engines as integer literals: log2 rides libm (the 1-ulp
  // cross-engine hazard), so neither engine ever evaluates it — DCG and
  // the ideal DCG become exact integer sums of rel × disc
  private val dNdcgDisc: Seq[(Int, Long)] = (1 to 10).map(p =>
    p -> math.floor(1e6 / (math.log(p + 1.0) / math.log(2.0)) + 0.5).toLong)
  private val dNdcgIdcg: Long =
    dNdcgDisc.map { case (p, disc) => (11L - p) * disc }.sum
  private val dDiscValues =
    dNdcgDisc.map { case (p, c) => s"($p, $c)" }.mkString(", ")

  // DuckDB twins of Clustering.quantize / prepared / assignOnce: quantized
  // INTEGER micro vectors q, integer-micro centroid tables (c, cq), and
  // one argmax assignment ranking the micro-quantized cosine over exact
  // BIGINT dots (ties to the smallest cluster id) — no step rides an
  // implementation-defined accumulator (the dDotI discipline; the old
  // spelling ranked raw `list_dot_product` doubles, the r10 hazard class)
  private val dKmeansPrep = """v AS (SELECT vec_id,
      list_transform(CAST(embedding AS DOUBLE[]),
        y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS q
    FROM embeddings)"""

  private def dKmeansAssign(centTable: String): String =
    s"""(SELECT vec_id, c FROM (
      SELECT v.vec_id, $centTable.c, row_number() OVER (PARTITION BY v.vec_id
          ORDER BY ${dCosMicroI("q", "cq")} DESC,
          $centTable.c ASC) AS rk
      FROM v CROSS JOIN $centTable) WHERE rk = 1)"""

  // one Lloyd centroid update in DuckDB: exact per-(cluster, dim) integer
  // sums from assignment table `aT`, re-quantized to integer micro-units
  // exactly like Clustering.updateCentroids (floor(sum/count + 0.5))
  private def dKmeansUpdate(aT: String, dim: Int): String =
    s"""(SELECT c, list(CAST(floor(s / n + 0.5) AS BIGINT) ORDER BY d) AS cq
      FROM (SELECT c, d, sum(q[d]) AS s, count(*) AS n
        FROM $aT JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, ${dim + 1})) AS d)
        GROUP BY c, d) GROUP BY c)"""

  // Integer-micro embedding view — the engine-proof cosine discipline
  // (r9 verdict, `ann_recall_eval`): quantize the VECTORS before any dot
  // product, so dots and squared norms are exact integer sums (identical
  // under ANY accumulation order — sequential fold, pairwise, SIMD) and a
  // cosine is sqrt/divide over identical operands, bit-equal on every
  // engine. Quantizing a raw-double cosine AFTER the dot (the r8 fix)
  // still inherits the dot's 1-ulp cross-engine wobble at a .5-micro
  // boundary. Spark twin: [[qEmb]] / VF.microVec.
  private val dEmbMicro = """v AS (SELECT vec_id,
      list_transform(CAST(embedding AS DOUBLE[]),
        y -> floor(y * 1000000.0 + 0.5)) AS e FROM embeddings)"""

  // Exact BIGINT dot over integer-micro vectors, spelled WITHOUT
  // `list_dot_product`: that builtin's accumulation width is
  // implementation-defined across DuckDB builds (the r10 driver's build
  // hash-flipped `ann_recall_eval`/`ann_hamming_recall` while DuckDB
  // 1.0.0 agreed with Spark — consistent with a FLOAT32 overload binding
  // there). BIGINT multiply+sum cannot bind a float path: coords ≤ ~1e6,
  // dim 64 → |dot| ≤ 6.4e13, exact in 64-bit everywhere. Spark twin:
  // VF.dot over VF.microVec (a sequential f64 fold over the same exact
  // integers — also order-free exact, < 2^53).
  private def dDotI(a: String, b: String): String =
    s"""CAST(list_sum(list_transform(range(1, 1 + len($a)),
        i -> CAST($a[i] AS BIGINT) * CAST($b[i] AS BIGINT))) AS BIGINT)"""

  // Micro-quantized cosine from exact integer dots: sqrt / multiply /
  // divide / floor over IDENTICAL integer operands are IEEE
  // correctly-rounded single ops, bit-equal on every engine. Expression
  // order mirrors Similarity.cosExpr + Similarity.micro exactly.
  private def dCosMicroI(a: String, b: String): String =
    s"""floor(${dDotI(a, b)}
                / (sqrt(${dDotI(a, a)}) * sqrt(${dDotI(b, b)}))
                * 1000000 + 0.5)"""

  /** Embeddings with every coordinate quantized to integer micro-units —
    * the input the ANN-family queries score on (see [[dEmbMicro]]). */
  private def qEmb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("embedding", VF.microVec(col("embedding")))

  // DuckDB twin of TextFunctions.qualityScore (shared with the
  // corpus_budget_select oracle)
  private val dQuality = raw"""round(least(length(text) / 500.0, 1.0) * 0.3
      + (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
        / greatest(length(text), 1)) * 0.4
      + (1.0 - len(regexp_extract_all(text, '[!-/:-@\[-`{-~]')) * 1.0
        / greatest(length(text), 1)) * 0.2
      + (1.0 - len(regexp_extract_all(text, '[0-9]')) * 1.0
        / greatest(length(text), 1)) * 0.1, 6)"""

  // generalized DuckDB assign for product quantization: argmax
  // micro-quantized cosine (exact BIGINT dots, the dCosMicroI spelling)
  // of integer subspace table `xT` (vec_id, sq) against integer-micro
  // centroid table `cT` (c, cq)
  private def dPqAssign(xT: String, cT: String): String =
    s"""(SELECT vec_id, c FROM (
      SELECT $xT.vec_id, $cT.c, row_number() OVER (PARTITION BY $xT.vec_id
          ORDER BY ${dCosMicroI("sq", "cq")} DESC,
          $cT.c ASC) AS rk
      FROM $xT CROSS JOIN $cT) WHERE rk = 1)"""

  /** One subspace's k-means CTE chain (seed -> assign -> update ->
    * assign) for the PQ oracle; subspace j covers 1-based dims
    * [j·sub+1, (j+1)·sub] of the quantized INTEGER vector table v.
    * Centroids stay integer-micro through the update, mirroring
    * Clustering.updateCentroids. */
  private def dPqSubspace(j: Int, sub: Int, k: Int): String = {
    val lo = j * sub
    s"""x$j AS (SELECT vec_id, q[${lo + 1}:${lo + sub}] AS sq FROM v),
      c${j}0 AS (SELECT vec_id AS c, sq AS cq FROM x$j WHERE vec_id < $k),
      a${j}1 AS ${dPqAssign(s"x$j", s"c${j}0")},
      s${j}1 AS (SELECT c, d, sum(q[$lo + d]) AS s, count(*) AS n
        FROM a${j}1 JOIN v USING (vec_id)
        CROSS JOIN (SELECT unnest(range(1, ${sub + 1})) AS d) GROUP BY c, d),
      c${j}1 AS (SELECT c, list(CAST(floor(s / n + 0.5) AS BIGINT)
          ORDER BY d) AS cq
        FROM s${j}1 GROUP BY c),
      a${j}2 AS ${dPqAssign(s"x$j", s"c${j}1")}"""
  }

  val entries: Seq[(String, Builder, Option[String])] = Seq(

    // ------------------------------------------------------ text analysis

    ("text_stats",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          TF.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, CAST(len($dToks) AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS len_chars,
        ${dHash60(dNorm)} AS fingerprint
        FROM documents ORDER BY doc_id""")),

    ("text_quality",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          round(TF.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TF.digitRatio(col("text")), 6).as("digit_ratio"),
          round(TF.alphaRatio(col("text")), 6).as("alpha_ratio"),
          round(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        round(len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0
          / greatest(length(text), 1), 6) AS punct_ratio,
        round(len(regexp_extract_all(text, '[0-9]')) * 1.0
          / greatest(length(text), 1), 6) AS digit_ratio,
        round(len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
          / greatest(length(text), 1), 6) AS alpha_ratio,
        round(len(list_filter($dToks, t -> t IN
            ('the','a','an','and','or','of','to','in','is','are','was',
             'it','that','this','for','on','with','as','at','by','be'))) * 1.0
          / greatest(len($dToks), 1), 6) AS stopword_ratio
        FROM documents ORDER BY doc_id""")),

    ("text_readability",
      // lexical richness + Flesch reading ease on vowel-group syllable
      // proxies: integer counts into one float expression, zero shuffles
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          round(TF.typeTokenRatio(col("text")), 6).as("ttr"),
          TF.sentenceCount(col("text")).cast("long").as("sentences"),
          TF.syllableCount(col("text")).cast("long").as("syllables"),
          round(TF.fleschReadingEase(col("text")), 4).as("flesch"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        round(len(list_distinct($dToks)) * 1.0
          / greatest(len($dToks), 1), 6) AS ttr,
        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
          AS sentences,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
          AS syllables,
        round(206.835
          - 1.015 * (CAST(greatest(len($dToks), 1) AS DOUBLE)
            / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
          - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+'))
            / CAST(greatest(len($dToks), 1) AS DOUBLE)), 4) AS flesch
        FROM documents ORDER BY doc_id""")),

    ("text_langid",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TF.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""WITH sc AS (SELECT doc_id,
          len(list_filter($dToks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','für','auf'))) AS s_de,
          len(list_filter($dToks, t -> t IN ('the','and','of','to','is','in','that','it','for','with'))) AS s_en,
          len(list_filter($dToks, t -> t IN ('el','la','los','las','es','en','que','por','con','una'))) AS s_es,
          len(list_filter($dToks, t -> t IN ('le','la','les','est','et','en','que','pour','avec','une'))) AS s_fr
        FROM documents)
        SELECT doc_id, CASE
          WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
          WHEN s_es >= s_fr THEN 'es'
          ELSE 'fr' END AS lang_pred
        FROM sc ORDER BY doc_id""")),

    ("text_tokens_top",
      (s, d) => Tables.documents(s, d)
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(20),
      Some(s"""SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest($dToks) AS tok FROM documents)
        GROUP BY 1 ORDER BY cnt DESC, tok ASC LIMIT 20""")),

    ("text_bpe_quality",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(TF.bpeishTokens(col("text"))).cast("long").as("n_bpe"),
          TF.qualityScore(col("text")).as("quality"),
          round(TF.meanWordLen(col("text")), 6).as("mean_word_len"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
        CAST(len(regexp_extract_all(lower(trim(text)), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe,
        round(least(length(text) / 500.0, 1.0) * 0.3
          + (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0 / greatest(length(text), 1)) * 0.4
          + (1.0 - len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0 / greatest(length(text), 1)) * 0.2
          + (1.0 - len(regexp_extract_all(text, '[0-9]')) * 1.0 / greatest(length(text), 1)) * 0.1, 6) AS quality,
        round(length(replace($dNorm, ' ', '')) * 1.0
          / greatest(len($dToks), 1), 6) AS mean_word_len
        FROM documents ORDER BY doc_id""")),

    // repetition scoring: both signals are per-row array math — one scan,
    // zero shuffles (vs. the explode->groupBy(doc,token)->join shape,
    // which pays two shuffles of every token occurrence in the corpus)
    ("text_repetition",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          round(TF.dupNgramRatio(col("text"), 2), 6).as("dup_bigram_ratio"),
          round(TF.topTokenRatio(col("text")), 6).as("top_token_ratio"))
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents),
        bg AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS b FROM toks),
        dupr AS (SELECT doc_id, CASE WHEN len(b) > 0
            THEN round(1.0 - len(list_distinct(b)) * 1.0 / len(b), 6)
            ELSE 0.0 END AS dup_bigram_ratio FROM bg),
        tf AS (SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(w) AS tok FROM toks) GROUP BY 1, 2),
        top AS (SELECT doc_id, max(c) AS topc FROM tf GROUP BY 1)
        SELECT t.doc_id, dupr.dup_bigram_ratio,
          round(coalesce(top.topc, 0) * 1.0 / greatest(len(t.w), 1), 6)
            AS top_token_ratio
        FROM toks t JOIN dupr ON dupr.doc_id = t.doc_id
        LEFT JOIN top ON top.doc_id = t.doc_id
        ORDER BY t.doc_id""")),

    // Gopher quality rules (Rae et al. 2021): six per-document heuristics
    // plus the conjunction, every one exact per-row integer/division math
    // (no float accumulation anywhere), thresholds calibrated so the
    // corpus splits on wordcount, stopwords, and bigram repetition
    ("text_gopher",
      (s, d) => {
        val t = col("text")
        val n = TF.tokenCount(t)
        val mwl = TF.meanWordLen(t)
        Tables.documents(s, d).select(col("doc_id"),
            n.cast("long").as("n_tokens"),
            (n >= 50 && n <= 100000).cast("int").as("rule_wordcount"),
            (mwl >= 3.0 && mwl <= 10.0).cast("int").as("rule_mean_word_len"),
            (TF.symbolWordRatio(t) <= 0.1).cast("int").as("rule_symbol_ratio"),
            (TF.alphaTokenFraction(t) >= 0.8).cast("int").as("rule_alpha_words"),
            (TF.gopherStopCount(t) >= 2).cast("int").as("rule_stopwords"),
            (TF.dupNgramRatio(t, 2) <= 0.05).cast("int").as("rule_dup_bigrams"))
          .withColumn("pass",
            col("rule_wordcount") * col("rule_mean_word_len") *
              col("rule_symbol_ratio") * col("rule_alpha_words") *
              col("rule_stopwords") * col("rule_dup_bigrams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id, text, $dToks AS w FROM documents),
        g AS (SELECT doc_id, text, w, len(w) AS n,
            length(replace($dNorm, ' ', '')) AS chars,
            len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha,
            len(list_filter(w, x -> x IN
              ('the','be','to','of','and','that','have','with'))) AS stops,
            CASE WHEN len(w) >= 2 THEN list_filter(
                list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
                x -> length(x) > 0) ELSE [] END AS bg
          FROM p),
        r AS (SELECT doc_id, n,
            CAST(n >= 50 AND n <= 100000 AS INT) AS rule_wordcount,
            CAST(chars * 1.0 / greatest(n, 1) >= 3.0
              AND chars * 1.0 / greatest(n, 1) <= 10.0 AS INT)
              AS rule_mean_word_len,
            CAST((len(regexp_extract_all(text, '#'))
                + len(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0
              / greatest(n, 1) <= 0.1 AS INT) AS rule_symbol_ratio,
            CAST(alpha * 1.0 / greatest(n, 1) >= 0.8 AS INT) AS rule_alpha_words,
            CAST(stops >= 2 AS INT) AS rule_stopwords,
            CAST(CASE WHEN len(bg) > 0
                THEN 1.0 - len(list_distinct(bg)) * 1.0 / len(bg)
                ELSE 0.0 END <= 0.05 AS INT) AS rule_dup_bigrams
          FROM g)
        SELECT doc_id, n AS n_tokens, rule_wordcount, rule_mean_word_len,
          rule_symbol_ratio, rule_alpha_words, rule_stopwords,
          rule_dup_bigrams,
          rule_wordcount * rule_mean_word_len * rule_symbol_ratio
            * rule_alpha_words * rule_stopwords * rule_dup_bigrams AS pass
        FROM r ORDER BY doc_id""")),

    // BM25 retrieval against a query term set: tf is computed only for
    // the query terms (filter BEFORE the shuffle — no corpus-wide index),
    // df and corpus stats broadcast back; ln/division shapes mirrored in
    // the oracle so scores agree to well under the rounding step
    ("text_bm25",
      (s, d) => graft.pipeline.Ranking
        .bm25(Tables.documents(s, d), "doc_id", "text",
          Seq("scan", "merge", "filter"))
        .select(col("doc_id"), col("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs, avg(len(w)) AS avg_dl FROM p),
        tf AS (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS term FROM p)
          WHERE term IN ('scan', 'merge', 'filter') GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        dl AS (SELECT doc_id, len(w) AS dl FROM p)
        SELECT tf.doc_id,
          sum(CAST(floor(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1)) /
            (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
            * 1000000 + 0.5) AS BIGINT)) / 1000000.0 AS bm25
        FROM tf JOIN df ON df.term = tf.term
        JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n
        GROUP BY tf.doc_id
        ORDER BY bm25 DESC, tf.doc_id LIMIT 50""")),

    // end-to-end RAG retrieval: sliding-window passages (200 chars every
    // 150) scored by multi-query BM25 — ONE corpus pass for the whole
    // query batch — then top-3 passages per query via the bounded TopK
    // AGGREGATE (map-side partials; no per-query corpus sort). Passage
    // key packs (doc, chunk) into one long with a 1e6 base: chunk_id =
    // chars/150, so the base holds documents up to 150M chars (vs ~150k
    // under the old 1000 base — a long document would have silently
    // aliased pids across documents), and doc_id keeps 9.2e12 of
    // headroom. A defensive filter drops (and thereby surfaces in
    // recall evals) anything beyond the packing range rather than
    // corrupting neighbors' ids.
    ("rag_passage_retrieval",
      (s, d) => {
        val chunks = Packing.chunkDocuments(
            Tables.spread(s, Tables.documents(s, d)),
            "doc_id", "text", size = 200, stride = 150)
          .filter(col("chunk_id") < 1000000)
          .select((col("doc_id") * 1000000L + col("chunk_id")).as("pid"),
            col("chunk"))
        val queryBatch = Seq(
          "q_exec" -> Seq("scan", "filter", "merge"),
          "q_stream" -> Seq("window", "agg", "stream"),
          "q_sales" -> Seq("customer", "order", "join"))
        Ranking.bm25MultiQuery(chunks, "pid", "chunk", queryBatch)
          .groupBy("query_id")
          .agg(graft.functions.TopK.topK(3)(col("bm25"), col("pid")).as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("rk", "x")))
          .select(col("query_id"), (col("rk") + 1).cast("int").as("rank"),
            // integer `div`, not double `/`: float division is exact
            // only below 2^53, which would cap doc_id at ~9e9 instead of
            // the packing's full 9.2e12 headroom (and the oracle's `//`
            // is exact integer division)
            expr("x.id div 1000000").as("doc_id"),
            pmod(col("x.id"), lit(1000000L)).as("chunk_id"),
            round(col("x.score"), 6).as("bm25"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH c AS (SELECT doc_id, cid,
          substring(text, CAST(cid * 150 + 1 AS INT), 200) AS chunk
          FROM (SELECT doc_id, text, unnest(range(0,
            (greatest(length(text) - 200, 0) + 149) // 150 + 1)) AS cid
          FROM documents)),
        p AS (SELECT doc_id * 1000000 + cid AS pid, regexp_split_to_array(
            regexp_replace(lower(trim(chunk)), '\\s+', ' ', 'g'), ' ') AS w
          FROM c WHERE cid < 1000000),
        n AS (SELECT count(*) AS n_docs, avg(len(w)) AS avg_dl FROM p),
        dl AS (SELECT pid, len(w) AS dl FROM p),
        qt(query_id, term) AS (VALUES
          ('q_exec', 'scan'), ('q_exec', 'filter'), ('q_exec', 'merge'),
          ('q_stream', 'window'), ('q_stream', 'agg'), ('q_stream', 'stream'),
          ('q_sales', 'customer'), ('q_sales', 'order'), ('q_sales', 'join')),
        tf AS (SELECT pid, term, count(*) AS tf
          FROM (SELECT pid, unnest(w) AS term FROM p)
          WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT qt.query_id, tf.pid,
            sum(CAST(floor(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) /
              (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
              * 1000000 + 0.5) AS BIGINT)) AS sq
          FROM tf JOIN df USING (term) JOIN qt ON qt.term = tf.term
          JOIN dl ON dl.pid = tf.pid CROSS JOIN n
          GROUP BY 1, 2),
        rk AS (SELECT query_id, pid, sq, CAST(row_number() OVER (
            PARTITION BY query_id ORDER BY sq DESC, pid ASC) AS INT) AS rank
          FROM sc)
        SELECT query_id, rank, pid // 1000000 AS doc_id,
          pid % 1000000 AS chunk_id,
          round(sq / 1000000.0, 6) AS bm25
        FROM rk WHERE rank <= 3 ORDER BY query_id, rank""")),

    // the fusion-gain decision table: recall@10 against the semantic
    // ground truth for lexical-only retrieval vs the RRF-fused list —
    // the number that justifies (or kills) running the hybrid stack.
    // Semantic truth is a proxy (no human labels), measuring what
    // lexical-only retrieval misses semantically; hits are exact
    // integers, recall one division of identical operands
    ("rag_fusion_gain",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val lex20 = Ranking
          .bm25(docs, "doc_id", "text", Seq("scan", "filter", "merge"))
          .select(lit(0L).as("q_id"), col("doc_id"), col("bm25"))
          .groupBy("q_id")
          .agg(graft.functions.TopK.topK(20)(col("bm25"), col("doc_id"))
            .as("tk"))
          .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "x")))
          .select(col("q_id"), col("x.id").as("doc_id"),
            (col("pos") + 1).cast("int").as("rank"))
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(lit(0L).as("q_id"), col("embedding").as("q_vec"))
        val sem20 = Similarity.bruteForceTopK(emb, q, k = 20, microRank = true)
          .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rank"))
        val truth = sem20.filter(col("rank") <= 10)
          .select(col("doc_id"), lit(1).as("__h"))
        def recallOf(name: String, list: DataFrame) =
          list.join(truth, Seq("doc_id"), "left")
            .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
            .select(lit(name).as("method"), col("hits"),
              round(col("hits") / 10.0, 6).as("recall"))
        val fused = Similarity
          .rrfFuse(Seq(lex20, sem20), "q_id", "doc_id", "rank", k = 10)
          .select(col("neighbor_id").as("doc_id"))
        recallOf("fused", fused)
          .unionByName(recallOf("lexical", lex20.filter(col("rank") <= 10)
            .select(col("doc_id"))))
          .orderBy("method")
      },
      Some(s"""WITH $dEmbMicro,
        p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs, avg(len(w)) AS avg_dl FROM p),
        tf AS (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS term FROM p)
          WHERE term IN ('scan', 'filter', 'merge') GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        dl AS (SELECT doc_id, len(w) AS dl FROM p),
        lexsc AS (SELECT tf.doc_id,
            sum(CAST(floor(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) /
              (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
              * 1000000 + 0.5) AS BIGINT)) AS sq
          FROM tf JOIN df ON df.term = tf.term
          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n GROUP BY 1),
        lex AS (SELECT doc_id, rank FROM (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY sq DESC, doc_id ASC) AS INT)
              AS rank FROM lexsc) WHERE rank <= 20),
        qv AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        semsc AS (SELECT v.vec_id AS doc_id,
            ${dCosMicroI("v.e", "qv.qe")} AS qm
          FROM v CROSS JOIN qv WHERE v.vec_id != 0),
        sem AS (SELECT doc_id, rank FROM (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY qm DESC, doc_id ASC) AS INT)
              AS rank FROM semsc) WHERE rank <= 20),
        truth AS (SELECT doc_id FROM sem WHERE rank <= 10),
        contrib AS (
          SELECT doc_id, CAST(floor(1000000.0 / (60 + rank) + 0.5) AS BIGINT)
            AS c FROM lex
          UNION ALL
          SELECT doc_id, CAST(floor(1000000.0 / (60 + rank) + 0.5) AS BIGINT)
            AS c FROM sem),
        fused AS (SELECT doc_id FROM (SELECT doc_id, CAST(row_number() OVER (
            ORDER BY sum(c) DESC, doc_id ASC) AS INT) AS rank
          FROM contrib GROUP BY doc_id) WHERE rank <= 10),
        fh AS (SELECT count(*) AS hits FROM fused JOIN truth USING (doc_id)),
        lh AS (SELECT count(*) AS hits FROM lex JOIN truth USING (doc_id)
          WHERE lex.rank <= 10)
        SELECT method, hits, recall FROM (
          SELECT 'fused' AS method, CAST(hits AS BIGINT) AS hits,
            round(hits / 10.0, 6) AS recall FROM fh
          UNION ALL
          SELECT 'lexical', CAST(hits AS BIGINT), round(hits / 10.0, 6)
          FROM lh) ORDER BY method""")),

    // pseudo-relevance-feedback query expansion (RM3-lite): retrieve a
    // 10-doc feedback set with the base query, pick the 3 new terms that
    // are frequent in the feedback but rare in the corpus (cnt·ln(N/df),
    // micro-quantized, ties by term), re-retrieve with the expanded
    // query. The expansion term set is metadata-sized (the k-means-
    // centroid collect discipline); the oracle re-derives the same terms
    // in SQL and replays the expanded scoring
    ("rag_query_expansion",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val base = Seq("scan", "filter")
        val fbIds = Ranking.bm25(docs, "doc_id", "text", base)
          .select(lit(0L).as("g"), col("doc_id"), col("bm25"))
          .groupBy("g")
          .agg(graft.functions.TopK.topK(10)(col("bm25"), col("doc_id"))
            .as("tk"))
          .select(explode(col("tk")).as("x"))
          .select(col("x.id").as("doc_id"))
        val occ = docs
          .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
        val corpusDf = occ.distinct().groupBy("term")
          .agg(count(lit(1)).as("df"))
        val nDocs = docs.agg(count(lit(1)).as("n_docs"))
        val expTerms = occ.join(fbIds, "doc_id")
          .filter(!col("term").isin(base: _*))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .join(corpusDf, "term").crossJoin(broadcast(nDocs))
          .withColumn("score_q",
            floor(col("cnt") * log(col("n_docs") / col("df"))
              * lit(1e6) + lit(0.5)).cast("long"))
          .orderBy(col("score_q").desc, col("term"))
          .limit(3)
          .collect().map(_.getAs[String]("term")).toSeq
        Ranking.bm25(docs, "doc_id", "text", base ++ expTerms)
          .select(lit(0L).as("g"), col("doc_id"), col("bm25"))
          .groupBy("g")
          .agg(graft.functions.TopK.topK(10)(col("bm25"), col("doc_id"))
            .as("tk"))
          .select(posexplode(col("tk")).as(Seq("pos", "x")))
          .select((col("pos") + 1).cast("int").as("rank"),
            col("x.id").as("doc_id"),
            round(col("x.score"), 6).as("bm25"))
          .orderBy("rank")
      },
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs, avg(len(w)) AS avg_dl FROM p),
        dl AS (SELECT doc_id, len(w) AS dl FROM p),
        occ AS (SELECT doc_id, unnest(w) AS term FROM p),
        tf0 AS (SELECT doc_id, term, count(*) AS tf FROM occ
          WHERE term IN ('scan', 'filter') GROUP BY 1, 2),
        df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
        sc0 AS (SELECT tf0.doc_id,
            sum(CAST(floor(ln((n.n_docs - df0.df + 0.5) / (df0.df + 0.5) + 1.0)
              * (tf0.tf * (1.2 + 1)) /
              (tf0.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
              * 1000000 + 0.5) AS BIGINT)) AS sq
          FROM tf0 JOIN df0 ON df0.term = tf0.term
          JOIN dl ON dl.doc_id = tf0.doc_id CROSS JOIN n GROUP BY 1),
        fb AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (
            ORDER BY sq DESC, doc_id ASC) AS rn FROM sc0) WHERE rn <= 10),
        cdf AS (SELECT term, count(*) AS df
          FROM (SELECT DISTINCT doc_id, term FROM occ) GROUP BY 1),
        exp AS (SELECT term FROM (SELECT occ.term,
            CAST(floor(count(*) * ln(n.n_docs * 1.0 / cdf.df)
              * 1000000 + 0.5) AS BIGINT) AS score_q
          FROM occ JOIN fb ON fb.doc_id = occ.doc_id
          JOIN cdf ON cdf.term = occ.term CROSS JOIN n
          WHERE occ.term NOT IN ('scan', 'filter')
          GROUP BY occ.term, n.n_docs, cdf.df
          ORDER BY score_q DESC, occ.term ASC LIMIT 3)),
        qt AS (SELECT 'scan' AS term UNION ALL SELECT 'filter'
          UNION ALL SELECT term FROM exp),
        tf1 AS (SELECT doc_id, term, count(*) AS tf FROM occ
          WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
        df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY 1),
        sc1 AS (SELECT tf1.doc_id,
            sum(CAST(floor(ln((n.n_docs - df1.df + 0.5) / (df1.df + 0.5) + 1.0)
              * (tf1.tf * (1.2 + 1)) /
              (tf1.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
              * 1000000 + 0.5) AS BIGINT)) AS sq
          FROM tf1 JOIN df1 ON df1.term = tf1.term
          JOIN dl ON dl.doc_id = tf1.doc_id CROSS JOIN n GROUP BY 1)
        SELECT rank, doc_id, round(sq / 1000000.0, 6) AS bm25
        FROM (SELECT doc_id, sq, CAST(row_number() OVER (
            ORDER BY sq DESC, doc_id ASC) AS INT) AS rank FROM sc1)
        WHERE rank <= 10 ORDER BY rank""")),

    // hybrid retrieval: lexical BM25 top-20 and semantic cosine top-20
    // fused by Reciprocal Rank Fusion (1/(60+rank) per list, the SIGIR
    // 2009 calibration-free standard) — contributions micro-quantized
    // before the sum, so the fused ranking is an exact integer sort
    ("rag_rrf_fusion",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val lex = Ranking
          .bm25(docs, "doc_id", "text", Seq("scan", "filter", "merge"))
          .select(lit(0L).as("q_id"), col("doc_id"), col("bm25"))
          .groupBy("q_id")
          .agg(graft.functions.TopK.topK(20)(col("bm25"), col("doc_id"))
            .as("tk"))
          .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "x")))
          .select(col("q_id"), col("x.id").as("doc_id"),
            (col("pos") + 1).cast("int").as("rank"))
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") === 0)
          .select(lit(0L).as("q_id"), col("embedding").as("q_vec"))
        val sem = Similarity.bruteForceTopK(emb, q, k = 20, microRank = true)
          .select(col("q_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Similarity.rrfFuse(Seq(lex, sem), "q_id", "doc_id", "rank", k = 10)
          .select(col("q_id"), col("rank"),
            col("neighbor_id").as("doc_id"), col("rrf"))
          .orderBy("rank")
      },
      Some(s"""WITH $dEmbMicro,
        p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs, avg(len(w)) AS avg_dl FROM p),
        tf AS (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS term FROM p)
          WHERE term IN ('scan', 'filter', 'merge') GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        dl AS (SELECT doc_id, len(w) AS dl FROM p),
        lexsc AS (SELECT tf.doc_id,
            sum(CAST(floor(ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
              * (tf.tf * (1.2 + 1)) /
              (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / n.avg_dl))
              * 1000000 + 0.5) AS BIGINT)) AS sq
          FROM tf JOIN df ON df.term = tf.term
          JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN n GROUP BY 1),
        lex AS (SELECT doc_id, rank FROM (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY sq DESC, doc_id ASC) AS INT)
              AS rank FROM lexsc) WHERE rank <= 20),
        qv AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        semsc AS (SELECT v.vec_id AS doc_id,
            ${dCosMicroI("v.e", "qv.qe")} AS qm
          FROM v CROSS JOIN qv WHERE v.vec_id != 0),
        sem AS (SELECT doc_id, rank FROM (SELECT doc_id,
            CAST(row_number() OVER (ORDER BY qm DESC, doc_id ASC) AS INT)
              AS rank FROM semsc) WHERE rank <= 20),
        contrib AS (
          SELECT doc_id, CAST(floor(1000000.0 / (60 + rank) + 0.5) AS BIGINT)
            AS c FROM lex
          UNION ALL
          SELECT doc_id, CAST(floor(1000000.0 / (60 + rank) + 0.5) AS BIGINT)
            AS c FROM sem),
        fused AS (SELECT doc_id, sum(c) AS sc FROM contrib GROUP BY 1),
        rk AS (SELECT doc_id, sc, CAST(row_number() OVER (
            ORDER BY sc DESC, doc_id ASC) AS INT) AS rank FROM fused)
        SELECT CAST(0 AS BIGINT) AS q_id, rank, doc_id, sc / 1000000.0 AS rrf
        FROM rk WHERE rank <= 10 ORDER BY rank""")),

    // deterministic split assignment: train/val/test as a pure function
    // of the content key hash (10%/5% val/test) — reshuffle/rerun/engine
    // stable, the anti-leakage property; pure scan-level projection
    ("corpus_splits",
      (s, d) => graft.pipeline.Sampling
        .assignSplits(Tables.documents(s, d), "doc_id",
          valPpm = 100000L, testPpm = 50000L)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_id"))
        .orderBy("split"),
      Some(s"""WITH h AS (SELECT doc_id,
          ${dHash60("CAST(doc_id AS VARCHAR)")} % 1000000 AS hh
          FROM documents)
        SELECT CASE WHEN hh < 100000 THEN 'val'
            WHEN hh < 150000 THEN 'test' ELSE 'train' END AS split,
          count(*) AS n, min(doc_id) AS first_id
        FROM h GROUP BY 1 ORDER BY split""")),

    // greedy maximum-coverage selection: 5 picks, each the document with
    // the most not-yet-covered shingles — the submodular diversity-first
    // selection recipe; the oracle replays the identical greedy rounds as
    // chained NOT EXISTS CTEs with scalar-subquery picks
    ("corpus_coverage_select",
      (s, d) => Sampling.coverageSelect(
          Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, k = 5),
      Some {
        def round(r: Int): String = {
          val uncov = if (r == 1) "sh"
            else s"""(SELECT sh.doc_id, sh.s FROM sh
              WHERE NOT EXISTS (SELECT 1 FROM c${r - 1}
                WHERE c${r - 1}.s = sh.s)) u$r"""
          val cov = if (r == 1)
            s"c1 AS (SELECT DISTINCT s FROM sh WHERE doc_id = (SELECT doc_id FROM g1))"
          else
            s"""c$r AS (SELECT s FROM c${r - 1} UNION
              SELECT s FROM sh WHERE doc_id = (SELECT doc_id FROM g$r))"""
          s"""g$r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
            FROM $uncov GROUP BY 1 ORDER BY gain DESC, doc_id ASC LIMIT 1),
          $cov"""
        }
        val cum = (1 to 5).map(i =>
          (1 to i).map(j => s"(SELECT gain FROM g$j)").mkString(" + "))
        s"""WITH $dShingles,
          ${(1 to 5).map(round).mkString(",\n          ")}
          SELECT * FROM (
            ${(1 to 5).map(r => s"""SELECT CAST($r AS INT) AS rank,
              (SELECT doc_id FROM g$r) AS doc_id,
              (SELECT gain FROM g$r) AS gain,
              CAST(${cum(r - 1)} AS BIGINT) AS covered""")
            .mkString("\n            UNION ALL ")})
          ORDER BY rank"""
      }),

    // the one-look corpus dashboard: every first-order health metric a
    // data curator checks before a training run, as (metric, value)
    // rows — sizes, vocabulary, duplication (exact + near at the 0.7
    // Jaccard bar), quality, and stratum counts. Each value is either an
    // exact integer or one division of exact integer operands (quality
    // rides its micro sum), so the whole report replays bit-equal
    ("corpus_health_report",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val toks = docs.select(col("doc_id"),
          explode(TF.tokens(col("text"))).as("t"))
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(TF.normalize(col("text")))).as("n_distinct"),
          sum(floor(TF.qualityScore(col("text")) * lit(1e6) + lit(0.5))
            .cast("long")).as("q_micro"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"))
        val tok = toks.agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("t")).as("n_vocab"))
        val pairs = DocDedup.ngramJaccardPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.7).agg(count(lit(1)).as("n_near"))
        // the metric frame is ONE row but referenced once per report row
        // below — without pinning it, the nine union branches re-run the
        // whole three-aggregate pipeline (incl. the near-dup pair count)
        // nine times
        val m = base.crossJoin(tok).crossJoin(pairs).localCheckpoint()
        def row(name: String, v: org.apache.spark.sql.Column) =
          m.select(lit(name).as("metric"), v.cast("double").as("value"))
        row("docs", col("n_docs"))
          .unionByName(row("exact_dup_docs", col("n_docs") - col("n_distinct")))
          .unionByName(row("langs", col("n_langs")))
          .unionByName(row("mean_doc_tokens",
            round(col("n_tokens") / col("n_docs"), 6)))
          .unionByName(row("mean_quality",
            round(col("q_micro") / col("n_docs") / lit(1e6), 6)))
          .unionByName(row("near_dup_pairs", col("n_near")))
          .unionByName(row("sources", col("n_sources")))
          .unionByName(row("tokens", col("n_tokens")))
          .unionByName(row("vocab", col("n_vocab")))
          .orderBy("metric")
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        nd AS (SELECT count(*) AS n_near FROM pr
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        t AS (SELECT doc_id, $dToks AS w FROM documents),
        tok AS (SELECT (SELECT sum(len(w)) FROM t) AS n_tokens,
          (SELECT count(DISTINCT u.t) FROM t, unnest(w) AS u(t)) AS n_vocab),
        base AS (SELECT count(*) AS n_docs,
          count(DISTINCT md5($dNorm)) AS n_distinct,
          sum(CAST(floor($dQuality * 1000000.0 + 0.5) AS BIGINT)) AS q_micro,
          count(DISTINCT lang) AS n_langs,
          count(DISTINCT source) AS n_sources FROM documents)
        SELECT metric, value FROM (
          SELECT 'docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
          UNION ALL SELECT 'exact_dup_docs',
            CAST(n_docs - n_distinct AS DOUBLE) FROM base
          UNION ALL SELECT 'langs', CAST(n_langs AS DOUBLE) FROM base
          UNION ALL SELECT 'mean_doc_tokens',
            round(tok.n_tokens * 1.0 / base.n_docs, 6)
            FROM base CROSS JOIN tok
          UNION ALL SELECT 'mean_quality',
            round(base.q_micro * 1.0 / base.n_docs / 1000000.0, 6) FROM base
          UNION ALL SELECT 'near_dup_pairs', CAST(n_near AS DOUBLE) FROM nd
          UNION ALL SELECT 'sources', CAST(n_sources AS DOUBLE) FROM base
          UNION ALL SELECT 'tokens', CAST(tok.n_tokens AS DOUBLE) FROM tok
          UNION ALL SELECT 'vocab', CAST(tok.n_vocab AS DOUBLE) FROM tok)
        ORDER BY metric""")),

    // leakage-safe splits: assign near-dup CLUSTERS to train/val/test,
    // not documents — a near-duplicate pair split across train and test
    // is silent evaluation leakage, so every member of a dup cluster
    // must co-travel. Cluster ids come from connected components over
    // the LSH near-dup graph (singletons cluster as themselves); the
    // split is the same exact hash-bucket rule as corpus_splits, keyed
    // on the cluster
    ("split_leakage_safe",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val comp = DocDedup.connectedComponents(
            DocDedup.minHashDedupPairs(docs, "doc_id", "text", n = 3,
              threshold = 0.7, dMinHashParams))
          .select(col("id").as("doc_id"), col("cluster_id"))
        val clustered = docs.select(col("doc_id"))
          .join(comp, Seq("doc_id"), "left")
          .withColumn("cluster_id",
            coalesce(col("cluster_id"), col("doc_id")))
        graft.pipeline.Sampling
          .assignSplits(clustered, "cluster_id", valPpm = 100000L,
            testPpm = 50000L)
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        dup AS (SELECT id1, id2 FROM rawpairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        edges AS (SELECT id1 AS u, id2 AS v FROM dup
          UNION SELECT id2, id1 FROM dup),
        reach(id, root) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY 1),
        withc AS (SELECT d.doc_id,
            coalesce(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN comp c ON c.id = d.doc_id)
        SELECT doc_id, cluster_id,
          CASE WHEN ${dHash60("CAST(cluster_id AS VARCHAR)")} % 1000000
              < 100000 THEN 'val'
            WHEN ${dHash60("CAST(cluster_id AS VARCHAR)")} % 1000000
              < 150000 THEN 'test' ELSE 'train' END AS split
        FROM withc ORDER BY doc_id""")),

    // held-out n-gram coverage: what fraction of each non-train split's
    // distinct shingles the TRAIN split has seen — the generalization /
    // leakage-direction audit run after any split assignment; one
    // shuffle on the shingle, split sets bounded by #splits per shingle
    ("corpus_split_coverage",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        // ONE shingling pass and ONE shuffle: each shingle's split set
        // (bounded by #splits) carries both the membership rows and the
        // train flag — no second corpus read, no shingle self-join
        val bySh = graft.pipeline.Sampling
          .assignSplits(docs, "doc_id", valPpm = 100000L, testPpm = 50000L)
          .select(col("split"),
            explode_outer(array_distinct(TF.shingles(col("text"), 3)))
              .as("sh"))
          .filter(col("sh").isNotNull)
          .groupBy("sh").agg(collect_set(col("split")).as("splits"))
        bySh
          .select(array_contains(col("splits"), "train").as("__t"),
            explode(col("splits")).as("split"))
          .filter(col("split") =!= "train")
          .groupBy("split")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("__t"), 1L).otherwise(0L)).as("covered"))
          .select(col("split"), col("n_shingles"), col("covered"),
            round(col("covered") / col("n_shingles"), 6).as("coverage"))
          .orderBy("split")
      },
      Some(s"""WITH $dShingles,
        spl AS (SELECT doc_id, CASE
            WHEN ${dHash60("CAST(doc_id AS VARCHAR)")} % 1000000 < 100000
              THEN 'val'
            WHEN ${dHash60("CAST(doc_id AS VARCHAR)")} % 1000000 < 150000
              THEN 'test' ELSE 'train' END AS split
          FROM documents),
        ss AS (SELECT DISTINCT spl.split, sh.s
          FROM sh JOIN spl USING (doc_id)),
        tr AS (SELECT s FROM ss WHERE split = 'train')
        SELECT ss.split, CAST(count(*) AS BIGINT) AS n_shingles,
          CAST(sum(CASE WHEN tr.s IS NULL THEN 0 ELSE 1 END) AS BIGINT)
            AS covered,
          round(sum(CASE WHEN tr.s IS NULL THEN 0 ELSE 1 END)
            / count(*), 6) AS coverage
        FROM ss LEFT JOIN tr ON tr.s = ss.s
        WHERE ss.split != 'train'
        GROUP BY 1 ORDER BY split""")),

    // count-min sketch: bounded-memory token frequencies (the frequency
    // sibling of dedup_bloom's membership sketch); estimates from the
    // 3×512 cell table vs the exact counts — all-integer, so the oracle
    // reproduces the cell table and estimates exactly
    ("text_cms_counts",
      (s, d) => {
        import graft.pipeline.DocDedup
        val toks = Tables.documents(s, d)
          .select(explode_outer(TF.tokens(col("text"))).as("tok"))
          .filter(col("tok").isNotNull)
        val cms = DocDedup.cmsBuild(toks, "tok", width = 512, depth = 3)
        val probe = toks.select(col("tok")).distinct()
          .filter(col("tok").isin("the", "data", "merge", "scan", "quality"))
        val exact = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
        DocDedup.cmsEstimate(probe, "tok", cms, 512, 3)
          .join(exact, "tok")
          .select(col("tok"), col("est"), col("true_cnt"))
          .orderBy("tok")
      },
      Some(s"""WITH toks AS (SELECT unnest($dToks) AS tok FROM documents),
        pos AS (SELECT tok, i,
            ${dHash60("tok || '#' || CAST(i AS VARCHAR)")} % 512 AS cell
          FROM toks CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        cms AS (SELECT i AS r, cell, count(*) AS cnt FROM pos GROUP BY 1, 2),
        probe AS (SELECT DISTINCT tok FROM toks
          WHERE tok IN ('the', 'data', 'merge', 'scan', 'quality')),
        est AS (SELECT p.tok, min(coalesce(cms.cnt, 0)) AS est
          FROM (SELECT probe.tok, i,
              ${dHash60("probe.tok || '#' || CAST(i AS VARCHAR)")} % 512 AS cell
            FROM probe CROSS JOIN (SELECT unnest(range(0, 3)) AS i)) p
          LEFT JOIN cms ON cms.r = p.i AND cms.cell = p.cell
          GROUP BY 1),
        exact AS (SELECT tok, count(*) AS true_cnt FROM toks GROUP BY 1)
        SELECT est.tok, est.est, exact.true_cnt
        FROM est JOIN exact USING (tok) ORDER BY tok""")),

    // rebalance to target language proportions (50/30/20 en/de/fr; es
    // and zh dropped): largest feasible output size from the observed
    // counts, exact integer hash membership — the oracle replays the
    // same count/threshold arithmetic and hash test
    ("corpus_rebalance",
      (s, d) => graft.pipeline.Sampling
        .rebalance(Tables.documents(s, d), "lang", "doc_id",
          Map("en" -> 500000L, "de" -> 300000L, "fr" -> 200000L))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id"),
      Some(s"""WITH shares AS (SELECT * FROM (VALUES
            ('en', 500000), ('de', 300000), ('fr', 200000))
            AS t(lang, share_ppm)),
        c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
        cs AS (SELECT c.lang, c.cnt, shares.share_ppm
          FROM c JOIN shares USING (lang)),
        tq AS (SELECT min(cnt * 1000000 // share_ppm) AS t FROM cs)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN cs USING (lang) CROSS JOIN tq
        WHERE (${dHash60("CAST(d.doc_id AS VARCHAR)")} % 1000000) * cs.cnt
          < cs.share_ppm * tq.t
        ORDER BY d.doc_id""")),

    // temperature sampling weights (mT5/XLM-R q ∝ p^α, α = 1/2): the
    // multilingual curriculum dial — low-resource languages up-boosted,
    // high-resource damped. α = 1/2 keeps p^α a single IEEE sqrt (the
    // pow()-ban discipline); √counts quantize to micros before the
    // normalization sum so both engines divide identical integers
    ("corpus_temperature_mix",
      (s, d) => graft.pipeline.Sampling
        .temperatureMix(Tables.documents(s, d), "lang")
        .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, count(*) AS n_docs
          FROM documents GROUP BY 1),
        sq AS (SELECT lang, n_docs,
          CAST(floor(sqrt(n_docs) * 1000000 + 0.5) AS BIGINT) AS s FROM c),
        t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
          CAST(sum(s) AS BIGINT) AS tsq FROM sq)
        SELECT lang, n_docs,
          round(n_docs / tn, 6) AS p_natural,
          round(s / tsq, 6) AS q_temp,
          round((CAST(s AS DOUBLE) * CAST(tn AS DOUBLE))
            / (CAST(tsq AS DOUBLE) * CAST(n_docs AS DOUBLE)), 6) AS boost
        FROM sq CROSS JOIN t ORDER BY lang""")),

    // UniMax budget allocation (Chung et al. 2023): uniform-as-possible
    // budget split across languages, capped at 2 epochs each — the
    // bounded-repetition successor to temperature sampling. The oracle
    // replays the exact integer water-filling (cross-multiplied cap
    // criterion, floor-division even split) over the same strata frame
    ("corpus_unimax_mix",
      (s, d) => Sampling.unimaxMix(Tables.documents(s, d), "lang",
          budget = 900L, capEpochs = 2)
        .orderBy("lang"),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(*) * 2 AS BIGINT) AS capacity FROM documents GROUP BY 1),
        r AS (SELECT lang, n_docs, capacity,
            CAST(row_number() OVER (ORDER BY capacity, lang) AS BIGINT) AS k,
            CAST(count(*) OVER () AS BIGINT) AS nn,
            CAST(coalesce(sum(capacity) OVER (ORDER BY capacity, lang
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cumb
          FROM c),
        f AS (SELECT *, capacity * (nn - k + 1) <= 900 - cumb AS capped
          FROM r),
        g AS (SELECT *,
            CAST(max(CASE WHEN capped THEN k ELSE 0 END) OVER ()
              AS BIGINT) AS kk,
            CAST(sum(CASE WHEN capped THEN capacity ELSE 0 END) OVER ()
              AS BIGINT) AS ss
          FROM f),
        a AS (SELECT *, CAST(CASE WHEN capped THEN capacity
            ELSE (900 - ss) // (nn - kk) END AS BIGINT) AS alloc_docs
          FROM g)
        SELECT lang, n_docs, capacity, capped, alloc_docs,
          ((alloc_docs * 1000000) // n_docs) / 1000000.0 AS epochs
        FROM a ORDER BY lang""")),

    // curriculum staging (easy->hard training order, Bengio et al. 2009
    // framing): quality-quartile each document WITHIN its source (cleanest
    // quartile = stage 1) and report per-(source, stage) counts and
    // quality micro bounds — the export manifest of a curriculum run.
    // The ntile window is PARTITIONED by source (ties broken by doc_id,
    // identical bucket-remainder rule on both engines); ranking rides
    // integer quality micros. At 100 TB a single source's partition can
    // still be large — the percentile-threshold variant (approx quantiles
    // per source, then a stateless filter) is the swap-in when a source
    // outgrows one task's sort; the per-source bucket COUNTS here are
    // what that variant is tuned against
    ("corpus_curriculum",
      (s, d) => {
        val qm = Tables.documents(s, d).select(col("doc_id"), col("source"),
          floor(TF.qualityScore(col("text")) * lit(1e6) + lit(0.5))
            .cast("long").as("qm"))
        qm.withColumn("stage", ntile(4).over(
            Window.partitionBy("source")
              .orderBy(col("qm").desc, col("doc_id").asc)))
          .groupBy("source", "stage")
          .agg(count(lit(1)).as("n_docs"),
            min("qm").as("min_qm"), max("qm").as("max_qm"))
          .orderBy("source", "stage")
      },
      Some(s"""WITH q AS (SELECT doc_id, source,
          CAST(floor($dQuality * 1000000.0 + 0.5) AS BIGINT) AS qm
          FROM documents),
        staged AS (SELECT source, qm, ntile(4) OVER (PARTITION BY source
            ORDER BY qm DESC, doc_id ASC) AS stage FROM q)
        SELECT source, stage, CAST(count(*) AS BIGINT) AS n_docs,
          min(qm) AS min_qm, max(qm) AS max_qm
        FROM staged GROUP BY 1, 2 ORDER BY 1, 2""")),

    // n-gram novelty: the fraction of a document's distinct 3-gram
    // shingles that appear NOWHERE else in the corpus — the standard
    // diversity/redundancy audit beside the dedup family (a corpus of
    // templated text scores near 0, fresh text near 1). One shingle
    // explode + df aggregate; the ratio divides exact integers
    ("text_novelty",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .select(col("doc_id"),
            explode_outer(array_distinct(TF.shingles(col("text"), 3))).as("sx"))
          .filter(col("sx").isNotNull)
        val dfc = sh.groupBy("sx").agg(count(lit(1)).as("sdf"))
        sh.join(dfc, "sx")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            round(sum(when(col("sdf") === 1, 1L).otherwise(0L)) /
              count(lit(1)), 6).as("novelty"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $dShingles,
        dfc AS (SELECT s, count(*) AS sdf FROM sh GROUP BY 1)
        SELECT sh.doc_id, count(*) AS n_shingles,
          round(sum(CASE WHEN dfc.sdf = 1 THEN 1 ELSE 0 END)
            / count(*), 6) AS novelty
        FROM sh JOIN dfc USING (s)
        GROUP BY sh.doc_id ORDER BY sh.doc_id""")),

    // BPE merge candidates: weighted adjacent-char-pair counts over the
    // word-frequency table (the vocab-sized BPE trainer statistic, never
    // a corpus-sized explode); top-20 by count desc, pair asc
    ("text_bpe_pairs",
      (s, d) => graft.pipeline.LanguageModel
        .bpePairCandidates(Tables.documents(s, d), "text", topN = 20)
        .select(col("pair"), col("count").cast("long").as("count")),
      Some(s"""WITH vocab AS (SELECT tok, count(*) AS cnt
          FROM (SELECT unnest($dToks) AS tok FROM documents) GROUP BY 1),
        pairs AS (SELECT cnt, unnest(list_transform(
            range(1, length(tok)),
            i -> substr(tok, i, 1) || ' ' || substr(tok, i + 1, 1))) AS pair
          FROM vocab WHERE length(tok) >= 2)
        SELECT pair, CAST(sum(cnt) AS BIGINT) AS count FROM pairs
        GROUP BY 1 ORDER BY count DESC, pair ASC LIMIT 20""")),

    // iterated BPE merge TRAINING: 3 greedy merge rounds over the
    // vocab-frequency table — each round's argmax pair is applied
    // corpus-wide (double-pass literal replace on the space-padded
    // symbol string) before the next count, exactly what a tokenizer
    // trainer does. The oracle chains the identical rounds as CTEs with
    // scalar-subquery merges
    ("text_bpe_merges",
      (s, d) => graft.pipeline.LanguageModel
        .bpeMergeRounds(Tables.documents(s, d), "text", rounds = 3),
      Some {
        def mergeRound(r: Int): String = {
          val prev = s"v${r - 1}"
          s"""m$r AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS count FROM (
              SELECT cnt, unnest(list_transform(range(1, len(a)),
                i -> a[i] || ' ' || a[i + 1])) AS pair
              FROM (SELECT cnt, string_split(syms, ' ') AS a FROM $prev)
              WHERE len(a) >= 2)
            GROUP BY 1 ORDER BY count DESC, pair ASC LIMIT 1),
          v$r AS (SELECT trim(replace(replace(' ' || syms || ' ',
              ' ' || (SELECT pair FROM m$r) || ' ',
              ' ' || (SELECT replace(pair, ' ', '') FROM m$r) || ' '),
              ' ' || (SELECT pair FROM m$r) || ' ',
              ' ' || (SELECT replace(pair, ' ', '') FROM m$r) || ' '))
              AS syms, cnt FROM v${r - 1})"""
        }
        s"""WITH vocab AS (SELECT tok, count(*) AS cnt
            FROM (SELECT unnest($dToks) AS tok FROM documents)
            WHERE length(tok) >= 1 GROUP BY 1),
          v0 AS (SELECT array_to_string(list_transform(
              range(1, length(tok) + 1), i -> tok[i]), ' ') AS syms, cnt
            FROM vocab),
          ${(1 to 3).map(mergeRound).mkString(",\n          ")}
          SELECT * FROM (
            SELECT CAST(1 AS INT) AS round, pair,
              replace(pair, ' ', '') AS merged, count FROM m1
            UNION ALL SELECT CAST(2 AS INT), pair,
              replace(pair, ' ', ''), count FROM m2
            UNION ALL SELECT CAST(3 AS INT), pair,
              replace(pair, ' ', ''), count FROM m3)
          ORDER BY round"""
      }),

    // per-document keyphrases: top-3 terms (>= 4 chars) by tf-idf — the
    // unsupervised topic tagger; per-document window (high-cardinality
    // key, tiny groups), micro-quantized scores, term-asc ties
    ("text_keyphrases",
      (s, d) => graft.pipeline.Ranking
        .keyphrases(Tables.documents(s, d), "doc_id", "text", topK = 3)
        .select(col("doc_id"), col("rank"), col("term"),
          round(col("score"), 6).as("score"))
        .orderBy("doc_id", "rank"),
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs FROM p),
        tf AS (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS term FROM p)
          WHERE length(term) >= 4 GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.doc_id, tf.term,
            CAST(floor((1.0 + ln(tf.tf)) * ln(n.n_docs / df.df)
              * 1000000.0 + 0.5) AS BIGINT) AS sq
          FROM tf JOIN df USING (term) CROSS JOIN n),
        rk AS (SELECT doc_id, term, sq, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY sq DESC, term ASC) AS INT) AS rank
          FROM sc)
        SELECT doc_id, rank, term, round(sq / 1000000.0, 6) AS score
        FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // classic tf-idf ranking beside BM25: sublinear tf × plain idf with
    // every contribution quantized to integer micro-units BEFORE the
    // per-document sum — scores are exact decimals, so the DESC ordering
    // compares identically in both engines
    ("text_tfidf",
      (s, d) => graft.pipeline.Ranking
        .tfidf(Tables.documents(s, d), "doc_id", "text",
          Seq("scan", "merge", "filter"))
        .select(col("doc_id"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("tfidf").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        n AS (SELECT count(*) AS n_docs FROM p),
        tf AS (SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(w) AS term FROM p)
          WHERE term IN ('scan', 'merge', 'filter') GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
        SELECT tf.doc_id, round(sum(CAST(floor((1.0 + ln(tf.tf))
            * ln(n.n_docs / df.df) * 1000000.0 + 0.5) AS BIGINT))
          / 1000000.0, 6) AS tfidf
        FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
        GROUP BY tf.doc_id
        ORDER BY tfidf DESC, tf.doc_id LIMIT 50""")),

    // self-trained bigram LM scoring (CCNet-style quality filtering):
    // bits-per-bigram under an add-alpha model trained on the corpus in
    // the same job; the oracle replays identical count joins and the
    // same smoothing arithmetic (log2 inputs are rationals of counts,
    // mirrored shape for shape)
    // exposed value is integer MILLI-bits-per-bigram (the text_nb_lang
    // coarsening: per-term micro-bit quantization makes the sum exact;
    // the /1000 coarsening removes the per-term rounding boundary from
    // the contract — round(-avg(raw log2), 6) was the r8 fragility class)
    ("text_lm_score",
      (s, d) => graft.pipeline.LanguageModel
        .bigramLogLoss(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          floor(col("bits_q").cast("double") /
            (col("n_bigrams").cast("double") * lit(1000.0)))
            .cast("long").as("bits_mb"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        ucnt AS (SELECT tok, count(*) AS cw
          FROM (SELECT unnest(w) AS tok FROM p) GROUP BY 1),
        v AS (SELECT count(*) AS v FROM ucnt),
        bcnt AS (SELECT b, count(*) AS cbg FROM occ GROUP BY 1)
        SELECT occ.doc_id, count(*) AS n_bigrams,
          CAST(floor(CAST(-sum(CAST(round(log2((bcnt.cbg + 0.5)
            / (ucnt.cw + 0.5 * v.v)) * 1000000) AS BIGINT)) AS DOUBLE)
            / (count(*) * 1000.0)) AS BIGINT) AS bits_mb
        FROM occ JOIN bcnt USING (b)
        JOIN ucnt ON ucnt.tok = string_split(occ.b, ' ')[1]
        CROSS JOIN v
        GROUP BY occ.doc_id ORDER BY occ.doc_id""")),

    // filter-calibration sweep: precision/recall of the cheap composite
    // quality score against the expensive Gopher-rule conjunction at nine
    // thresholds — the curve a pipeline reads before replacing the slow
    // filter with the fast one; exact integer confusion counts
    ("corpus_quality_calibration",
      (s, d) => {
        import s.implicits._
        val t = col("text")
        val n = TF.tokenCount(t)
        val mwl = TF.meanWordLen(t)
        val docs = Tables.documents(s, d).select(col("doc_id"),
          round(TF.qualityScore(t), 6).as("q"),
          ((n >= 50 && n <= 100000) && (mwl >= 3.0 && mwl <= 10.0) &&
            TF.symbolWordRatio(t) <= 0.1 && TF.alphaTokenFraction(t) >= 0.8 &&
            TF.gopherStopCount(t) >= 2 && TF.dupNgramRatio(t, 2) <= 0.05)
            .as("label"))
        val thresholds = (1 to 9).map(_ / 10.0).toDF("threshold")
        docs.crossJoin(broadcast(thresholds))
          .groupBy("threshold")
          .agg(
            sum(when(col("q") >= col("threshold") && col("label"), 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("q") >= col("threshold") && !col("label"), 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("q") < col("threshold") && col("label"), 1L)
              .otherwise(0L)).as("fn"),
            sum(when(col("q") < col("threshold") && !col("label"), 1L)
              .otherwise(0L)).as("tn"))
          .select(col("threshold"), col("tp"), col("fp"), col("fn"),
            col("tn"),
            when(col("tp") + col("fp") > 0L,
              round(col("tp") / (col("tp") + col("fp")), 6)).as("precision"),
            when(col("tp") + col("fn") > 0L,
              round(col("tp") / (col("tp") + col("fn")), 6)).as("recall"))
          .orderBy("threshold")
      },
      Some(s"""WITH p AS (SELECT doc_id, text, $dToks AS w FROM documents),
        g AS (SELECT doc_id, text, w, len(w) AS n,
            length(replace($dNorm, ' ', '')) AS chars,
            len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha,
            len(list_filter(w, x -> x IN
              ('the','be','to','of','and','that','have','with'))) AS stops,
            CASE WHEN len(w) >= 2 THEN list_filter(
                list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
                x -> length(x) > 0) ELSE [] END AS bg
          FROM p),
        lab AS (SELECT doc_id,
            (n >= 50 AND n <= 100000
              AND chars * 1.0 / greatest(n, 1) >= 3.0
              AND chars * 1.0 / greatest(n, 1) <= 10.0
              AND (len(regexp_extract_all(text, '#'))
                + len(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0
                / greatest(n, 1) <= 0.1
              AND alpha * 1.0 / greatest(n, 1) >= 0.8
              AND stops >= 2
              AND CASE WHEN len(bg) > 0
                THEN 1.0 - len(list_distinct(bg)) * 1.0 / len(bg)
                ELSE 0.0 END <= 0.05) AS label
          FROM g),
        qd AS (SELECT doc_id, $dQuality AS q FROM documents),
        th AS (SELECT unnest(range(1, 10)) / 10.0 AS threshold),
        cm AS (SELECT threshold,
            sum(CASE WHEN q >= threshold AND label THEN 1 ELSE 0 END) AS tp,
            sum(CASE WHEN q >= threshold AND NOT label THEN 1 ELSE 0 END) AS fp,
            sum(CASE WHEN q < threshold AND label THEN 1 ELSE 0 END) AS fn,
            sum(CASE WHEN q < threshold AND NOT label THEN 1 ELSE 0 END) AS tn
          FROM lab JOIN qd USING (doc_id) CROSS JOIN th GROUP BY 1)
        SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
          CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
          CASE WHEN tp + fp > 0 THEN round(tp / (tp + fp), 6) END
            AS precision,
          CASE WHEN tp + fn > 0 THEN round(tp / (tp + fn), 6) END AS recall
        FROM cm ORDER BY threshold""")),

    // encoding/OCR garbage audit: control chars, non-ASCII share, longest
    // consonant run — the decode-sanity filter that runs before any
    // quality model sees a document; all per-row regexp math
    ("text_garbage",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          round(TF.controlCharRatio(col("text")), 6).as("ctrl_ratio"),
          round(TF.nonAsciiRatio(col("text")), 6).as("non_ascii_ratio"),
          TF.maxConsonantRun(col("text")).as("max_consonant_run"),
          (TF.controlCharRatio(col("text")) > 0.001 ||
            TF.maxConsonantRun(col("text")) >= 10).as("garbled"))
        .orderBy("doc_id"),
      Some(raw"""SELECT doc_id,
        round(len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]'))
          * 1.0 / greatest(length(text), 1), 6) AS ctrl_ratio,
        round(len(regexp_extract_all(text, '[^\x00-\x7f]'))
          * 1.0 / greatest(length(text), 1), 6) AS non_ascii_ratio,
        coalesce(list_max(list_transform(regexp_extract_all(lower(text),
          '[bcdfghjklmnpqrstvwxz]+'), x -> length(x))), 0)
          AS max_consonant_run,
        (len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]'))
            * 1.0 / greatest(length(text), 1) > 0.001
          OR coalesce(list_max(list_transform(regexp_extract_all(lower(text),
            '[bcdfghjklmnpqrstvwxz]+'), x -> length(x))), 0) >= 10)
          AS garbled
        FROM documents ORDER BY doc_id""")),

    // cross-source shingle overlap matrix: exact shared distinct word-3-
    // gram counts + Jaccard per source pair — the mix-diversity audit;
    // one shuffle on the shingle, pair expansion bounded by #sources
    ("corpus_source_overlap",
      (s, d) => DocDedup.sourceOverlap(
          Tables.spread(s, Tables.documents(s, d)), "source", "text")
        .orderBy("source1", "source2"),
      Some(s"""WITH $dShingles,
        ss AS (SELECT DISTINCT d.source, sh.s
          FROM sh JOIN documents d USING (doc_id)),
        sizes AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
        pr AS (SELECT a.source AS source1, b.source AS source2,
            count(*) AS shared
          FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source
          GROUP BY 1, 2)
        SELECT source1, source2, n1.n AS n1, n2.n AS n2, shared,
          round(shared / (n1.n + n2.n - shared), 6) AS jaccard
        FROM pr JOIN sizes n1 ON n1.source = source1
        JOIN sizes n2 ON n2.source = source2
        ORDER BY source1, source2""")),

    // interpolated Kneser-Ney bigram scoring — the absolute-discount +
    // continuation-probability upgrade of text_lm_score; the oracle
    // replays the same count tables (types/contexts/continuations) and
    // the identical micro-bit quantized log arithmetic
    ("text_kn_score",
      (s, d) => graft.pipeline.LanguageModel
        .knBigramScore(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("bits_per_bigram"), 6).as("bits_per_bigram"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        sp AS (SELECT b, count(*) AS c12, string_split(b, ' ')[1] AS w1,
            string_split(b, ' ')[2] AS w2
          FROM occ GROUP BY 1),
        ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS n1f
          FROM sp GROUP BY 1),
        cont AS (SELECT w2, count(*) AS n1r FROM sp GROUP BY 1),
        bb AS (SELECT count(*) AS b FROM sp),
        sc AS (SELECT occ.doc_id,
            CAST(round(log2((sp.c12 - 0.75) / ctx.c1
              + (0.75 * ctx.n1f / ctx.c1) * (cont.n1r / bb.b))
              * 1000000) AS BIGINT) AS lq
          FROM occ JOIN sp USING (b) JOIN ctx USING (w1)
          JOIN cont USING (w2) CROSS JOIN bb)
        SELECT doc_id, count(*) AS n_bigrams,
          round(-(CAST(sum(lq) AS DOUBLE) / count(*)) / 1000000.0, 6)
            AS bits_per_bigram
        FROM sc GROUP BY doc_id ORDER BY doc_id""")),

    // DSIR importance weights (hashed token features, target = English
    // stratum): per-bucket log-ratio of target vs raw distributions on a
    // fixed 256-cell table, quantized micro-bits, one per-doc sum — the
    // oracle replays the identical hash buckets and smoothing arithmetic
    ("corpus_dsir_weights",
      (s, d) => graft.pipeline.LanguageModel
        .dsirWeights(Tables.documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en", buckets = 256)
        .select(col("doc_id"), col("n_tokens"),
          round(col("weight"), 6).as("weight"), col("target_like"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id, lang, $dToks AS w FROM documents),
        occ AS (SELECT doc_id, lang = 'en' AS tgt, unnest(w) AS t FROM p),
        bk AS (SELECT doc_id, tgt, ${dHash60("t")} % 256 AS bk FROM occ),
        cnts AS (SELECT bk, count(*) AS cr,
            sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
          FROM bk GROUP BY 1),
        tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM cnts),
        ratio AS (SELECT bk, CAST(round((log2((ct + 0.5) / (nt + 128.0))
            - log2((cr + 0.5) / (nr + 128.0))) * 1000000) AS BIGINT) AS wq
          FROM cnts CROSS JOIN tot)
        SELECT bk.doc_id, count(*) AS n_tokens,
          round(CAST(sum(wq) AS DOUBLE) / 1000000.0, 6) AS weight,
          sum(wq) > 0 AS target_like
        FROM bk JOIN ratio USING (bk)
        GROUP BY bk.doc_id ORDER BY doc_id""")),

    // effective-sample-size audit of quality-weighted sampling, per
    // source: ESS = (Σw)²/Σw² over the integer-ppm quality weights —
    // the sanity dial every importance-weighted pipeline reads before
    // trusting its weights (ESS/n near 1 = weights barely matter, near
    // 1/n = one document dominates). Weight sums are exact integer
    // aggregates (decimal(38,0) / HUGEINT); the ESS is single IEEE ops
    // over identical operands on both engines
    ("corpus_ess_report",
      (s, d) => {
        val w = Tables.spread(s, Tables.documents(s, d))
          .select(col("source"),
            floor(TF.qualityScore(col("text")) * lit(1e6) + lit(0.5))
              .cast("long").as("w"))
        w.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("w").cast("decimal(38,0)")).as("__sw"),
            sum((col("w") * col("w")).cast("decimal(38,0)")).as("__sw2"))
          .select(col("source"), col("n_docs"),
            round((col("__sw").cast("double") * col("__sw").cast("double"))
              / col("__sw2").cast("double"), 6).as("ess"),
            round((col("__sw").cast("double") * col("__sw").cast("double"))
              / col("__sw2").cast("double") / col("n_docs"), 6)
              .as("ess_frac"))
          .orderBy("source")
      },
      Some(s"""WITH w AS (SELECT source,
          CAST(floor($dQuality * 1000000.0 + 0.5) AS BIGINT) AS w
          FROM documents),
        a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            sum(w) AS sw, sum(w * w) AS sw2
          FROM w GROUP BY 1)
        SELECT source, n_docs,
          round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
            / CAST(sw2 AS DOUBLE), 6) AS ess,
          round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
            / CAST(sw2 AS DOUBLE) / n_docs, 6) AS ess_frac
        FROM a ORDER BY source""")),

    // per-source LM drift: mean bits-per-bigram by source — the corpus
    // health dashboard row that catches a source going garbled or
    // boilerplate between builds; per-doc bits micro-quantized so the
    // source mean is one exact integer division
    ("corpus_ppl_by_source",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bits = graft.pipeline.LanguageModel
          .bigramLogLoss(docs, "doc_id", "text")
          // per-doc mean in integer micro-bits: exact sum / count, one
          // deterministic floor-division (no round-of-avg boundary)
          .select(col("doc_id"),
            floor(col("bits_q").cast("double") / col("n_bigrams"))
              .cast("long").as("bq"))
        docs.select(col("doc_id"), col("source")).join(bits, "doc_id")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("bq").as("sbq"))
          .select(col("source"), col("n_docs"),
            round(col("sbq").cast("double") / col("n_docs") / 1e6, 6)
              .as("mean_bits"))
          .orderBy("source")
      },
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        ucnt AS (SELECT tok, count(*) AS cw
          FROM (SELECT unnest(w) AS tok FROM p) GROUP BY 1),
        v AS (SELECT count(*) AS v FROM ucnt),
        bcnt AS (SELECT b, count(*) AS cbg FROM occ GROUP BY 1),
        db AS (SELECT occ.doc_id, CAST(floor(
            CAST(-sum(CAST(round(log2((bcnt.cbg + 0.5)
              / (ucnt.cw + 0.5 * v.v)) * 1000000) AS BIGINT)) AS DOUBLE)
            / count(*)) AS BIGINT) AS bq
          FROM occ JOIN bcnt USING (b)
          JOIN ucnt ON ucnt.tok = string_split(occ.b, ' ')[1]
          CROSS JOIN v GROUP BY occ.doc_id)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
          round(CAST(sum(bq) AS DOUBLE) / count(*) / 1000000.0, 6)
            AS mean_bits
        FROM db JOIN documents d USING (doc_id)
        GROUP BY 1 ORDER BY source""")),

    // perplexity-filter operating curve: per source, the fraction of
    // documents kept at each milli-bits-per-bigram threshold — the table
    // a CCNet-style quality cut is tuned on (pick the knee, not a guess).
    // One LM scoring pass (integer milli-bits, the text_lm_score
    // contract), then a bounded threshold explode with conditional
    // counts; keep rates are single divisions of exact counts
    ("corpus_ppl_keep_curve",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val scores = graft.pipeline.LanguageModel
          .bigramLogLoss(docs, "doc_id", "text")
          .select(col("doc_id"),
            floor(col("bits_q").cast("double") /
              (col("n_bigrams").cast("double") * lit(1000.0)))
              .cast("long").as("bits"))
        val ts = broadcast(Seq(4000L, 6000L, 8000L, 10000L, 12000L)
          .toDF("t_millibits"))
        docs.select(col("doc_id"), col("source")).join(scores, "doc_id")
          .crossJoin(ts)
          .groupBy("source", "t_millibits")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("bits") <= col("t_millibits"), 1L).otherwise(0L))
              .as("n_kept"))
          .select(col("source"), col("t_millibits"), col("n_docs"),
            col("n_kept"),
            round(col("n_kept") / col("n_docs"), 6).as("keep_rate"))
          .orderBy("source", "t_millibits")
      },
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        ucnt AS (SELECT tok, count(*) AS cw
          FROM (SELECT unnest(w) AS tok FROM p) GROUP BY 1),
        v AS (SELECT count(*) AS v FROM ucnt),
        bcnt AS (SELECT b, count(*) AS cbg FROM occ GROUP BY 1),
        sc AS (SELECT occ.doc_id, CAST(floor(
            CAST(-sum(CAST(round(log2((bcnt.cbg + 0.5)
              / (ucnt.cw + 0.5 * v.v)) * 1000000) AS BIGINT)) AS DOUBLE)
            / (count(*) * 1000.0)) AS BIGINT) AS bits
          FROM occ JOIN bcnt USING (b)
          JOIN ucnt ON ucnt.tok = string_split(occ.b, ' ')[1]
          CROSS JOIN v GROUP BY occ.doc_id),
        ts AS (SELECT CAST(unnest([4000, 6000, 8000, 10000, 12000])
          AS BIGINT) AS t_millibits)
        SELECT d.source, ts.t_millibits,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN sc.bits <= ts.t_millibits THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
          round(CAST(sum(CASE WHEN sc.bits <= ts.t_millibits THEN 1
            ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
        FROM documents d JOIN sc USING (doc_id) CROSS JOIN ts
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // CCNet perplexity terciles: rank documents by LM bits within each
    // language and cut head/middle/tail at ceil(n/3)/ceil(2n/3). The
    // Spark side is the two-level coarse-bucket rank (no corpus window);
    // the oracle is the NAIVE per-language row_number — their equality
    // is the operator's correctness claim, like corpus_budget_select
    ("text_ppl_buckets",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // ranking score is integer MILLI-bits (the text_lm_score
        // contract): ranking a round()ed float accumulated through libm
        // was the r8 fragility class, and ties break by doc_id anyway
        val scores = graft.pipeline.LanguageModel
          .bigramLogLoss(docs, "doc_id", "text")
          .select(col("doc_id"),
            floor(col("bits_q").cast("double") /
              (col("n_bigrams").cast("double") * lit(1000.0)))
              .cast("long").as("bits"))
        val scored = docs.select(col("doc_id"), col("lang")).join(scores, "doc_id")
        graft.pipeline.LanguageModel
          .perplexityBuckets(scored, "doc_id", "lang", "bits")
          .select(col("doc_id"), col("lang"), col("bits"), col("bucket"))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        ucnt AS (SELECT tok, count(*) AS cw
          FROM (SELECT unnest(w) AS tok FROM p) GROUP BY 1),
        v AS (SELECT count(*) AS v FROM ucnt),
        bcnt AS (SELECT b, count(*) AS cbg FROM occ GROUP BY 1),
        sc AS (SELECT occ.doc_id, CAST(floor(
            CAST(-sum(CAST(round(log2((bcnt.cbg + 0.5)
              / (ucnt.cw + 0.5 * v.v)) * 1000000) AS BIGINT)) AS DOUBLE)
            / (count(*) * 1000.0)) AS BIGINT) AS bits
          FROM occ JOIN bcnt USING (b)
          JOIN ucnt ON ucnt.tok = string_split(occ.b, ' ')[1]
          CROSS JOIN v GROUP BY occ.doc_id),
        r AS (SELECT d.doc_id, d.lang, sc.bits,
            row_number() OVER (PARTITION BY d.lang
              ORDER BY sc.bits, d.doc_id) AS rk,
            count(*) OVER (PARTITION BY d.lang) AS n
          FROM documents d JOIN sc ON sc.doc_id = d.doc_id)
        SELECT doc_id, lang, bits,
          CASE WHEN rk <= (n + 2) // 3 THEN 'head'
            WHEN rk <= (2 * n + 2) // 3 THEN 'middle'
            ELSE 'tail' END AS bucket
        FROM r ORDER BY doc_id""")),

    // token-budget corpus selection: fill the training budget best-first.
    // The Spark side is the two-level bucketed selection (no global
    // sort); the oracle is the NAIVE quality-ordered running sum — their
    // equality is exactly the operator's correctness claim
    ("corpus_budget_select",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          TF.qualityScore(col("text")).as("q"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.pipeline.Sampling
          .budgetSelect(docs, "doc_id", "q", "n_tokens", budgetTokens = 10000L)
          .select(col("doc_id"), col("q"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH p AS (SELECT doc_id, text, $dToks AS w FROM documents),
        q AS (SELECT doc_id,
            round(least(length(text) / 500.0, 1.0) * 0.3
              + (len(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                / greatest(length(text), 1)) * 0.4
              + (1.0 - len(regexp_extract_all(text, '[!-/:-@\\[-`{-~]')) * 1.0
                / greatest(length(text), 1)) * 0.2
              + (1.0 - len(regexp_extract_all(text, '[0-9]')) * 1.0
                / greatest(length(text), 1)) * 0.1, 6) AS q,
            CAST(len(w) AS BIGINT) AS n_tokens FROM p),
        o AS (SELECT doc_id, q, n_tokens,
            sum(n_tokens) OVER (ORDER BY q DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM q)
        SELECT doc_id, q, n_tokens FROM o WHERE cum <= 10000
        ORDER BY doc_id""")),

    // the whole corpus-build pipeline in ONE Spark plan: exact dedup ->
    // quality gate -> token-budget selection -> per-language report.
    // Each stage keeps its documented scale shape (hash semi-join, per-row
    // codegen math, the two-level boundary-bucket window); the oracle
    // replays the identical chain naively
    ("pipeline_end_to_end",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val deduped = DocDedup.exactDedup(docs, "doc_id", "text")
        val scored = deduped.select(col("doc_id"), col("lang"),
            round(TF.qualityScore(col("text")), 6).as("q"),
            TF.tokenCount(col("text")).cast("long").as("n_tokens"))
          .filter(col("q") >= 0.5)
        graft.pipeline.Sampling
          .budgetSelect(scored, "doc_id", "q", "n_tokens",
            budgetTokens = 5000L)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH p AS (SELECT doc_id, lang, text, $dToks AS w
          FROM documents),
        keep AS (SELECT min(doc_id) AS k FROM p GROUP BY md5($dNorm)),
        dd AS (SELECT p.doc_id, p.lang, p.text, p.w
          FROM p JOIN keep ON keep.k = p.doc_id),
        q AS (SELECT doc_id, lang, $dQuality AS q,
            CAST(len(w) AS BIGINT) AS n_tokens FROM dd),
        f AS (SELECT * FROM q WHERE q >= 0.5),
        o AS (SELECT doc_id, lang, n_tokens,
            sum(n_tokens) OVER (ORDER BY q DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM f)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM o WHERE cum <= 5000 GROUP BY lang ORDER BY lang""")),

    // character-distribution entropy: per-row sorted-array run math on the
    // Spark side (zero shuffles); the oracle recomputes it with DuckDB's
    // entropy() aggregate over exploded chars — mathematically identical,
    // different float accumulation order, hence the rounding
    // character entropy in integer MILLI-bits (charEntropyMb): the
    // previous h_chars contract (round(float entropy, 6) vs DuckDB's
    // entropy() built-in) compared a float accumulated in two different
    // orders through two different libm log2s — the exact
    // engine-version fragility the r8 verdict had text_nb_lang fail on
    ("text_entropy",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TF.charEntropyMb(col("text")).as("h_mb"))
        .orderBy("doc_id"),
      Some("""SELECT d.doc_id, coalesce(e.h_mb, 0) AS h_mb
        FROM documents d LEFT JOIN (
          SELECT doc_id, CAST(floor(
              (sum(cnt) * CAST(round(log2(sum(cnt)) * 1000000) AS BIGINT)
               - sum(cnt * CAST(round(log2(cnt) * 1000000) AS BIGINT)))
              / (sum(cnt) * 1000.0)) AS BIGINT) AS h_mb
          FROM (SELECT doc_id, c, count(*) AS cnt
                FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                      FROM documents) GROUP BY doc_id, c)
          GROUP BY doc_id) e
          ON e.doc_id = d.doc_id
        ORDER BY d.doc_id""")),

    // PII detection/redaction: four RE2-compatible patterns shared
    // verbatim with the oracle; the corpus is constructed deterministically
    // from the customer table so every pattern actually fires (documents
    // contain no natural PII); counts + a fingerprint of the redacted text
    // pin both detection and replacement semantics
    ("text_pii",
      (s, d) => {
        val text = concat(
          lit("reach "), col("c_name"), lit(" at"),
          when(pmod(col("c_custkey"), lit(3)) === 0, lit(" the office"))
            .otherwise(concat(lit(" user"), col("c_custkey").cast("string"),
              lit("@mail"), pmod(col("c_custkey"), lit(5)).cast("string"),
              lit(".example.com"))),
          lit(" or host 10."), pmod(col("c_custkey"), lit(200)).cast("string"),
          lit("."), pmod(col("c_custkey"), lit(250)).cast("string"),
          lit(".7, tel 555-"),
          lpad(pmod(col("c_custkey"), lit(1000)).cast("string"), 3, "0"),
          lit("-"),
          lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
          when(pmod(col("c_custkey"), lit(4)) === 0,
            concat(lit(" ssn "),
              lpad(pmod(col("c_custkey"), lit(900)).cast("string"), 3, "0"),
              lit("-"),
              lpad(pmod(col("c_custkey"), lit(90)).cast("string"), 2, "0"),
              lit("-"),
              lpad(pmod(col("c_custkey"), lit(9000)).cast("string"), 4, "0")))
            .otherwise(lit("")))
        Tables.spread(s, Tables.load(s, d, "customer"))
          .select(col("c_custkey").as("id"), text.as("t"))
          .select(col("id"),
            TF.emailCount(col("t")).cast("long").as("n_email"),
            TF.ipv4Count(col("t")).cast("long").as("n_ip"),
            TF.ssnCount(col("t")).cast("long").as("n_ssn"),
            TF.phoneCount(col("t")).cast("long").as("n_phone"),
            TF.hash60(TF.redactPii(col("t"))).as("redacted_fp"))
          .orderBy("id")
      },
      Some(s"""WITH built AS (SELECT c_custkey AS id,
          'reach ' || c_name || ' at' ||
          CASE WHEN c_custkey % 3 = 0 THEN ' the office'
               ELSE ' user' || c_custkey || '@mail' || (c_custkey % 5)
                 || '.example.com' END ||
          ' or host 10.' || (c_custkey % 200) || '.' || (c_custkey % 250) ||
          '.7, tel 555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
          || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
          CASE WHEN c_custkey % 4 = 0 THEN ' ssn '
              || lpad(CAST(c_custkey % 900 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(c_custkey % 90 AS VARCHAR), 2, '0') || '-'
              || lpad(CAST(c_custkey % 9000 AS VARCHAR), 4, '0')
            ELSE '' END AS t
        FROM customer)
        SELECT id,
          CAST(len(regexp_extract_all(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(t,
            '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS BIGINT) AS n_ip,
          CAST(len(regexp_extract_all(t,
            '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS BIGINT) AS n_ssn,
          CAST(len(regexp_extract_all(t,
            '\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b')) AS BIGINT) AS n_phone,
          ${dHash60("""regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
            '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g')""")} AS redacted_fp
        FROM built ORDER BY id""")),

    // corpus-level boilerplate stripping (CCNet-style): 3-token segments
    // appearing in >= 4 distinct documents are template noise; remove them
    // and reassemble each document in segment order. Spark side is one
    // explode + broadcast anti-join + one groupBy; the oracle recomputes
    // the same segmentation with DuckDB list lambdas
    ("text_boilerplate",
      (s, d) => DocDedup.stripCommonSegments(
          Tables.documents(s, d), "doc_id", "text", n = 3, minDocs = 4)
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents),
        d AS (SELECT doc_id, list_filter(list_transform(
            range(0, greatest((len(w)-1)//3, 0)+1),
            i -> array_to_string(w[i*3+1:i*3+3], ' ')), s -> len(s) > 0) AS segs
          FROM toks),
        common AS (SELECT seg FROM
            (SELECT doc_id, unnest(list_distinct(segs)) AS seg FROM d)
          GROUP BY seg HAVING count(*) >= 4),
        es AS (SELECT doc_id, unnest(segs) AS seg,
            unnest(range(1, len(segs)+1)) AS pos FROM d),
        kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
            string_agg(seg, ' ' ORDER BY pos) AS cleaned
          FROM es WHERE seg NOT IN (SELECT seg FROM common) GROUP BY doc_id)
        SELECT d.doc_id, CAST(len(segs) AS BIGINT) AS n_segs,
          CAST(len(segs) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
          coalesce(cleaned, '') AS cleaned
        FROM d LEFT JOIN kept USING (doc_id) ORDER BY doc_id""")),

    // corpus snapshot diff: v2 is derived deterministically from v1
    // (every 10th doc removed, every 17th rewritten, ids 10000+ added);
    // the diff compares fingerprints only — 16 bytes/row through the
    // full outer join, never the text
    ("corpus_diff",
      (s, d) => {
        import graft.pipeline.DocDedup
        val v1 = Tables.documents(s, d)
        val v2 = v1.filter(col("doc_id") % 10 =!= 0)
          .withColumn("text", when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" updated"))).otherwise(col("text")))
          .unionByName(v1.filter(col("doc_id") < 5)
            .withColumn("doc_id", col("doc_id") + 10000L))
        DocDedup.corpusDiff(v1, v2, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(s"""WITH v1 AS (SELECT doc_id, md5($dNorm) AS fp FROM documents),
        v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 17 = 0
              THEN regexp_replace(lower(trim(text || ' updated')),
                '\\s+', ' ', 'g')
              ELSE $dNorm END) AS fp
            FROM documents WHERE doc_id % 10 != 0
          UNION ALL
          SELECT doc_id + 10000, md5($dNorm) FROM documents WHERE doc_id < 5)
        SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
          CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.fp = v2.fp THEN 'unchanged'
            ELSE 'changed' END AS status
        FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        ORDER BY doc_id""")),

    ("corpus_overlap_hll",
      // cross-source shingle-set overlap from HLL sketches alone: union
      // registers merge by per-bucket max, intersection by inclusion-
      // exclusion — corpus scanned once, every downstream frame is
      // register-table metadata (sources × 2^p rows)
      (s, d) => {
        import graft.pipeline.DocDedup
        val docs = Tables.spread(s, Tables.documents(s, d))
        val sh = docs.select(col("source"),
          explode(TF.shingles(col("text"), 3)).as("sgm"))
        // register table is sources × 2^p rows — metadata-sized; pin it
        // once (r15, measured): its two consumers (per-source estimate,
        // pairwise union) prune differently, so without the checkpoint
        // the full shingle→hash→register corpus pass ran TWICE.
        // localCheckpoint executor-loss trade-off: see the
        // DocDedup.ngramJaccardPairs note (r16)
        val regs = DocDedup.hllRegisters(sh, "sgm", Seq("source"), p = 12)
          .localCheckpoint()
        val perSrc = DocDedup.hllEstimate(regs, Seq("source"), p = 12)
        val srcs = docs.select("source").distinct()
        val pairs = srcs.as("a").crossJoin(srcs.as("b"))
          .filter(col("a.source") < col("b.source"))
          .select(col("a.source").as("sa"), col("b.source").as("sb"))
        val unionRegs = regs
          .join(broadcast(pairs),
            regs("source") === col("sa") || regs("source") === col("sb"))
          .groupBy("sa", "sb", "bucket").agg(max("reg").as("reg"))
        DocDedup.hllEstimate(unionRegs, Seq("sa", "sb"), p = 12)
          .withColumnRenamed("est", "est_union")
          .join(perSrc.select(col("source").as("sa"), col("est").as("ea")), "sa")
          .join(perSrc.select(col("source").as("sb"), col("est").as("eb")), "sb")
          .select(col("sa"), col("sb"), round(col("ea"), 2).as("est_a"),
            round(col("eb"), 2).as("est_b"),
            round(col("est_union"), 2).as("est_union"),
            round(col("ea") + col("eb") - col("est_union"), 2).as("est_inter"))
          .orderBy("sa", "sb")
      },
      Some(s"""WITH toks AS (SELECT source, $dToks AS w FROM documents),
        sh AS (SELECT source, unnest(list_distinct(list_transform(
            range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])))
            AS sgm
          FROM toks WHERE len(w) >= 3),
        h AS (SELECT source, ${dHash60("sgm")} AS h FROM sh),
        r AS (SELECT source, h & 4095 AS bucket,
            max(CASE WHEN h >> 12 = 0 THEN 49
              ELSE 49 - length(bin(h >> 12)) END) AS reg
          FROM h GROUP BY 1, 2),
        s1 AS (SELECT source, sum(CAST(1 AS BIGINT) << (50 - reg))
            + (4096 - count(*)) * (CAST(1 AS BIGINT) << 50) AS S
          FROM r GROUP BY 1),
        e1 AS (SELECT source, 0.7213 / (1.0 + 1.079 / 4096.0) * pow(2.0, 74.0)
            / CAST(S AS DOUBLE) AS est FROM s1),
        srcs AS (SELECT DISTINCT source FROM documents),
        p AS (SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
        u AS (SELECT sa, sb, bucket, max(reg) AS reg
          FROM r JOIN p ON r.source = sa OR r.source = sb GROUP BY 1, 2, 3),
        su AS (SELECT sa, sb, sum(CAST(1 AS BIGINT) << (50 - reg))
            + (4096 - count(*)) * (CAST(1 AS BIGINT) << 50) AS S
          FROM u GROUP BY 1, 2),
        eu AS (SELECT sa, sb, 0.7213 / (1.0 + 1.079 / 4096.0) * pow(2.0, 74.0)
            / CAST(S AS DOUBLE) AS est FROM su)
        SELECT sa, sb, round(ea.est, 2) AS est_a, round(eb.est, 2) AS est_b,
          round(eu.est, 2) AS est_union,
          round(ea.est + eb.est - eu.est, 2) AS est_inter
        FROM eu JOIN e1 ea ON ea.source = sa JOIN e1 eb ON eb.source = sb
        ORDER BY sa, sb""")),

    ("text_blocklist",
      // safety/policy filter: one RE2 alternation pass counts blocklist
      // phrase hits per document; the flag is the filter verdict
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TF.blocklistCount(col("text"),
            Seq("click here", "buy now", "subscribe", "free", "winner"))
            .cast("long").as("hits"))
        .withColumn("flagged", col("hits") >= 2)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(len(regexp_extract_all(lower(text),
          'click here|buy now|subscribe|free|winner')) AS BIGINT) AS hits,
        len(regexp_extract_all(lower(text),
          'click here|buy now|subscribe|free|winner')) >= 2 AS flagged
        FROM documents ORDER BY doc_id""")),

    ("text_dedup_sentences",
      // intra-document repeated-passage cleanup at sentence grain: keep
      // each sentence's first occurrence in order, reassemble in place
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), "\\.\\s+")).cast("long").as("n_sentences"),
          size(array_distinct(split(col("text"), "\\.\\s+"))).cast("long")
            .as("n_kept"),
          TF.dedupSentences(col("text")).as("text_clean"))
        .orderBy("doc_id"),
      Some("""WITH s AS (SELECT doc_id,
            regexp_split_to_array(text, '\.\s+') AS arr FROM documents),
        k AS (SELECT doc_id, arr,
            list_filter(arr, (x, i) -> list_position(arr, x) = i) AS kept
          FROM s)
        SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_sentences,
          CAST(len(kept) AS BIGINT) AS n_kept,
          array_to_string(kept, '. ') AS text_clean
        FROM k ORDER BY doc_id""")),

    // cross-document duplicate-line ratio (the RefinedWeb per-doc dup
    // metric): fraction of a doc's distinct sentences that appear in at
    // least one other document — one sentence explode into a df table
    // joined back, all-integer per-doc counts
    ("text_dup_lines",
      (s, d) => {
        val sents = Tables.spread(s, Tables.documents(s, d))
          .select(col("doc_id"),
            explode_outer(array_distinct(split(col("text"), "\\.\\s+")))
              .as("sent"))
          .filter(col("sent").isNotNull && length(col("sent")) > 0)
        val dfT = sents.groupBy("sent").agg(count(lit(1)).as("df"))
        sents.join(dfT, "sent")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_sentences"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
          .select(col("doc_id"), col("n_sentences"), col("n_dup"),
            round(col("n_dup") / col("n_sentences"), 6).as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH s AS (SELECT doc_id, unnest(list_distinct(
            regexp_split_to_array(text, '\.\s+'))) AS sent FROM documents),
        f AS (SELECT doc_id, sent FROM s WHERE length(sent) > 0),
        d AS (SELECT sent, count(*) AS df FROM f GROUP BY 1)
        SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_sentences,
          CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
          round(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
            AS dup_ratio
        FROM f JOIN d USING (sent) GROUP BY 1 ORDER BY doc_id""")),

    ("text_fertility",
      // tokenizer fertility: bytes per BPE-ish token by language — the
      // multilingual tokenizer-budget audit; integer byte/token sums,
      // one exact division
      (s, d) => Tables.documents(s, d)
        .groupBy("lang")
        .agg(sum(octet_length(col("text"))).cast("long").as("bytes"),
          sum(size(TF.bpeishTokens(col("text")))).cast("long")
            .as("bpe_tokens"))
        .withColumn("bytes_per_token",
          round(col("bytes").cast("double") / col("bpe_tokens"), 6))
        .orderBy("lang"),
      // NB: non-interpolated string — single backslash reaches DuckDB
      Some("""SELECT lang, CAST(sum(strlen(text)) AS BIGINT) AS bytes,
        CAST(sum(len(regexp_extract_all(lower(trim(text)),
          '[a-z0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS bpe_tokens,
        round(CAST(sum(strlen(text)) AS DOUBLE)
          / sum(len(regexp_extract_all(lower(trim(text)),
            '[a-z0-9]+|[^a-z0-9\s]'))), 6) AS bytes_per_token
        FROM documents GROUP BY 1 ORDER BY 1""")),

    ("text_length_percentiles",
      // per-source length profile: exact nearest-rank p50/p90 via the
      // engine's InfluxQL percentile operator (rank = floor(p·n + 0.5));
      // ties on the value are harmless — the SELECTED value is identical
      // whichever tied row wins the rank
      (s, d) => {
        import graft.functions.{InfluxAggregates => IA}
        val lens = Tables.documents(s, d).select(col("source"), col("n_chars"))
        IA.percentile(lens, Seq("source"), "n_chars", 50, "p50")
          .join(IA.percentile(lens, Seq("source"), "n_chars", 90, "p90"),
            "source")
          .orderBy("source")
      },
      Some("""WITH r AS (SELECT source, n_chars,
            row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
            count(*) OVER (PARTITION BY source) AS n
          FROM documents)
        SELECT r50.source, r50.n_chars AS p50, r90.n_chars AS p90
        FROM (SELECT source, n_chars FROM r
            WHERE rk = floor(0.5 * n + 0.5)) r50
          JOIN (SELECT source, n_chars FROM r
            WHERE rk = floor(0.9 * n + 0.5)) r90
          ON r50.source = r90.source
        ORDER BY r50.source""")),

    ("corpus_js_divergence",
      // vocabulary-drift audit: JSD (bits) between each source's unigram
      // mix and the rest of the corpus; per-term contributions quantize
      // to integer nano-bits before the sum, so both engines add the
      // same integers
      (s, d) => graft.pipeline.LanguageModel.jsDivergence(
          Tables.spread(s, Tables.documents(s, d)), "source", "text")
        .select(col("source"), round(col("js_bits"), 6).as("js_bits"))
        .orderBy("source"),
      Some(s"""WITH tok AS (SELECT source AS s,
            unnest(list_filter($dToks, x -> x != '')) AS t FROM documents),
        sc AS (SELECT s, t, count(*) AS c FROM tok GROUP BY 1, 2),
        gc AS (SELECT t, sum(c) AS g FROM sc GROUP BY 1),
        st AS (SELECT s, sum(c) AS ns FROM sc GROUP BY 1),
        tot AS (SELECT sum(ns) AS N FROM st),
        f0 AS (SELECT st.s, gc.t, gc.g, st.ns, coalesce(sc.c, 0) AS cp, N
          FROM gc CROSS JOIN st
          LEFT JOIN sc ON sc.s = st.s AND sc.t = gc.t CROSS JOIN tot),
        e AS (SELECT s, cp, g - cp AS cq,
            CAST(cp AS DOUBLE) / ns AS p,
            CAST(g - cp AS DOUBLE) / (N - ns) AS q
          FROM f0),
        m0 AS (SELECT s, cp, cq, p, q, (p + q) / 2.0 AS m FROM e),
        b AS (SELECT s,
            CASE WHEN cp > 0 THEN CAST(floor(p * log2(p / m)
              * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS bp,
            CASE WHEN cq > 0 THEN CAST(floor(q * log2(q / m)
              * 1000000000.0 + 0.5) AS BIGINT) ELSE 0 END AS bq
          FROM m0)
        SELECT s AS source, round(CAST(sum(bp) + sum(bq) AS DOUBLE)
            / 2000000000.0, 6) AS js_bits
        FROM b GROUP BY 1 ORDER BY 1""")),

    ("corpus_ngram_precision",
      // BLEU-style clipped 1/2-gram precision of src0 docs against the
      // rest of the corpus: the coverage/contamination eval between two
      // corpus builds; bleu2 = sqrt(p1*p2), no brevity penalty
      (s, d) => {
        import graft.pipeline.Ranking
        val docs = Tables.spread(s, Tables.documents(s, d))
        val cand = docs.filter(col("source") === "src0")
        val ref = docs.filter(col("source") =!= "src0")
        val p1 = Ranking.ngramPrecision(cand, ref, "doc_id", "text", 1)
          .select(col("doc_id"), col("precision").as("p1"))
        val p2 = Ranking.ngramPrecision(cand, ref, "doc_id", "text", 2)
          .select(col("doc_id"), col("precision").as("p2"))
        cand.select("doc_id").join(p1, Seq("doc_id"), "left")
          .join(p2, Seq("doc_id"), "left")
          .select(col("doc_id"), round(col("p1"), 6).as("p1"),
            round(col("p2"), 6).as("p2"),
            round(sqrt(col("p1") * col("p2")), 6).as("bleu2"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
            list_filter($dToks, t -> t != '') AS w FROM documents),
        cu AS (SELECT doc_id, unnest(w) AS g FROM toks WHERE source = 'src0'),
        cuc AS (SELECT doc_id, g, count(*) AS c FROM cu GROUP BY 1, 2),
        ru AS (SELECT unnest(w) AS g FROM toks WHERE source != 'src0'),
        ruc AS (SELECT g, count(*) AS rc FROM ru GROUP BY 1),
        pr1 AS (SELECT doc_id, sum(least(c, coalesce(rc, 0))) AS cl,
            sum(c) AS tot
          FROM cuc LEFT JOIN ruc USING (g) GROUP BY 1),
        cb AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
          FROM toks WHERE source = 'src0' AND len(w) >= 2),
        cbc AS (SELECT doc_id, g, count(*) AS c FROM cb GROUP BY 1, 2),
        rb AS (SELECT unnest(list_transform(range(1, len(w)),
            i -> w[i] || ' ' || w[i+1])) AS g
          FROM toks WHERE source != 'src0' AND len(w) >= 2),
        rbc AS (SELECT g, count(*) AS rc FROM rb GROUP BY 1),
        pr2 AS (SELECT doc_id, sum(least(c, coalesce(rc, 0))) AS cl,
            sum(c) AS tot
          FROM cbc LEFT JOIN rbc USING (g) GROUP BY 1)
        SELECT d.doc_id, round(pr1.cl * 1.0 / pr1.tot, 6) AS p1,
          round(pr2.cl * 1.0 / pr2.tot, 6) AS p2,
          round(sqrt((pr1.cl * 1.0 / pr1.tot) * (pr2.cl * 1.0 / pr2.tot)), 6)
            AS bleu2
        FROM documents d LEFT JOIN pr1 ON pr1.doc_id = d.doc_id
          LEFT JOIN pr2 ON pr2.doc_id = d.doc_id
        WHERE d.source = 'src0' ORDER BY d.doc_id""")),

    // decontamination by excision: benchmark-verbatim 3-token segments
    // are cut out and the clean remainder reassembled (flagging's
    // salvage-the-rest complement); benchmark = every 13th doc, like
    // the flagging query's spec fixture
    ("decontaminate_excise",
      (s, d) => {
        val docs = Tables.documents(s, d)
        DocDedup.exciseBenchmarkSegments(docs,
            docs.filter(col("doc_id") % 13 === 0), "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents),
        d AS (SELECT doc_id, list_filter(list_transform(
            range(0, greatest((len(w)-1)//3, 0)+1),
            i -> array_to_string(w[i*3+1:i*3+3], ' ')), s -> len(s) > 0) AS segs
          FROM toks),
        bad AS (SELECT DISTINCT unnest(list_distinct(segs)) AS seg
          FROM d WHERE doc_id % 13 = 0),
        es AS (SELECT doc_id, unnest(segs) AS seg,
            unnest(range(1, len(segs)+1)) AS pos FROM d),
        kept AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
            string_agg(seg, ' ' ORDER BY pos) AS cleaned
          FROM es WHERE seg NOT IN (SELECT seg FROM bad) GROUP BY doc_id)
        SELECT d.doc_id, CAST(len(segs) AS BIGINT) AS n_segs,
          CAST(len(segs) - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
          coalesce(cleaned, '') AS cleaned
        FROM d LEFT JOIN kept USING (doc_id) ORDER BY doc_id""")),

    // ------------------------------------------------------- dedup family

    ("dedup_exact",
      (s, d) => DocDedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("text_hash"),
      Some(s"""SELECT md5($dNorm) AS text_hash,
        min(doc_id) AS keeper_id, CAST(count(*) AS BIGINT) AS dup_count
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // near-dup pipelines are CPU-dense per row: rebalance the corpus
    // across cores first (see Tables.spread — no-op at real scale)
    ("dedup_minhash_lsh",
      (s, d) => DocDedup.minHashDedupPairs(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, threshold = 0.7,
          DocDedup.MinHashParams(numPerms = 32, bands = 16))
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2"),
      Some(dJaccardPairs)),

    // cross-source duplicate flow: near-dup pairs bucketed by the
    // (unordered) source pair — the provenance matrix that shows which
    // sources copy from which, the decision input for dropping or
    // down-weighting a mirror-heavy source before training. Composes the
    // LSH pair pipeline with one broadcast source lookup per end
    ("dedup_source_flow",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val src = docs.select(col("doc_id"), col("source"))
        DocDedup.minHashDedupPairs(Tables.spread(s, docs),
            "doc_id", "text", n = 3, threshold = 0.7, dMinHashParams)
          .join(broadcast(src.select(col("doc_id").as("id1"),
            col("source").as("s1"))), "id1")
          .join(broadcast(src.select(col("doc_id").as("id2"),
            col("source").as("s2"))), "id2")
          .groupBy(least(col("s1"), col("s2")).as("src_a"),
            greatest(col("s1"), col("s2")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_a", "src_b")
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        good AS (SELECT id1, id2 FROM pairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        fl AS (SELECT least(d1.source, d2.source) AS src_a,
            greatest(d1.source, d2.source) AS src_b
          FROM good JOIN documents d1 ON d1.doc_id = good.id1
          JOIN documents d2 ON d2.doc_id = good.id2)
        SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
        FROM fl GROUP BY 1, 2 ORDER BY 1, 2""")),

    // blocking-quality eval (record-linkage metrics over the LSH config):
    // pairs completeness = recall of the band join against the exact
    // >= 0.7-Jaccard truth, candidate precision = true-pair density among
    // candidates, reduction ratio = fraction of the all-pairs quadratic
    // the blocking avoided — the three numbers that justify an LSH
    // config before a 100 TB run. All inputs are integer counts; the
    // three ratios are one-shot divisions of exact operands
    ("dedup_blocking_eval",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val sigs = DocDedup.signatures(docs, "doc_id", "text",
          n = 3, p = dMinHashParams)
        // both pair frames are consumed TWICE below (their own count +
        // the hit semi-join); they are pair-grain (bounded candidate
        // sets, tiny next to the corpus), so one eager localCheckpoint
        // each runs the expensive candidate pipelines exactly once
        // instead of twice (the duplicationRank discipline)
        val cand = DocDedup.lshCandidates(sigs, "doc_id", dMinHashParams)
          .localCheckpoint()
        val tp = DocDedup.ngramJaccardPairs(docs, "doc_id", "text",
            n = 3, threshold = 0.7)
          .select(col("id1"), col("id2"))
          .localCheckpoint()
        val nd = docs.agg(count(lit(1)).as("n_docs"))
        val nt = tp.agg(count(lit(1)).as("n_true"))
        val nc = cand.agg(count(lit(1)).as("n_cand"))
        val nh = tp.join(cand, Seq("id1", "id2"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
        nd.crossJoin(broadcast(nt)).crossJoin(broadcast(nc))
          .crossJoin(broadcast(nh))
          .select(col("n_docs"), col("n_true"), col("n_cand"), col("n_hit"),
            round(col("n_hit") / col("n_true"), 6).as("completeness"),
            round(col("n_hit") / col("n_cand"), 6).as("precision"),
            round(lit(1.0) - (col("n_cand") * lit(2.0))
              / (col("n_docs") * (col("n_docs") - 1)), 6).as("reduction"))
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        good AS (SELECT id1, id2 FROM pairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        hs AS (SELECT doc_id, ${dHash60("s")} % 2147483647 AS h FROM sh),
        perms(i, a, b) AS (VALUES $dPerms),
        mins AS (SELECT doc_id, i, min((h * a + b) % 2147483647) AS mh
          FROM hs CROSS JOIN perms GROUP BY 1, 2),
        bands AS (SELECT doc_id, i // 2 AS band,
            string_agg(mh, ',' ORDER BY i) AS key FROM mins GROUP BY 1, 2),
        cand AS (SELECT DISTINCT b1.doc_id AS id1, b2.doc_id AS id2
          FROM bands b1 JOIN bands b2
            ON b1.band = b2.band AND b1.key = b2.key
            AND b1.doc_id < b2.doc_id),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        nt AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM good),
        nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
        nh AS (SELECT CAST(count(*) AS BIGINT) AS n_hit FROM good
          WHERE EXISTS (SELECT 1 FROM cand
            WHERE cand.id1 = good.id1 AND cand.id2 = good.id2))
        SELECT n_docs, n_true, n_cand, n_hit,
          round(CAST(n_hit AS DOUBLE) / n_true, 6) AS completeness,
          round(CAST(n_hit AS DOUBLE) / n_cand, 6) AS precision,
          round(1.0 - (n_cand * 2.0) / (n_docs * (n_docs - 1)), 6)
            AS reduction
        FROM nd CROSS JOIN nt CROSS JOIN nc CROSS JOIN nh""")),

    // MinHash sketch-accuracy audit: the estimate (fraction of agreeing
    // signature components) vs the exact Jaccard it approximates, per
    // near-dup pair — the QA gate before trusting an LSH config on a new
    // corpus. The oracle replays the full all-integer signature pipeline
    // (hash60 mod p, 32 permutations from the exported VALUES table,
    // min per permutation), so every value is bit-equal by construction
    ("dedup_minhash_accuracy",
      (s, d) => DocDedup.minHashEstimateAudit(
          Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
          n = 3, threshold = 0.7, dMinHashParams)
        .select(col("id1"), col("id2"),
          round(col("est_jaccard"), 6).as("est_jaccard"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("abs_err"), 6).as("abs_err"))
        .orderBy("id1", "id2"),
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        good AS (SELECT id1, id2,
            inter * 1.0 / (s1.n + s2.n - inter) AS jac
          FROM pairs JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        hs AS (SELECT doc_id, ${dHash60("s")} % 2147483647 AS h FROM sh),
        perms(i, a, b) AS (VALUES $dPerms),
        mins AS (SELECT doc_id, i, min((h * a + b) % 2147483647) AS mh
          FROM hs CROSS JOIN perms GROUP BY 1, 2),
        agree AS (SELECT g.id1, g.id2, g.jac,
            sum(CASE WHEN m1.mh = m2.mh THEN 1 ELSE 0 END) / 32.0 AS est
          FROM good g JOIN mins m1 ON m1.doc_id = g.id1
          JOIN mins m2 ON m2.doc_id = g.id2 AND m2.i = m1.i
          GROUP BY 1, 2, 3)
        SELECT id1, id2, round(est, 6) AS est_jaccard, round(jac, 6) AS jaccard,
          round(abs(est - jac), 6) AS abs_err
        FROM agree ORDER BY id1, id2""")),

    // the banding S-curve audited on real pairs: theoretical collision
    // probability 1-(1-j^2)^16 (explicit squaring chain — no libm pow on
    // either engine) vs whether the pair actually shares a full band of
    // signature mins; the before/after view of an LSH config decision
    ("dedup_lsh_scurve",
      (s, d) => DocDedup.lshSCurveAudit(
          Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
          n = 3, threshold = 0.7, dMinHashParams)
        .select(col("id1"), col("id2"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("theory_p"), 6).as("theory_p"), col("collided"))
        .orderBy("id1", "id2"),
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        good AS (SELECT id1, id2,
            inter * 1.0 / (s1.n + s2.n - inter) AS jac
          FROM pairs JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        hs AS (SELECT doc_id, ${dHash60("s")} % 2147483647 AS h FROM sh),
        perms(i, a, b) AS (VALUES $dPerms),
        mins AS (SELECT doc_id, i, min((h * a + b) % 2147483647) AS mh
          FROM hs CROSS JOIN perms GROUP BY 1, 2),
        bandagree AS (SELECT g.id1, g.id2, m1.i // 2 AS band,
            bool_and(m1.mh = m2.mh) AS all_eq
          FROM good g JOIN mins m1 ON m1.doc_id = g.id1
          JOIN mins m2 ON m2.doc_id = g.id2 AND m2.i = m1.i
          GROUP BY 1, 2, 3),
        coll AS (SELECT id1, id2, bool_or(all_eq) AS collided
          FROM bandagree GROUP BY 1, 2),
        t0 AS (SELECT id1, id2, jac, 1.0 - jac * jac AS x FROM good),
        t1 AS (SELECT id1, id2, jac, x * x AS x FROM t0),
        t2 AS (SELECT id1, id2, jac, x * x AS x FROM t1),
        t3 AS (SELECT id1, id2, jac, x * x AS x FROM t2),
        t4 AS (SELECT id1, id2, jac, x * x AS x FROM t3)
        SELECT t4.id1, t4.id2, round(t4.jac, 6) AS jaccard,
          round(1.0 - t4.x, 6) AS theory_p, coll.collided
        FROM t4 JOIN coll ON coll.id1 = t4.id1 AND coll.id2 = t4.id2
        ORDER BY t4.id1, t4.id2""")),

    // dedup threshold operating curve: pair counts and docs-touched at
    // every candidate Jaccard cut — the table that picks the dedup
    // threshold (too low deletes content, too high keeps mirrors).
    // One exact pair pass at the curve floor (0.05 here — at corpus
    // scale pick the floor to bound the pair frame), then a bounded
    // 5-way threshold explode over the pair frame — never a re-scan per
    // threshold; comparisons are one-shot integer-count ratios against
    // identical double literals on both engines
    ("dedup_threshold_curve",
      (s, d) => {
        import s.implicits._
        val pairs = DocDedup.ngramJaccardPairs(
          Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
          n = 3, threshold = 0.05)
        val ts = broadcast(Seq(0.05, 0.1, 0.5, 0.7, 0.9).toDF("t"))
        val expanded = pairs.crossJoin(ts).filter(col("jaccard") >= col("t"))
        val np = expanded.groupBy("t").agg(count(lit(1)).as("n_pairs"))
        val ndocs = expanded
          .select(col("t"), explode(array(col("id1"), col("id2"))).as("id"))
          .distinct()
          .groupBy("t").agg(count(lit(1)).as("n_docs_touched"))
        np.join(ndocs, "t")
          .select(col("t"), col("n_pairs"), col("n_docs_touched"))
          .orderBy("t")
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
            count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        jac AS (SELECT id1, id2,
            inter * 1.0 / (s1.n + s2.n - inter) AS j
          FROM rawpairs JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2),
        ts AS (SELECT unnest([0.05, 0.1, 0.5, 0.7, 0.9]) AS t),
        ex AS (SELECT t, id1, id2 FROM jac CROSS JOIN ts WHERE j >= t),
        np AS (SELECT t, CAST(count(*) AS BIGINT) AS n_pairs
          FROM ex GROUP BY 1),
        nd AS (SELECT t, CAST(count(*) AS BIGINT) AS n_docs_touched FROM (
          SELECT DISTINCT t, unnest([id1, id2]) AS id FROM ex) GROUP BY 1)
        SELECT t, n_pairs, n_docs_touched FROM np JOIN nd USING (t)
        ORDER BY t""")),

    // bounded-Levenshtein verification over the LSH near-dup pairs: the
    // cap (6) is chosen so this corpus exercises BOTH paths — most pairs
    // verify within the bound, the farthest exceed it and surface NULL.
    // DuckDB has no bounded variant, so the oracle post-filters the exact
    // distance with the same cap
    ("dedup_edit_distance",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        // pair-grain frame consumed three times inside editDistanceVerify
        // (both sides of the needed-ids union + the pair join): one eager
        // checkpoint runs the LSH pipeline once and keeps the downstream
        // plan (which AQE re-optimizes per stage) pair-sized — the
        // blocking_eval / duplicationRank discipline (r15: ~2.5 s of
        // warm driver-side replanning measured on the tripled tree).
        // localCheckpoint executor-loss trade-off: see the
        // DocDedup.ngramJaccardPairs note (r16)
        val pairs = DocDedup.minHashDedupPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.7,
          DocDedup.MinHashParams(numPerms = 32, bands = 16)).select("id1", "id2")
          .localCheckpoint()
        DocDedup.editDistanceVerify(docs, "doc_id", "text", pairs, cap = 6)
          .orderBy("id1", "id2")
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        good AS (SELECT id1, id2 FROM pairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        dd AS (SELECT id1, id2, levenshtein(
            regexp_replace(lower(trim(d1.text)), '\\s+', ' ', 'g'),
            regexp_replace(lower(trim(d2.text)), '\\s+', ' ', 'g')) AS rawd,
            greatest(len(regexp_replace(lower(trim(d1.text)), '\\s+', ' ', 'g')),
              len(regexp_replace(lower(trim(d2.text)), '\\s+', ' ', 'g'))) AS mx
          FROM good JOIN documents d1 ON d1.doc_id = id1
            JOIN documents d2 ON d2.doc_id = id2)
        SELECT id1, id2,
          CAST(CASE WHEN rawd <= 6 THEN rawd END AS BIGINT) AS dist,
          CASE WHEN rawd <= 6 THEN round(1.0 - rawd * 1.0 / mx, 6) END AS sim
        FROM dd ORDER BY id1, id2""")),

    ("dedup_ngram_jaccard",
      (s, d) => DocDedup.ngramJaccardPairs(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, threshold = 0.7)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id1", "id2"),
      Some(dJaccardPairs)),

    // IDF-weighted Jaccard near-dups: boilerplate-robust pair scoring —
    // shared hot shingles (headers, license text) contribute ~0 weight,
    // so the score counts shared CONTENT. The oracle replays the exact
    // integer-micro IDF weights, weight sums, and the cross-multiplied
    // threshold verdict
    ("dedup_weighted_jaccard",
      (s, d) => DocDedup.weightedJaccardPairs(
          Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, threshold = 0.5)
        .select(col("id1"), col("id2"),
          round(col("wjaccard"), 6).as("wjaccard"))
        .orderBy("id1", "id2"),
      Some(s"""WITH $dShingles,
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        wt AS (SELECT s, count(*) AS df,
            CAST(floor(ln((nd.n + 1) / (count(*) + 1)) * 1000000 + 0.5)
              AS BIGINT) AS w
          FROM sh CROSS JOIN nd GROUP BY s, nd.n),
        dw AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS wsum
          FROM sh JOIN wt USING (s) GROUP BY 1),
        pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
            CAST(sum(wt.w) AS BIGINT) AS winter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          JOIN wt ON wt.s = a.s
          WHERE wt.df <= 5000
          GROUP BY 1, 2)
        SELECT id1, id2,
          round(CAST(winter AS DOUBLE) / (w1.wsum + w2.wsum - winter), 6)
            AS wjaccard
        FROM pr JOIN dw w1 ON w1.doc_id = id1 JOIN dw w2 ON w2.doc_id = id2
        WHERE winter * 1000000 >= 500000 * (w1.wsum + w2.wsum - winter)
        ORDER BY id1, id2""")),

    // maximal repeated token runs (Lee et al. 2022 exact-substring
    // dedup): positional 6-shingle anchor index → corpus occurrence
    // counts → per-document gaps-and-islands; all-integer positions and
    // counts, so the oracle replays the spans bit-exactly
    ("dedup_repeated_spans",
      (s, d) => DocDedup.repeatedSpans(
          Tables.documents(s, d).filter(col("doc_id") < 400),
          "doc_id", "text", k = 6, minOccurs = 2, minRun = 2)
        .orderBy("doc_id", "span_start"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents
          WHERE doc_id < 400),
        ps AS (SELECT doc_id, unnest(range(1, len(w) - 4)) AS i, w
          FROM toks WHERE len(w) >= 6),
        p AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS sh
          FROM ps),
        hot AS (SELECT sh FROM p GROUP BY sh HAVING count(*) >= 2),
        dd AS (SELECT p.doc_id, p.i,
            row_number() OVER (PARTITION BY p.doc_id ORDER BY p.i) AS rn
          FROM p JOIN hot USING (sh)),
        g AS (SELECT doc_id, CAST(min(i) AS INT) AS span_start,
            CAST(max(i) + 5 AS INT) AS span_end, count(*) AS n_shingles
          FROM dd GROUP BY doc_id, i - rn)
        SELECT doc_id, span_start, span_end, n_shingles FROM g
        WHERE n_shingles >= 2 ORDER BY doc_id, span_start""")),

    // incremental span mining: only the BATCH (doc_id < 200) is
    // shingled; the corpus contributes through its persisted (sh, n)
    // occurrence index — batch-internal and batch-vs-corpus repeats both
    // surface. The oracle rebuilds the same index + batch-window counts
    ("dedup_spans_incremental",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val index = DocDedup.spanShingleIndex(
          docs.filter(col("doc_id") >= 200 && col("doc_id") < 500),
          "doc_id", "text", k = 6)
        DocDedup.incrementalRepeatedSpans(index,
          docs.filter(col("doc_id") < 200), "doc_id", "text", k = 6,
          minRun = 2)
          .orderBy("doc_id", "span_start")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents
          WHERE doc_id < 500),
        ps AS (SELECT doc_id, unnest(range(1, len(w) - 4)) AS i, w
          FROM toks WHERE len(w) >= 6),
        p AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS sh
          FROM ps),
        idx AS (SELECT sh, count(*) AS ni FROM p WHERE doc_id >= 200
          GROUP BY sh),
        bc AS (SELECT doc_id, i, sh, count(*) OVER (PARTITION BY sh) AS nb
          FROM p WHERE doc_id < 200),
        dup AS (SELECT bc.doc_id, bc.i FROM bc LEFT JOIN idx USING (sh)
          WHERE nb + coalesce(ni, 0) >= 2),
        dd AS (SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id
            ORDER BY i) AS rn FROM dup),
        g AS (SELECT doc_id, CAST(min(i) AS INT) AS span_start,
            CAST(max(i) + 5 AS INT) AS span_end, count(*) AS n_shingles
          FROM dd GROUP BY doc_id, i - rn)
        SELECT doc_id, span_start, span_end, n_shingles FROM g
        WHERE n_shingles >= 2 ORDER BY doc_id, span_start""")),

    // keep-one-occurrence policy (Lee et al. §4 semantics proper): the
    // globally-first (doc_id, pos) occurrence of each repeated shingle
    // is the canonical keeper; only LATER copies become excisable spans.
    // The oracle replays the same per-shingle rank
    ("dedup_spans_keep_first",
      (s, d) => DocDedup.repeatedSpansKeepFirst(
          Tables.documents(s, d).filter(col("doc_id") < 400),
          "doc_id", "text", k = 6, minRun = 2)
        .orderBy("doc_id", "span_start"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents
          WHERE doc_id < 400),
        ps AS (SELECT doc_id, unnest(range(1, len(w) - 4)) AS i, w
          FROM toks WHERE len(w) >= 6),
        p AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS sh
          FROM ps),
        r AS (SELECT doc_id, i, count(*) OVER (PARTITION BY sh) AS n,
            row_number() OVER (PARTITION BY sh ORDER BY doc_id, i) AS rn
          FROM p),
        dd AS (SELECT doc_id, i, row_number() OVER (PARTITION BY doc_id
            ORDER BY i) AS rk
          FROM r WHERE n >= 2 AND rn > 1),
        g AS (SELECT doc_id, CAST(min(i) AS INT) AS span_start,
            CAST(max(i) + 5 AS INT) AS span_end, count(*) AS n_shingles
          FROM dd GROUP BY doc_id, i - rk)
        SELECT doc_id, span_start, span_end, n_shingles FROM g
        WHERE n_shingles >= 2 ORDER BY doc_id, span_start""")),

    // span EXCISION over the repeated runs: per-doc removed-token mass
    // and the cleaned remainder text — the oracle rebuilds both with the
    // same spans CTE plus a positional anti-join token filter
    ("dedup_span_excision",
      (s, d) => DocDedup.exciseRepeatedSpans(
          Tables.documents(s, d).filter(col("doc_id") < 400),
          "doc_id", "text", k = 6, minOccurs = 2, minRun = 2)
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS w FROM documents
          WHERE doc_id < 400),
        ps AS (SELECT doc_id, unnest(range(1, len(w) - 4)) AS i, w
          FROM toks WHERE len(w) >= 6),
        p AS (SELECT doc_id, i, array_to_string(w[i:i+5], ' ') AS sh
          FROM ps),
        hot AS (SELECT sh FROM p GROUP BY sh HAVING count(*) >= 2),
        dd AS (SELECT p.doc_id, p.i,
            row_number() OVER (PARTITION BY p.doc_id ORDER BY p.i) AS rn
          FROM p JOIN hot USING (sh)),
        g AS (SELECT doc_id, min(i) AS span_start, max(i) + 5 AS span_end
          FROM dd GROUP BY doc_id, i - rn HAVING count(*) >= 2),
        tpos AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos,
            unnest(w) AS t, len(w) AS n FROM toks),
        kept AS (SELECT doc_id, pos, t, n FROM tpos
          WHERE NOT EXISTS (SELECT 1 FROM g
            WHERE g.doc_id = tpos.doc_id
              AND tpos.pos BETWEEN g.span_start AND g.span_end))
        SELECT toks.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(len(w) - count(kept.pos) AS BIGINT) AS removed_tokens,
          coalesce(string_agg(kept.t, ' ' ORDER BY kept.pos), '') AS cleaned
        FROM toks LEFT JOIN kept ON kept.doc_id = toks.doc_id
        GROUP BY toks.doc_id, len(w) ORDER BY toks.doc_id""")),

    ("dedup_containment",
      // asymmetric near-dup: |A∩B| / min(|A|,|B|) catches a document
      // embedded verbatim in a much longer one, which Jaccard scores ≈ 0
      (s, d) => DocDedup.containmentPairs(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id1"), col("id2"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id1", "id2"),
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        SELECT id1, id2,
          round(inter * 1.0 / least(s1.n, s2.n), 6) AS containment
        FROM pairs JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2
        WHERE inter * 1.0 / least(s1.n, s2.n) >= 0.8
        ORDER BY id1, id2""")),

    // near-dup pairs -> canonical clusters: the DuckDB twin walks the
    // same pair set to a fixpoint with a recursive CTE (transitive
    // closure), so both engines agree on every component assignment.
    //
    // KNOWN RECALL-GAP TOLERANCE (correctness-gate note): the Spark side
    // feeds the clustering from MinHash-LSH candidates (32 perms / 16
    // bands, every candidate exact-Jaccard verified — precision is exact),
    // while the oracle computes the FULL exact-Jaccard pair closure. At
    // J>=0.7 a true pair escapes all 16 bands with probability
    // (1 - J^2)^16 <= ~2e-5, so the two pair sets are expected to be
    // identical on any realistic regeneration of the test corpus; if a
    // regenerated dataset ever hash-mismatches here with exactly one
    // missing pair / split cluster, that is this documented LSH recall
    // gap, not an engine bug (same tolerance applies to dedup_minhash_lsh
    // vs its exact-pairs oracle above).
    ("dedup_components",
      (s, d) => DocDedup.connectedComponents(
          DocDedup.minHashDedupPairs(Tables.spread(s, Tables.documents(s, d)),
            "doc_id", "text", n = 3, threshold = 0.7,
            DocDedup.MinHashParams(numPerms = 32, bands = 16)))
        .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        dup AS (SELECT id1, id2 FROM rawpairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        edges AS (SELECT id1 AS u, id2 AS v FROM dup
          UNION SELECT id2, id1 FROM dup),
        reach(id, root) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY 1),
        cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1)
        SELECT id AS doc_id, cluster_id, cluster_size
        FROM comp JOIN cs USING (cluster_id) ORDER BY doc_id""")),

    // canonical selection per duplicate cluster: keep the HIGHEST-QUALITY
    // member (ties -> lowest doc_id), not the first-arriving one — the
    // production dedup semantic when sources differ in cleanliness. One
    // keyed join of the (small) clustered-docs frame against per-doc
    // quality micros, then a struct-max aggregate (map-side partials) —
    // no window over the corpus; ranking runs on integer micros so the
    // argmax is engine-stable
    ("dedup_keep_best",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cc = DocDedup.connectedComponents(
          DocDedup.minHashDedupPairs(Tables.spread(s, docs), "doc_id",
            "text", n = 3, threshold = 0.7, dMinHashParams))
        val qm = docs.select(col("doc_id"),
          floor(TF.qualityScore(col("text")) * lit(1e6) + lit(0.5))
            .cast("long").as("qm"))
        cc.join(qm, cc("id") === qm("doc_id"))
          .groupBy("cluster_id", "cluster_size")
          .agg(max(struct(col("qm"), (-col("doc_id")).as("__nd"))).as("__b"))
          .select(col("cluster_id"),
            (-col("__b.__nd")).as("kept_doc"),
            col("__b.qm").as("kept_q_micro"),
            col("cluster_size"),
            (col("cluster_size") - 1).as("n_dropped"))
          .orderBy("cluster_id")
      },
      Some(s"""WITH RECURSIVE $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        dup AS (SELECT id1, id2 FROM rawpairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        edges AS (SELECT id1 AS u, id2 AS v FROM dup
          UNION SELECT id2, id1 FROM dup),
        reach(id, root) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY 1),
        cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1),
        q AS (SELECT doc_id,
            CAST(floor($dQuality * 1000000.0 + 0.5) AS BIGINT) AS qm
          FROM documents),
        r AS (SELECT comp.cluster_id, comp.id AS doc_id, q.qm,
            cs.cluster_size,
            row_number() OVER (PARTITION BY comp.cluster_id
              ORDER BY q.qm DESC, comp.id ASC) AS rk
          FROM comp JOIN q ON q.doc_id = comp.id JOIN cs USING (cluster_id))
        SELECT cluster_id, doc_id AS kept_doc, qm AS kept_q_micro,
          cluster_size, cluster_size - 1 AS n_dropped
        FROM r WHERE rk = 1 ORDER BY cluster_id""")),

    // duplication centrality: fixed-round integer PageRank over the
    // near-dup pair graph — the "most-mirrored document" score that
    // separates a one-canonical-many-copies star from a chain of drafts
    // (cluster size alone cannot). All-integer mass propagation
    // (m div deg shares, 150000 + 85%·incoming re-damp), 3 fixed rounds
    // — bit-identical on any engine, one keyed join + keyed sum per round
    ("dedup_pagerank",
      (s, d) => {
        val pairs = DocDedup.minHashDedupPairs(
          Tables.spread(s, Tables.documents(s, d)), "doc_id", "text",
          n = 3, threshold = 0.7, dMinHashParams)
        DocDedup.duplicationRank(pairs, iters = 3)
          .select(col("doc_id"), col("deg"),
            (col("rank_micro") / lit(1e6)).as("rank"))
          .orderBy("doc_id")
      },
      Some {
        def round(t: Int): String = {
          val prev = if (t == 1) "m0" else s"r${t - 1}"
          s"""r$t AS (SELECT e.dst AS id,
              CAST(150000 + (85 * sum(m.m // d.deg)) // 100 AS BIGINT) AS m
            FROM edges e JOIN $prev m ON m.id = e.src
            JOIN deg d ON d.src = e.src GROUP BY e.dst)"""
        }
        s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        dup AS (SELECT id1, id2 FROM rawpairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        edges AS (SELECT id1 AS src, id2 AS dst FROM dup
          UNION ALL SELECT id2, id1 FROM dup),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
          FROM edges GROUP BY 1),
        m0 AS (SELECT src AS id, CAST(1000000 AS BIGINT) AS m FROM deg),
        ${(1 to 3).map(round).mkString(",\n        ")}
        SELECT d.src AS doc_id, d.deg, r3.m / 1000000.0 AS rank
        FROM deg d JOIN r3 ON r3.id = d.src ORDER BY doc_id"""
      }),

    // duplicate-cluster size histogram — the corpus-health report a dedup
    // run emits (how much of the corpus sits in dup clusters of what
    // size); singletons = docs outside every near-dup component
    ("dedup_cluster_sizes",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val cc = DocDedup.connectedComponents(
          DocDedup.minHashDedupPairs(docs, "doc_id", "text", n = 3,
            threshold = 0.7, DocDedup.MinHashParams(numPerms = 32, bands = 16)))
        val hist = cc.groupBy("cluster_size")
          .agg(countDistinct("cluster_id").as("n_clusters"),
            count(lit(1)).as("n_docs"))
        val singles = docs.agg(count(lit(1)).as("__nd"))
          .crossJoin(cc.agg(count(lit(1)).as("__nc")))
          .select(lit(1L).as("cluster_size"),
            (col("__nd") - col("__nc")).as("n_clusters"),
            (col("__nd") - col("__nc")).as("n_docs"))
        hist.unionByName(singles).orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        rawpairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        dup AS (SELECT id1, id2 FROM rawpairs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        edges AS (SELECT id1 AS u, id2 AS v FROM dup
          UNION SELECT id2, id1 FROM dup),
        reach(id, root) AS (
          SELECT u, u FROM edges
          UNION
          SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.id),
        comp AS (SELECT id, min(root) AS cluster_id FROM reach GROUP BY 1),
        cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY 1),
        hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
            CAST(sum(cluster_size) AS BIGINT) AS n_docs FROM cs GROUP BY 1),
        tot AS (SELECT count(*) AS nd FROM documents),
        inc AS (SELECT count(*) AS nc FROM comp)
        SELECT cluster_size, n_clusters, n_docs FROM hist
        UNION ALL SELECT 1, nd - nc, nd - nc FROM tot CROSS JOIN inc
        ORDER BY cluster_size""")),

    // top-N PMI collocations (pointwise mutual information over corpus
    // bigram/unigram counts, the classic collocation extractor) — counts
    // shrink with vocabulary; the log quantizes to integer micro-bits so
    // the ranking is an exact integer sort in any engine
    ("text_pmi",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val uni = docs.select(explode_outer(TF.tokens(col("text"))).as("w"))
          .filter(col("w").isNotNull)
          .groupBy("w").agg(count(lit(1)).as("cw"))
        val uniTot = uni.agg(sum("cw").as("u"))
        val bg = docs.select(explode_outer(TF.ngrams(col("text"), 2)).as("bg"))
          .filter(col("bg").isNotNull)
          .groupBy("bg").agg(count(lit(1)).as("c12"))
        val bgTot = bg.agg(sum("c12").as("tb"))
        bg.filter(col("c12") >= 5)
          .withColumn("w1", split(col("bg"), " ").getItem(0))
          .withColumn("w2", split(col("bg"), " ").getItem(1))
          .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
          .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
          .crossJoin(broadcast(uniTot)).crossJoin(broadcast(bgTot))
          .withColumn("__q", round(log2((col("c12") / col("tb")) /
            ((col("c1") / col("u")) * (col("c2") / col("u")))) * 1e6)
            .cast("long"))
          .select(col("bg").as("bigram"), col("c12"),
            (col("__q").cast("double") / 1e6).as("pmi"))
          .orderBy(col("pmi").desc, col("bigram").asc)
          .limit(50)
      },
      Some(s"""WITH p AS (SELECT doc_id, $dToks AS w FROM documents),
        u AS (SELECT tok, count(*) AS cw
          FROM (SELECT unnest(w) AS tok FROM p) GROUP BY 1),
        ut AS (SELECT sum(cw) AS u FROM u),
        bgl AS (SELECT doc_id, CASE WHEN len(w) >= 2 THEN list_filter(
            list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]),
            x -> length(x) > 0) ELSE [] END AS bgs FROM p),
        occ AS (SELECT doc_id, unnest(bgs) AS b FROM bgl),
        bcnt AS (SELECT b, count(*) AS c12 FROM occ GROUP BY 1),
        bt AS (SELECT sum(c12) AS tb FROM bcnt),
        x AS (SELECT bcnt.b AS bigram, c12,
            CAST(round(log2((c12 / bt.tb)
              / ((u1.cw / ut.u) * (u2.cw / ut.u))) * 1000000) AS BIGINT) AS q
          FROM bcnt JOIN u u1 ON u1.tok = string_split(bcnt.b, ' ')[1]
          JOIN u u2 ON u2.tok = string_split(bcnt.b, ' ')[2]
          CROSS JOIN ut CROSS JOIN bt WHERE c12 >= 5)
        SELECT bigram, c12, q / 1000000.0 AS pmi FROM x
        ORDER BY q DESC, bigram LIMIT 50""")),

    ("dedup_ensemble",
      // three detector families vote per pair; the count is the
      // precision dial (3 = certain dup, 1 = review queue)
      (s, d) => DocDedup.ensemblePairs(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text")
        .orderBy("id1", "id2"),
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        prs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        ja AS (SELECT id1, id2 FROM prs
          JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
          WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7),
        nh AS (SELECT doc_id, md5($dNorm) AS h FROM documents),
        ex AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM nh a
          JOIN nh b ON a.h = b.h AND a.doc_id < b.doc_id),
        toksd AS (SELECT doc_id, list_distinct($dToks) AS ws FROM documents),
        th AS (SELECT doc_id, ${dHash60("t")} AS h
          FROM (SELECT doc_id, unnest(ws) AS t FROM toksd)),
        bitsums AS (SELECT doc_id, b,
            sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END)
              AS sgn
          FROM th CROSS JOIN range(60) r(b) GROUP BY 1, 2),
        sg AS (SELECT doc_id, CAST(sum(CASE WHEN sgn > 0
            THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT)
            AS sig
          FROM bitsums GROUP BY 1),
        sp AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM sg a JOIN sg b
          ON a.doc_id < b.doc_id
            AND bit_count(xor(a.sig, b.sig)) <= 3),
        u AS (SELECT id1, id2, 'exact' AS sig FROM ex
          UNION ALL SELECT id1, id2, 'jaccard' FROM ja
          UNION ALL SELECT id1, id2, 'simhash' FROM sp)
        SELECT id1, id2, CAST(count(*) AS BIGINT) AS votes,
          string_agg(sig, ',' ORDER BY sig) AS signals
        FROM u GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("sample_fixed_size",
      // reservoir-style EXACT-count draw per language, deterministic by
      // content hash — stable across runs, partitionings, and engines
      (s, d) => Sampling.fixedSizeSample(Tables.documents(s, d),
          "lang", "doc_id", n = 10)
        .orderBy("lang", "draw"),
      Some(s"""WITH h AS (SELECT lang, doc_id,
            ${dHash60("CAST(doc_id AS VARCHAR)")} AS hv FROM documents),
        rk AS (SELECT lang, doc_id, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY hv ASC, doc_id ASC) AS INT) AS draw
          FROM h)
        SELECT lang, draw, doc_id FROM rk WHERE draw <= 10
        ORDER BY lang, draw""")),

    ("dedup_simhash",
      (s, d) => Tables.spread(s, Tables.documents(s, d))
        .select(col("doc_id"), DocDedup.simHash(col("text")).as("simhash"))
        .orderBy("doc_id"),
      Some(s"""WITH toks AS (
          SELECT doc_id, list_distinct($dToks) AS ws FROM documents),
        th AS (SELECT doc_id, ${dHash60("t")} AS h
          FROM (SELECT doc_id, unnest(ws) AS t FROM toks)),
        bitsums AS (SELECT doc_id, b,
            sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
          FROM th CROSS JOIN range(60) r(b) GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(CASE WHEN sgn > 0
            THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS simhash
        FROM bitsums GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------ training-batch shaping

    // GPT-style sequence packing: concatenate each language's documents in
    // doc_id order, cut 128-token training sequences across doc boundaries,
    // emit one row per (doc, sequence) overlap — all integer arithmetic
    ("pack_sequences",
      (s, d) => {
        val t = Tables.documents(s, d).select(col("lang"), col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n"))
        Packing.packSequences(t, Seq("lang"), "doc_id", "n", seqLen = 128)
          .select(col("lang"), col("doc_id"), col("seq_id"),
            col("seq_off"), col("n_take"))
          .orderBy("lang", "doc_id", "seq_id")
      },
      Some(s"""WITH t AS (SELECT lang, doc_id, CAST(len($dToks) AS BIGINT) AS n
          FROM documents),
        w AS (SELECT lang, doc_id, n, CAST(sum(n) OVER (PARTITION BY lang
            ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
          FROM t WHERE n > 0),
        sp AS (SELECT lang, doc_id, n, e - n AS st, e,
            unnest(range((e - n) // 128, (e - 1) // 128 + 1)) AS seq_id FROM w)
        SELECT lang, doc_id, seq_id,
          greatest(st, seq_id * 128) - seq_id * 128 AS seq_off,
          least(e, (seq_id + 1) * 128) - greatest(st, seq_id * 128) AS n_take
        FROM sp ORDER BY lang, doc_id, seq_id""")),

    // packing-efficiency report: sequences built, tokens placed, and the
    // fill ratio against padded capacity per stratum — the padding-waste
    // number every training run watches; composes packSequences with one
    // counting aggregate
    ("pack_efficiency",
      (s, d) => {
        val t = Tables.documents(s, d).select(col("lang"), col("doc_id"),
          TF.tokenCount(col("text")).cast("long").as("n"))
        Packing.packSequences(t, Seq("lang"), "doc_id", "n", seqLen = 128)
          .groupBy("lang")
          .agg(countDistinct("seq_id").as("n_seqs"),
            sum("n_take").as("n_tokens"))
          .select(col("lang"), col("n_seqs"), col("n_tokens"),
            round(col("n_tokens") / (col("n_seqs") * 128), 6).as("fill_ratio"))
          .orderBy("lang")
      },
      Some(s"""WITH t AS (SELECT lang, doc_id, CAST(len($dToks) AS BIGINT) AS n
          FROM documents),
        w AS (SELECT lang, doc_id, n, CAST(sum(n) OVER (PARTITION BY lang
            ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS e
          FROM t WHERE n > 0),
        sp AS (SELECT lang, doc_id, n, e - n AS st, e,
            unnest(range((e - n) // 128, (e - 1) // 128 + 1)) AS seq_id FROM w),
        tk AS (SELECT lang, seq_id,
            least(e, (seq_id + 1) * 128) - greatest(st, seq_id * 128) AS n_take
          FROM sp)
        SELECT lang, CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
          CAST(sum(n_take) AS BIGINT) AS n_tokens,
          round(sum(n_take) / (count(DISTINCT seq_id) * 128), 6) AS fill_ratio
        FROM tk GROUP BY lang ORDER BY lang""")),

    // RAG-style sliding-window chunking: 200-char windows every 150 chars;
    // compare chunk digests, not the chunks themselves
    ("text_chunks",
      (s, d) => Packing.chunkDocuments(Tables.documents(s, d),
          "doc_id", "text", size = 200, stride = 150)
        .select(col("doc_id"), col("chunk_id"),
          md5(encode(col("chunk"), "UTF-8")).as("chunk_md5"),
          length(col("chunk")).as("chunk_len"))
        .orderBy("doc_id", "chunk_id"),
      Some("""WITH c AS (SELECT doc_id, text,
          unnest(range(0, (greatest(length(text) - 200, 0) + 149) // 150 + 1))
            AS cid FROM documents)
        SELECT doc_id, CAST(cid AS INT) AS chunk_id,
          md5(substring(text, CAST(cid * 150 + 1 AS INT), 200)) AS chunk_md5,
          CAST(length(substring(text, CAST(cid * 150 + 1 AS INT), 200)) AS INT)
            AS chunk_len
        FROM c ORDER BY doc_id, chunk_id""")),

    // token-balanced shard export: documents dealt to shards in
    // boustrophedon order of descending token count (the deterministic
    // LPT approximation), balanced WITHIN each language stratum — the
    // rank is keyed (r10 verdict: an unkeyed rank is a single task over
    // the whole corpus), and a per-stratum deal also makes each shard's
    // language mix match the corpus mix. All-integer rank/modulo
    // arithmetic; per-(lang, shard) totals show the straggler headroom
    ("pack_shard_balance",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
          .select(col("lang"), col("doc_id"),
            size(TF.tokens(col("text"))).cast("long").as("n_toks"))
        Packing.shardBalance(docs, Seq("lang"), "doc_id", "n_toks",
            shards = 5)
          .groupBy("lang", "shard")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"))
          .orderBy("lang", "shard")
      },
      Some(s"""WITH t AS (SELECT lang, doc_id, len($dToks) AS n_toks
          FROM documents),
        rk AS (SELECT lang, doc_id, n_toks, CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY n_toks DESC, doc_id ASC) - 1 AS BIGINT) AS r FROM t),
        a AS (SELECT lang, n_toks, CASE WHEN (r // 5) % 2 = 0 THEN r % 5
            ELSE 4 - (r % 5) END AS shard FROM rk)
        SELECT lang, CAST(shard AS INT) AS shard,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_toks) AS BIGINT) AS tokens
        FROM a GROUP BY 1, 2 ORDER BY 1, 2""")),

    // per-source lexical diversity audit: type-token ratio and Simpson
    // repeat-probability over the token distribution — the vocabulary
    // health dial (a source whose Simpson index spikes is template spam
    // even when per-doc repetition looks clean). Exact rational
    // arithmetic on integer counts, one token aggregate per source
    ("text_diversity",
      (s, d) => {
        val counts = Tables.spread(s, Tables.documents(s, d))
          .select(col("source"), explode(TF.tokens(col("text"))).as("t"))
          .filter(length(col("t")) >= 1)
          .groupBy("source", "t").agg(count(lit(1)).as("n"))
        counts.groupBy("source")
          .agg(sum("n").as("n_tokens"),
            count(lit(1)).as("n_vocab"),
            // decimal(38,0): the repeat-pair sum is Σ n(n−1) ≤ N², which
            // a long cannot hold at corpus scale (DuckDB's twin sums in
            // HUGEINT)
            sum((col("n") * (col("n") - 1)).cast("decimal(38,0)"))
              .as("__rep"))
          .select(col("source"), col("n_tokens"), col("n_vocab"),
            round(col("n_vocab") / col("n_tokens"), 6).as("ttr"),
            // DOUBLE products: the long·long denominator would overflow
            // 2^63 past ~3e9 tokens per source (the temperatureMix rule)
            round(col("__rep").cast("double") /
              (col("n_tokens").cast("double") *
                (col("n_tokens") - 1).cast("double")), 6).as("simpson"))
          .orderBy("source")
      },
      Some(s"""WITH occ AS (SELECT source, unnest(w) AS t
          FROM (SELECT source, $dToks AS w FROM documents)),
        cnt AS (SELECT source, t, count(*) AS n FROM occ
          WHERE length(t) >= 1 GROUP BY 1, 2)
        SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
          CAST(count(*) AS BIGINT) AS n_vocab,
          round(count(*) / sum(n), 6) AS ttr,
          round(CAST(sum(n * (n - 1)) AS DOUBLE)
            / (CAST(sum(n) AS DOUBLE) * CAST(sum(n) - 1 AS DOUBLE)), 6)
            AS simpson
        FROM cnt GROUP BY 1 ORDER BY 1""")),

    // shard export manifest: per (stratum, shard) doc/token totals, id
    // range, and an order-free xor-of-hashes membership fingerprint —
    // what a training job validates before reading a shard; the oracle
    // replays the dealing assignment and the exact integer fingerprint
    ("pack_shard_manifest",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
          .select(col("lang"), col("doc_id"),
            size(TF.tokens(col("text"))).cast("long").as("n_toks"))
        Packing.shardManifest(docs, Seq("lang"), "doc_id", "n_toks",
            shards = 5)
          .orderBy("lang", "shard")
      },
      Some(s"""WITH t AS (SELECT lang, doc_id, len($dToks) AS n_toks
          FROM documents),
        rk AS (SELECT lang, doc_id, n_toks, CAST(row_number() OVER (
            PARTITION BY lang
            ORDER BY n_toks DESC, doc_id ASC) - 1 AS BIGINT) AS r FROM t),
        a AS (SELECT lang, doc_id, n_toks,
            CASE WHEN (r // 5) % 2 = 0 THEN r % 5
            ELSE 4 - (r % 5) END AS shard FROM rk)
        SELECT lang, CAST(shard AS INT) AS shard,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_toks) AS BIGINT) AS n_tokens,
          min(doc_id) AS id_min, max(doc_id) AS id_max,
          bit_xor(${dHash60("CAST(doc_id AS VARCHAR)")}) AS ids_fp
        FROM a GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Misra-Gries heavy hitters: top tokens via a bounded MERGEABLE
    // summary (≤ k counters per state, map-side partials — never a
    // vocabulary-sized shuffle). Capacity 64 > the corpus vocabulary, so
    // the summary is exact counting here and the oracle replays it as
    // plain counts; the spec pins the eviction/merge semantics below
    // capacity
    ("text_heavy_hitters",
      (s, d) => Tables.spread(s, Tables.documents(s, d))
        .select(explode(TF.tokens(col("text"))).as("tok"))
        .agg(graft.functions.HeavyHitters.misraGries(64)(col("tok")).as("hh"))
        .select(explode(col("hh")).as(Seq("token", "est")))
        .orderBy(col("est").desc, col("token"))
        .limit(15),
      Some(s"""WITH occ AS (SELECT unnest(w) AS t
          FROM (SELECT $dToks AS w FROM documents))
        SELECT t AS token, CAST(count(*) AS BIGINT) AS est
        FROM occ GROUP BY 1
        ORDER BY est DESC, token LIMIT 15""")),

    // content-defined chunking: boundaries where a token's hash ≡ 0
    // (mod 8) — insertions in near-duplicates shift one chunk, later
    // boundaries re-synchronize (the LBFS/rsync property at text grain).
    // All-integer boundary decisions, so the oracle replays them exactly
    ("text_cdc_chunks",
      (s, d) => Packing.cdcChunks(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", mask = 8)
        .select(col("doc_id"), col("chunk_id"),
          md5(encode(col("chunk"), "UTF-8")).as("chunk_md5"), col("n_toks"))
        .orderBy("doc_id", "chunk_id"),
      Some(s"""WITH t AS (SELECT doc_id, $dToks AS w FROM documents),
        occ AS (SELECT doc_id, i, w[i] AS tok
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM t)),
        seg AS (SELECT doc_id, i, tok, CAST(coalesce(sum(
            CASE WHEN ${dHash60("tok")} % 8 = 0 THEN 1 ELSE 0 END) OVER (
            PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
            AS chunk_id
          FROM occ),
        ch AS (SELECT doc_id, chunk_id,
            string_agg(tok, ' ' ORDER BY i) AS chunk,
            CAST(count(*) AS BIGINT) AS n_toks
          FROM seg GROUP BY 1, 2)
        SELECT doc_id, chunk_id, md5(chunk) AS chunk_md5, n_toks
        FROM ch ORDER BY doc_id, chunk_id""")),

    // the CDC payoff measured: chunks (>= 3 tokens, to skip boundary
    // singletons) shared verbatim across >= 2 documents — the shareable
    // sub-document text a near-dup family exposes to storage/training
    // dedup
    ("dedup_cdc_shared",
      (s, d) => Packing.cdcChunks(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", mask = 8)
        .filter(col("n_toks") >= 3)
        .withColumn("chunk_md5", md5(encode(col("chunk"), "UTF-8")))
        .groupBy("chunk_md5")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"), min(col("n_toks")).as("n_toks"))
        .filter(col("n_docs") >= 2)
        .orderBy("chunk_md5"),
      Some(s"""WITH t AS (SELECT doc_id, $dToks AS w FROM documents),
        occ AS (SELECT doc_id, i, w[i] AS tok
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM t)),
        seg AS (SELECT doc_id, i, tok, CAST(coalesce(sum(
            CASE WHEN ${dHash60("tok")} % 8 = 0 THEN 1 ELSE 0 END) OVER (
            PARTITION BY doc_id ORDER BY i
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
            AS chunk_id
          FROM occ),
        ch AS (SELECT doc_id, chunk_id,
            string_agg(tok, ' ' ORDER BY i) AS chunk,
            count(*) AS n_toks
          FROM seg GROUP BY 1, 2)
        SELECT md5(chunk) AS chunk_md5,
          CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          CAST(count(*) AS BIGINT) AS n_occ,
          CAST(min(n_toks) AS BIGINT) AS n_toks
        FROM ch WHERE n_toks >= 3
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        ORDER BY chunk_md5""")),

    // -------------------------------------------------- similarity search

    ("emb_cosine_pairs",
      (s, d) => {
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        emb.crossJoin(broadcast(q))
          .select(col("q_id"), col("vec_id"),
            (floor(VF.cosine(col("embedding"), col("q_vec")) * lit(1e6)
              + lit(0.5)) / lit(1e6)).as("cos"))
          .orderBy("q_id", "vec_id")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 3)
        SELECT q_id, vec_id,
          ${dCosMicroI("e", "qe")} / 1000000.0 AS cos
        FROM v CROSS JOIN q ORDER BY q_id, vec_id""")),

    // brute-force cosine top-k on integer-micro VECTORS (dEmbMicro):
    // every dot/norm is an exact order-free integer sum, so the cosines
    // feeding the ranking are bit-equal across engines; the micro
    // post-quantization (microRank) then maps identical bits to
    // identical longs, and `micro/1e6` exposes one IEEE division of
    // identical operands
    ("ann_brute_topk",
      (s, d) => {
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("cos") / lit(1e6)).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        scored AS (SELECT q_id, vec_id AS neighbor_id,
            ${dCosMicroI("e", "qe")} AS qm
          FROM v CROSS JOIN q WHERE vec_id != q_id),
        ranked AS (SELECT q_id, neighbor_id, qm, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY qm DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT q_id, rank, neighbor_id, qm / 1000000.0 AS cos
        FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""")),

    ("ann_mmr_select",
      // MMR diversified top-k: stage-1 brute retrieval (corpus-scale
      // posture), then 5 greedy integer-exact rounds over the 15-deep
      // candidate pool; the oracle unrolls the same greedy recursion as
      // 5 chained SQL stages
      (s, d) => {
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.mmrRerank(emb, q, n = 15, k = 5)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some {
        def pairSim(a: String, b: String) =
          s"""CAST(round(${dDotI(s"$a.e", s"$b.e")}
            / (sqrt(${dDotI(s"$a.e", s"$a.e")})
               * sqrt(${dDotI(s"$b.e", s"$b.e")})) * 1000000) AS BIGINT)"""
        def pStage(i: Int): String = {
          val (src, agg) =
            if (i == 1) ("pool", s"${pairSim("p", "s")}")
            else (s"p${i - 1}", s"greatest(p.ms, ${pairSim("p", "s")})")
          s"""p$i AS (SELECT p.q_id, p.id, p.qsim, p.e, $agg AS ms
            FROM $src p JOIN s$i s USING (q_id) WHERE p.id != s.id)"""
        }
        def sStage(i: Int): String = {
          val (src, ord) =
            if (i == 1) ("pool", "qsim")
            else (s"p${i - 1}", "qsim - ms")
          s"""s$i AS (SELECT * FROM (SELECT *, row_number() OVER (
              PARTITION BY q_id ORDER BY $ord DESC, id ASC) AS rr
            FROM $src) WHERE rr = 1)"""
        }
        // interleave s1, p1, s2, p2, … — each CTE only looks backwards
        val stages = (1 to 5).flatMap(i =>
          Seq(sStage(i)) ++ (if (i < 5) Seq(pStage(i)) else Nil))
        val unions = (1 to 5).map(i =>
          s"""SELECT q_id, $i AS rank, id AS neighbor_id,
            round(qsim / 1000000.0, 6) AS cos FROM s$i""").mkString(
          " UNION ALL ")
        s"""WITH $dEmbMicro,
          q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 3),
          sc AS (SELECT q_id, vec_id AS id, e, ${dDotI("e", "qe")}
              / (sqrt(${dDotI("e", "e")})
                 * sqrt(${dDotI("qe", "qe")})) AS cos
            FROM v CROSS JOIN q WHERE vec_id != q_id),
          pool AS (SELECT q_id, id, e,
              CAST(round(cos * 1000000) AS BIGINT) AS qsim
            FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                ORDER BY cos DESC, id ASC) AS rr FROM sc)
            WHERE rr <= 15),
          ${stages.mkString(",\n          ")}
          $unions ORDER BY q_id, rank"""
      }),

    // hard-negative mining (DPR/Contriever): top-k most-similar vectors
    // OUTSIDE the query's own k-means cluster — the ANN scorer and the
    // clustering composed in one plan; the oracle replays the seed
    // assignment and the cluster-pruned ranking
    ("ann_hard_negatives",
      (s, d) => {
        // cluster assignment on the raw embeddings (kmeansAssign carries
        // its own integer quantization, mirrored by dKmeansPrep); the
        // SCORING side rides integer-micro vectors (dEmbMicro discipline)
        val clusters = Clustering.kmeansAssign(
          Tables.spread(s, Tables.embeddings(s, d)), "vec_id", "embedding",
          k = 8, iters = 0)
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.hardNegatives(emb, clusters, q, k = 10, microRank = true)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("cos") / lit(1e6)).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        vv AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
            y -> floor(y * 1000000.0 + 0.5)) AS e
          FROM embeddings),
        q AS (SELECT vv.vec_id AS q_id, e AS qe, a1.c AS qc
          FROM vv JOIN a1 USING (vec_id) WHERE vv.vec_id < 5),
        scored AS (SELECT q.q_id, vv.vec_id AS neighbor_id,
            ${dCosMicroI("vv.e", "q.qe")} AS qm
          FROM vv JOIN a1 USING (vec_id) CROSS JOIN q
          WHERE vv.vec_id != q.q_id AND a1.c != q.qc),
        ranked AS (SELECT q_id, neighbor_id, qm, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY qm DESC, neighbor_id ASC) AS INT)
            AS rank FROM scored)
        SELECT q_id, rank, neighbor_id, qm / 1000000.0 AS cos
        FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""")),

    ("ann_ivf_topk",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfTopK(emb, centroids, q, k = 5, nprobe = 3,
            microRank = true)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("cos") / lit(1e6)).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 3),
        cand AS (SELECT p.q_id, a.vec_id FROM probes p JOIN assign a ON a.c_id = p.c_id),
        scored AS (SELECT cand.q_id, cand.vec_id AS neighbor_id,
            ${dCosMicroI("v.e", "q.qe")} AS qm
          FROM cand JOIN v ON v.vec_id = cand.vec_id JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id),
        ranked AS (SELECT q_id, neighbor_id, qm, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY qm DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT q_id, rank, neighbor_id, qm / 1000000.0 AS cos
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // serving against a PREBUILT IVF index (the deployed-ANN shape: the
    // corpus was assigned to lists once at build time; a query batch only
    // assigns ITSELF to nprobe lists and scores those lists' members —
    // the corpus is never re-assigned or re-shuffled). Different batch
    // and probe width than ann_ivf_topk so both paths are exercised
    ("ann_ivf_indexed",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val index = Similarity.ivfIndex(emb, centroids, microRank = true)
        val q = emb.filter(col("vec_id") >= 5 && col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfTopKIndexed(index, centroids, q, k = 5, nprobe = 2,
            microRank = true)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("cos") / lit(1e6)).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, e AS qe FROM v
          WHERE vec_id >= 5 AND vec_id < 10),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 2),
        cand AS (SELECT p.q_id, a.vec_id FROM probes p JOIN assign a ON a.c_id = p.c_id),
        scored AS (SELECT cand.q_id, cand.vec_id AS neighbor_id,
            ${dCosMicroI("v.e", "q.qe")} AS qm
          FROM cand JOIN v ON v.vec_id = cand.vec_id JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id),
        ranked AS (SELECT q_id, neighbor_id, qm, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY qm DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT q_id, rank, neighbor_id, qm / 1000000.0 AS cos
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // IVF list-balance audit: per-centroid list sizes and the skew
    // ratio vs a perfectly uniform split — the serving dial behind IVF
    // tail latency (a 3× hot list is a 3× slow probe; rebalance =
    // retrain centroids or split the list). Assignment replays the
    // index build's micro-affinity argmax; dots ride [[dDotI]] so the
    // assignment is engine-proof end to end
    ("ann_ivf_balance",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val lists = Similarity
          .ivfIndex(Tables.spread(s, emb), centroids, microRank = true)
          .groupBy("c_id").agg(count(lit(1)).as("n_vecs"))
        val tot = lists.agg(sum("n_vecs").as("__t"),
          count(lit(1)).as("__k"))
        lists.crossJoin(broadcast(tot))
          .select(col("c_id"), col("n_vecs"),
            round(col("n_vecs") / col("__t"), 6).as("share"),
            round((col("n_vecs") * col("__k")) / col("__t"), 6).as("balance"))
          .orderBy("c_id")
      },
      Some(s"""WITH $dEmbMicro,
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        lists AS (SELECT c_id, count(*) AS n_vecs FROM assign GROUP BY 1),
        t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS tt,
          count(*) AS k FROM lists)
        SELECT c_id, n_vecs,
          round(n_vecs / tt, 6) AS share,
          round((n_vecs * k) / tt, 6) AS balance
        FROM lists CROSS JOIN t ORDER BY c_id""")),

    // range (radius) search — the OTHER query shape every vector store
    // exposes next to k-NN: all matches above a similarity floor, with a
    // data-dependent hit count (near-dup discovery, similarity joins).
    // Served against the prebuilt IVF index: probes broadcast onto the
    // never-re-shuffled index, the verdict is an exact integer-micro
    // threshold — no ranking state at all. Oracle replays assign ->
    // probe -> in-list threshold
    ("ann_range_search",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val index = Similarity.ivfIndex(emb, centroids, microRank = true)
        val q = emb.filter(col("vec_id") >= 10 && col("vec_id") < 15)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfRangeIndexed(index, centroids, q,
            minCosMicro = 200000L, nprobe = 3)
          .select(col("q_id"), col("neighbor_id"),
            (col("cos_micro") / lit(1e6)).as("cos"))
          .orderBy("q_id", "neighbor_id")
      },
      Some(s"""WITH $dEmbMicro,
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, e AS qe FROM v
          WHERE vec_id >= 10 AND vec_id < 15),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 3),
        cand AS (SELECT p.q_id, a.vec_id FROM probes p JOIN assign a ON a.c_id = p.c_id),
        scored AS (SELECT cand.q_id, cand.vec_id AS neighbor_id,
            ${dCosMicroI("v.e", "q.qe")} AS qm
          FROM cand JOIN v ON v.vec_id = cand.vec_id JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id)
        SELECT q_id, neighbor_id, qm / 1000000.0 AS cos
        FROM scored WHERE qm >= 200000
        ORDER BY q_id, neighbor_id""")),

    // ColBERT-style late-interaction retrieval: documents are bags of
    // chunk vectors (5 per doc here), queries are bags of part vectors,
    // score = sum over parts of the best-matching chunk's micro-cosine.
    // A strong local match can't be diluted by a long document the way
    // single-pooled-vector retrieval dilutes it. Parts broadcast onto
    // one chunk scan; max-then-sum are partial aggregates
    ("ann_maxsim_topk",
      (s, d) => {
        val emb = qEmb(s, d)
        val chunks = emb.select(expr("vec_id div 5").as("doc_id"),
          col("embedding"))
        val qp = emb
          .filter(col("vec_id") < 13 && pmod(col("vec_id"), lit(5)) < 3)
          .select(expr("vec_id div 5").as("q_id"),
            pmod(col("vec_id"), lit(5)).as("part_id"),
            col("embedding").as("q_vec"))
        Similarity.maxSimTopK(chunks, qp, k = 5)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("maxsim") / lit(1e6)).as("maxsim"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        ch AS (SELECT vec_id // 5 AS doc_id, e FROM v),
        qp AS (SELECT vec_id // 5 AS q_id, vec_id % 5 AS part_id, e AS qe
          FROM v WHERE vec_id < 13 AND vec_id % 5 < 3),
        pm AS (SELECT q_id, doc_id, part_id,
            CAST(max(${dCosMicroI("ch.e", "qp.qe")}) AS BIGINT) AS best
          FROM ch CROSS JOIN qp WHERE doc_id != q_id GROUP BY 1, 2, 3),
        sc AS (SELECT q_id, doc_id, sum(best) AS ms FROM pm GROUP BY 1, 2),
        rk AS (SELECT q_id, doc_id, ms, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY ms DESC, doc_id ASC) AS INT) AS rank
          FROM sc)
        SELECT q_id, rank, doc_id AS neighbor_id, ms / 1000000.0 AS maxsim
        FROM rk WHERE rank <= 5 ORDER BY q_id, rank""")),

    // filtered vector search (label/ACL/date predicates — the variant
    // every vector store exposes): the filterable attribute is carried
    // INTO the IVF index at build time (ivfIndex carryCols), so the
    // predicate lands on the index scan BEFORE any distance math —
    // PRE-filtering; on a persisted index it pushes down to parquet.
    // Post-filtering (rank, then drop) would under-fill k whenever the
    // true neighbors are mostly filtered out. Oracle replays the same
    // assign -> probe -> label-filter -> score pipeline
    ("ann_filtered_topk",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val index = Similarity.ivfIndex(emb, centroids, microRank = true,
          carryCols = Seq("label"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.filteredTopKIndexed(index, centroids, q,
            col("label").isin(2, 5, 7), k = 5, nprobe = 3, microRank = true)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            (col("cos") / lit(1e6)).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 3),
        cand AS (SELECT p.q_id, a.vec_id
          FROM probes p JOIN assign a ON a.c_id = p.c_id
          JOIN embeddings l ON l.vec_id = a.vec_id
          WHERE l.label IN (2, 5, 7)),
        scored AS (SELECT cand.q_id, cand.vec_id AS neighbor_id,
            ${dCosMicroI("v.e", "q.qe")} AS qm
          FROM cand JOIN v ON v.vec_id = cand.vec_id JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id),
        ranked AS (SELECT q_id, neighbor_id, qm, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY qm DESC, neighbor_id ASC) AS INT) AS rank
          FROM scored)
        SELECT q_id, rank, neighbor_id, qm / 1000000.0 AS cos
        FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""")),

    // semi-hard triplet mining (FaceNet, Schroff et al. 2015 §3.2): per
    // anchor, positive = most-similar same-label vector, negative =
    // most-similar different-label vector STRICTLY below the positive —
    // the band where triplet loss has gradient. Struct-max aggregates on
    // integer-micro cosines (no corpus window); anchors broadcast onto
    // one corpus scan
    ("emb_triplets",
      (s, d) => {
        val emb = qEmb(s, d)
        val anchors = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
            col("label").as("q_label"))
        Similarity.semiHardTriplets(emb, anchors, microRank = true)
          .select(col("q_id").as("anchor_id"),
            col("pos_id"), (col("pos_cos") / lit(1e6)).as("pos_cos"),
            col("neg_id"), (col("neg_cos") / lit(1e6)).as("neg_cos"),
            (col("gap") / lit(1e6)).as("gap"))
          .orderBy("anchor_id")
      },
      Some(s"""WITH $dEmbMicro,
        lab AS (SELECT vec_id, label FROM embeddings),
        a AS (SELECT v.vec_id AS q_id, v.e AS qe, lab.label AS ql
          FROM v JOIN lab USING (vec_id) WHERE v.vec_id < 10),
        scored AS (SELECT a.q_id, v.vec_id AS id, lab.label, a.ql,
            ${dCosMicroI("v.e", "a.qe")} AS qm
          FROM v JOIN lab USING (vec_id) CROSS JOIN a
          WHERE v.vec_id != a.q_id),
        pos AS (SELECT q_id, id AS pos_id, qm AS pos_qm FROM (
          SELECT q_id, id, qm, row_number() OVER (PARTITION BY q_id
              ORDER BY qm DESC, id ASC) AS rn
            FROM scored WHERE label = ql) WHERE rn = 1),
        neg AS (SELECT q_id, id AS neg_id, qm AS neg_qm FROM (
          SELECT s.q_id, s.id, s.qm, row_number() OVER (PARTITION BY s.q_id
              ORDER BY s.qm DESC, s.id ASC) AS rn
            FROM scored s JOIN pos p USING (q_id)
            WHERE s.label != s.ql AND s.qm < p.pos_qm) WHERE rn = 1)
        SELECT q_id AS anchor_id, pos_id, pos_qm / 1000000.0 AS pos_cos,
          neg_id, neg_qm / 1000000.0 AS neg_cos,
          (pos_qm - neg_qm) / 1000000.0 AS gap
        FROM pos JOIN neg USING (q_id) ORDER BY anchor_id""")),

    // recall@10 for EVERY nprobe 1..4 in one corpus pass — the table
    // that picks the IVF operating point (recall climbs, probe cost is
    // linear; serve at the knee). Candidates are scored once at the
    // widest probe set; a candidate found via probe rank pr joins every
    // curve np >= pr through a bounded explode. All dots ride exact
    // BIGINT sums ([[dDotI]]) on the oracle side
    ("ann_nprobe_curve",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfRecallCurve(Tables.spread(s, emb), centroids, q,
            k = 10, maxProbe = 4, microRank = true)
          .orderBy("nprobe")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        probes AS (SELECT q_id, c_id, pr FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS pr
          FROM q CROSS JOIN c) WHERE pr <= 4),
        cand AS (SELECT p.q_id, p.pr, a.vec_id
          FROM probes p JOIN assign a ON a.c_id = p.c_id),
        scored AS (SELECT cand.q_id, cand.pr, cand.vec_id AS neighbor_id,
            ${dCosMicroI("v.e", "q.qe")} AS qm
          FROM cand JOIN v ON v.vec_id = cand.vec_id
          JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id),
        ex AS (SELECT q_id, neighbor_id, qm, unnest(range(pr, 5)) AS np
          FROM scored),
        ranked AS (SELECT q_id, np, neighbor_id FROM (SELECT q_id, np,
            neighbor_id, row_number() OVER (PARTITION BY q_id, np
              ORDER BY qm DESC, neighbor_id ASC) AS rk
          FROM ex) WHERE rk <= 10),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        nq AS (SELECT count(*) AS n FROM q)
        SELECT CAST(np AS INT) AS nprobe,
          CAST(sum(CASE WHEN bf.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN bf.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / (10.0 * nq.n), 6) AS recall
        FROM ranked LEFT JOIN bf ON bf.q_id = ranked.q_id
          AND bf.neighbor_id = ranked.neighbor_id
        CROSS JOIN nq
        GROUP BY np, nq.n ORDER BY nprobe""")),

    // binary-quantized retrieval: sign bits packed 32-per-word, Hamming
    // distance = XOR+popcount per word — all-integer, so the oracle
    // replays distances and ranks exactly
    ("emb_hamming_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val bits = Similarity.binarySign(Tables.spread(s, emb),
          "vec_id", "embedding")
        val qbits = Similarity.binarySign(emb.filter(col("vec_id") < 5),
            "vec_id", "embedding")
          .select(col("vec_id").as("q_id"), col("bits").as("q_bits"))
        Similarity.hammingTopK(bits, qbits, k = 10)
          .orderBy("q_id", "rank")
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        b AS (SELECT vec_id, list_transform(range(0, 2), w ->
            list_aggregate(list_transform(range(1, 33), j ->
              CASE WHEN e[CAST(w * 32 + j AS INT)] >= 0
                THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT) ELSE 0 END),
            'bit_or')) AS bits FROM v),
        q AS (SELECT vec_id AS q_id, bits AS qb FROM b WHERE vec_id < 5),
        sc AS (SELECT q.q_id, b.vec_id AS neighbor_id,
            CAST(bit_count(xor(b.bits[1], q.qb[1]))
              + bit_count(xor(b.bits[2], q.qb[2])) AS INT) AS hamming
          FROM b CROSS JOIN q WHERE b.vec_id != q.q_id),
        rk AS (SELECT q_id, neighbor_id, hamming, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY hamming ASC, neighbor_id ASC)
            AS INT) AS rank FROM sc)
        SELECT q_id, rank, neighbor_id, hamming FROM rk WHERE rank <= 10
        ORDER BY q_id, rank""")),

    // cascade retrieval: Hamming coarse filter (50 candidates) -> exact
    // cosine rescore of candidates only. Cosines ride integer-micro
    // VECTORS (dEmbMicro), so ranks are bit-equal; Hamming candidates
    // are integer-exact by construction
    ("ann_cascade_topk",
      (s, d) => {
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.cascadeTopK(Tables.spread(s, emb), q, coarseK = 50, k = 10)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("cos"), 6).as("cos"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dEmbMicro,
        b AS (SELECT vec_id, e, list_transform(range(0, 2), w ->
            list_aggregate(list_transform(range(1, 33), j ->
              CASE WHEN e[CAST(w * 32 + j AS INT)] >= 0
                THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT) ELSE 0 END),
            'bit_or')) AS bits FROM v),
        q AS (SELECT vec_id AS q_id, e AS qe, bits AS qb FROM b
          WHERE vec_id < 5),
        hm AS (SELECT q.q_id, b.vec_id AS neighbor_id, b.e,
            CAST(bit_count(xor(b.bits[1], q.qb[1]))
              + bit_count(xor(b.bits[2], q.qb[2])) AS INT) AS hamming
          FROM b CROSS JOIN q WHERE b.vec_id != q.q_id),
        cand AS (SELECT q_id, neighbor_id, e FROM (SELECT *, row_number()
            OVER (PARTITION BY q_id ORDER BY hamming ASC, neighbor_id ASC)
            AS rc FROM hm) WHERE rc <= 50),
        sc AS (SELECT cand.q_id, cand.neighbor_id,
            ${dDotI("cand.e", "q.qe")}
              / (sqrt(${dDotI("cand.e", "cand.e")})
                * sqrt(${dDotI("q.qe", "q.qe")})) AS cos
          FROM cand JOIN q USING (q_id)),
        rk AS (SELECT q_id, neighbor_id, cos, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS INT)
            AS rank FROM sc)
        SELECT q_id, rank, neighbor_id, round(cos, 6) AS cos
        FROM rk WHERE rank <= 10 ORDER BY q_id, rank""")),

    // recall@10 of the binary-Hamming coarse stage against the exact
    // cosine ground truth — the dial that sizes cascadeTopK's coarseK;
    // truth rides integer-micro vectors (bit-equal cosines), Hamming is
    // integer-exact by construction. r11: the ground-truth dots are
    // explicit BIGINT sums ([[dDotI]]) — see ann_recall_eval's note on
    // the driver-DuckDB `list_dot_product` flip this removes
    ("ann_hamming_recall",
      (s, d) => {
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10,
            microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        val bits = Similarity.binarySign(Tables.spread(s, emb),
          "vec_id", "embedding")
        val qbits = Similarity.binarySign(emb.filter(col("vec_id") < 5),
            "vec_id", "embedding")
          .select(col("vec_id").as("q_id"), col("bits").as("q_bits"))
        val approx = Similarity.hammingTopK(bits, qbits, k = 10)
          .select(col("q_id"), col("neighbor_id"), lit(1).as("__h"))
        truth.join(approx, Seq("q_id", "neighbor_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        b AS (SELECT vec_id, list_transform(range(0, 2), w ->
            list_aggregate(list_transform(range(1, 33), j ->
              CASE WHEN e[CAST(w * 32 + j AS INT)] >= 0
                THEN CAST(1 AS BIGINT) << CAST(j - 1 AS INT) ELSE 0 END),
            'bit_or')) AS bits FROM v),
        qb AS (SELECT vec_id AS q_id, bits AS qbb FROM b WHERE vec_id < 5),
        hm AS (SELECT q_id, neighbor_id FROM (SELECT qb.q_id,
            b.vec_id AS neighbor_id, row_number() OVER (PARTITION BY qb.q_id
              ORDER BY bit_count(xor(b.bits[1], qb.qbb[1]))
                + bit_count(xor(b.bits[2], qb.qbb[2])) ASC,
              b.vec_id ASC) AS rk
          FROM b CROSS JOIN qb WHERE b.vec_id != qb.q_id) WHERE rk <= 10)
        SELECT bf.q_id,
          CAST(sum(CASE WHEN hm.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN hm.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf LEFT JOIN hm ON hm.q_id = bf.q_id
          AND hm.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id ORDER BY bf.q_id""")),

    ("emb_neardup_lsh",
      (s, d) => {
        // integer-micro vectors (dEmbMicro): plane projections against the
        // ±1 hyperplanes are exact integer dots, so even the sign-bit
        // bucketing is engine-proof (a raw dot near 0 is a knife edge)
        val planes = Similarity.lshPlanes(nPlanes = 4, dim = 64)
        Similarity.cosineNearDupPairs(Tables.spread(s, qEmb(s, d)),
            "vec_id", "embedding", planes, threshold = 0.4)
          .orderBy("id1", "id2")
      },
      Some {
        val planes = Similarity.lshPlanes(nPlanes = 4, dim = 64)
        val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${dDotI("e", p.mkString("[", ",", "]"))} >= 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString(" + ")
        s"""WITH $dEmbMicro,
          b AS (SELECT vec_id, e, $bucketExpr AS bucket FROM v),
          pairs AS (SELECT a.vec_id AS id1, c.vec_id AS id2,
            ${dCosMicroI("a.e", "c.e")} AS qm
          FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
          SELECT id1, id2, qm / 1000000.0 AS cos
          FROM pairs WHERE qm >= 400000
          ORDER BY id1, id2"""
      }),

    // ------------------------------------------- embedding-space clustering

    // spherical k-means, 2 Lloyd iterations, deterministic seed (the 8
    // lowest vec_ids). Floats are quantized (floor(x*1e6+0.5)) so centroid
    // sums are exact order-free integer sums on both engines; affinities
    // and centroid components are then identical IEEE double sequences —
    // the assignment ints compare hash-exact. See Clustering.scala.
    ("cluster_topics",
      // BERTopic-style interpretable cluster labels: the emb_kmeans
      // semantic clusters, each labeled by its class-based tf-idf top
      // terms (keyphrases generalizes — the "document" is the cluster,
      // df becomes cluster frequency). One id join bridges the embedding
      // and text spaces; everything downstream is the two operators'
      // existing shapes
      (s, d) => {
        val assign = Clustering.kmeansAssign(
          Tables.spread(s, Tables.embeddings(s, d)),
          "vec_id", "embedding", k = 8, iters = 2)
        val byCluster = Tables.documents(s, d)
          .join(assign, col("doc_id") === col("vec_id"))
          .select(col("cluster"), col("text"))
        graft.pipeline.Ranking.keyphrases(byCluster, "cluster", "text",
            topK = 5)
          .select(col("cluster"), col("rank"), col("term"),
            round(col("score"), 6).as("score"))
          .orderBy("cluster", "rank")
      },
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        c1 AS ${dKmeansUpdate("a1", 64)},
        a2 AS ${dKmeansAssign("c1")},
        c2 AS ${dKmeansUpdate("a2", 64)},
        a3 AS ${dKmeansAssign("c2")},
        p AS (SELECT a3.c AS cluster, $dToks AS w
          FROM a3 JOIN documents ON doc_id = a3.vec_id),
        n AS (SELECT count(*) AS n_docs FROM p),
        tf AS (SELECT cluster, term, count(*) AS tf
          FROM (SELECT cluster, unnest(w) AS term FROM p)
          WHERE length(term) >= 4 GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        sc AS (SELECT tf.cluster, tf.term,
            CAST(floor((1.0 + ln(tf.tf)) * ln(n.n_docs / dfq.df)
              * 1000000.0 + 0.5) AS BIGINT) AS sq
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
        rk AS (SELECT cluster, term, sq, CAST(row_number() OVER (
            PARTITION BY cluster ORDER BY sq DESC, term ASC) AS INT) AS rank
          FROM sc)
        SELECT CAST(cluster AS INT) AS cluster, rank, term,
          round(sq / 1000000.0, 6) AS score
        FROM rk WHERE rank <= 5 ORDER BY cluster, rank""")),

    ("emb_quality_audit",
      // embedding-table health report: per label, dimension-drift and
      // zero-vector counts plus the mean norm. Vectors are micro-quantized
      // FIRST (quantize-the-vectors discipline): the squared norm is an
      // exact order-free integer sum on any engine, sqrt of it IS the
      // micro-norm, and the per-row floor(·+0.5) long rides an exact sum
      // so the mean is engine-exact
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select(col("label"), VF.microVec(col("embedding")).as("e"))
          .withColumn("dot", VF.dot(col("e"), col("e")))
        e.groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(when(size(col("e")) =!= 64, 1L).otherwise(0L)).as("bad_dim"),
            sum(when(col("dot") === 0.0, 1L).otherwise(0L)).as("zero_vecs"),
            sum(floor(sqrt(col("dot")) + 0.5).cast("long")).as("__nq"))
          .withColumn("mean_norm",
            round(col("__nq").cast("double") / col("n") / 1e6, 6))
          .drop("__nq")
          .orderBy("label")
      },
      Some(s"""WITH e AS (SELECT label,
          list_transform(CAST(embedding AS DOUBLE[]),
            y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS e
          FROM embeddings),
        x AS (SELECT label, e, ${dDotI("e", "e")} AS dot FROM e)
        SELECT label, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CASE WHEN len(e) != 64 THEN 1 ELSE 0 END) AS BIGINT)
            AS bad_dim,
          CAST(sum(CASE WHEN dot = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS zero_vecs,
          round(CAST(sum(CAST(floor(sqrt(dot) + 0.5) AS BIGINT))
            AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_norm
        FROM x GROUP BY 1 ORDER BY 1""")),

    ("dedup_report",
      // per-source duplication report: the corpus-health summary a
      // pipeline run emits before/after dedup; one aggregate pass
      (s, d) => Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(TF.normalize(col("text")))).as("n_distinct"))
        .withColumn("dup_fraction", round(
          (col("n_docs") - col("n_distinct")).cast("double") / col("n_docs"),
          6))
        .orderBy("source"),
      Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT md5($dNorm)) AS BIGINT) AS n_distinct,
        round(CAST(count(*) - count(DISTINCT md5($dNorm)) AS DOUBLE)
          / count(*), 6) AS dup_fraction
        FROM documents GROUP BY 1 ORDER BY 1""")),

    ("emb_kmeans",
      (s, d) => Clustering.kmeansAssign(
          Tables.spread(s, Tables.embeddings(s, d)),
          "vec_id", "embedding", k = 8, iters = 2)
        .orderBy("vec_id"),
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        c1 AS ${dKmeansUpdate("a1", 64)},
        a2 AS ${dKmeansAssign("c1")},
        c2 AS ${dKmeansUpdate("a2", 64)},
        a3 AS ${dKmeansAssign("c2")}
        SELECT vec_id, CAST(c AS INT) AS cluster FROM a3 ORDER BY vec_id""")),

    // Gonzalez farthest-point traversal (k-center 2-approx; the
    // deterministic k-means++ alternative): each round picks the vector
    // whose max cosine to the chosen set is minimum — better-spread
    // seeds than lowest-k-ids on a clustered corpus. k−1 corpus scans,
    // seeds inlined as broadcast literals, one argmin partial aggregate
    // per round; the emitted coverage cosine is the k-center radius curve
    ("emb_kcenter_seeds",
      (s, d) => Clustering.farthestPointSeeds(
          Tables.spread(s, Tables.embeddings(s, d)),
          "vec_id", "embedding", k = 4)
        .orderBy("rank"),
      Some(s"""WITH $dKmeansPrep,
        s1 AS (SELECT vec_id, q FROM v
          WHERE vec_id = (SELECT min(vec_id) FROM v)),
        a2 AS (SELECT v.vec_id, v.q,
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT) AS mx
          FROM v CROSS JOIN s1 WHERE v.vec_id != s1.vec_id),
        s2 AS (SELECT vec_id, q, mx FROM a2
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a3 AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id)),
        s3 AS (SELECT vec_id, q, mx FROM a3
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a4 AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s3.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id, s3.vec_id)),
        s4 AS (SELECT vec_id, mx FROM a4
          ORDER BY mx ASC, vec_id ASC LIMIT 1)
        SELECT 1 AS rank, vec_id, CAST(NULL AS BIGINT) AS max_cos_micro
          FROM s1
        UNION ALL SELECT 2, vec_id, mx FROM s2
        UNION ALL SELECT 3, vec_id, mx FROM s3
        UNION ALL SELECT 4, vec_id, mx FROM s4
        ORDER BY rank""")),

    // k-means seeded by the k-center traversal (the composition a
    // clustered corpus wants: spread seeds instead of lowest-k-ids,
    // then one Lloyd round) — seeds are k·dim driver metadata handed to
    // kmeansFitSeeded, so the corpus-side cost model is unchanged
    ("emb_kmeans_kcenter",
      (s, d) => {
        val emb = Tables.spread(s, Tables.embeddings(s, d))
        val seedIds = Clustering.farthestPointSeeds(
            emb, "vec_id", "embedding", k = 4)
          .orderBy("rank").collect()
          .map(r => (r.getInt(0) - 1, r.getLong(1)))
        val ids = seedIds.map(_._2)
        val vecs = emb.filter(col("vec_id").isin(ids: _*))
          .select(col("vec_id"), Clustering.quantize(col("embedding")).as("q"))
          .collect()
          .map(r => r.getLong(0) ->
            r.getAs[scala.collection.Seq[Long]]("q").toSeq).toMap
        val seeds = seedIds.map { case (c, id) => c -> vecs(id) }.toSeq
        Clustering.kmeansFitSeeded(emb, "vec_id", "embedding", seeds,
            iters = 1)._1
          .orderBy("vec_id")
      },
      Some(s"""WITH $dKmeansPrep,
        s1 AS (SELECT vec_id, q FROM v
          WHERE vec_id = (SELECT min(vec_id) FROM v)),
        a2k AS (SELECT v.vec_id, v.q,
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT) AS mx
          FROM v CROSS JOIN s1 WHERE v.vec_id != s1.vec_id),
        s2 AS (SELECT vec_id, q, mx FROM a2k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a3k AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id)),
        s3 AS (SELECT vec_id, q, mx FROM a3k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a4k AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s3.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id, s3.vec_id)),
        s4 AS (SELECT vec_id, q FROM a4k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        c0 AS (SELECT 0 AS c, q AS cq FROM s1
          UNION ALL SELECT 1, q FROM s2
          UNION ALL SELECT 2, q FROM s3
          UNION ALL SELECT 3, q FROM s4),
        a1 AS ${dKmeansAssign("c0")},
        c1 AS ${dKmeansUpdate("a1", 64)},
        a2 AS ${dKmeansAssign("c1")}
        SELECT vec_id, CAST(c AS INT) AS cluster FROM a2
        ORDER BY vec_id""")),

    // the seeding A/B that justifies the k-center traversal: mean
    // assigned cosine (fit quality) after one identical Lloyd round
    // under lowest-k-ids vs farthest-point seeds. Per-vector scores are
    // micro-quantized before the exact integer mean — one division per
    // row of a 2-row output
    ("emb_seeding_quality",
      (s, d) => {
        import s.implicits._
        val emb = Tables.spread(s, Tables.embeddings(s, d))
        def quality(fit: (org.apache.spark.sql.DataFrame, Seq[(Int, Seq[Long])]),
            name: String) = {
          val (cells, cents) = fit
          val centDf = cents.toDF("cluster", "cq")
          emb.join(cells, "vec_id").join(broadcast(centDf), "cluster")
            .withColumn("__qv", VF.microVec(col("embedding")))
            .withColumn("__qm", floor(VF.dot(col("__qv"), col("cq")) /
              (VF.norm(col("__qv")) * VF.norm(col("cq")))
              * lit(1e6) + lit(0.5)).cast("long"))
            .agg(count(lit(1)).as("n"), sum("__qm").as("sm"))
            .select(lit(name).as("seeding"), col("n"),
              round(col("sm") / col("n") / lit(1e6), 6).as("mean_cos"))
        }
        val seedIds = Clustering.farthestPointSeeds(
            emb, "vec_id", "embedding", k = 4)
          .orderBy("rank").collect()
          .map(r => (r.getInt(0) - 1, r.getLong(1)))
        val vecs = emb.filter(col("vec_id").isin(seedIds.map(_._2): _*))
          .select(col("vec_id"), Clustering.quantize(col("embedding")).as("q"))
          .collect()
          .map(r => r.getLong(0) ->
            r.getAs[scala.collection.Seq[Long]]("q").toSeq).toMap
        val kseeds = seedIds.map { case (c, id) => c -> vecs(id) }.toSeq
        quality(Clustering.kmeansFitSeeded(emb, "vec_id", "embedding",
            kseeds, iters = 1), "kcenter")
          .unionByName(quality(Clustering.kmeansFit(emb, "vec_id",
            "embedding", k = 4, iters = 1), "lowest_ids"))
          .orderBy("seeding")
      },
      Some(s"""WITH $dKmeansPrep,
        l0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 4),
        la1 AS ${dKmeansAssign("l0")},
        lc1 AS ${dKmeansUpdate("la1", 64)},
        la2 AS ${dKmeansAssign("lc1")},
        lsc AS (SELECT CAST(${dCosMicroI("v.q", "lc1.cq")} AS BIGINT) AS qm
          FROM la2 JOIN v USING (vec_id) JOIN lc1 ON lc1.c = la2.c),
        lagg AS (SELECT 'lowest_ids' AS seeding,
            CAST(count(*) AS BIGINT) AS n,
            round(sum(qm) / count(*) / 1000000.0, 6) AS mean_cos FROM lsc),
        s1 AS (SELECT vec_id, q FROM v
          WHERE vec_id = (SELECT min(vec_id) FROM v)),
        a2k AS (SELECT v.vec_id, v.q,
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT) AS mx
          FROM v CROSS JOIN s1 WHERE v.vec_id != s1.vec_id),
        s2 AS (SELECT vec_id, q, mx FROM a2k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a3k AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id)),
        s3 AS (SELECT vec_id, q, mx FROM a3k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        a4k AS (SELECT v.vec_id, v.q, greatest(
            CAST(${dCosMicroI("v.q", "s1.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s2.q")} AS BIGINT),
            CAST(${dCosMicroI("v.q", "s3.q")} AS BIGINT)) AS mx
          FROM v CROSS JOIN s1 CROSS JOIN s2 CROSS JOIN s3
          WHERE v.vec_id NOT IN (s1.vec_id, s2.vec_id, s3.vec_id)),
        s4 AS (SELECT vec_id, q FROM a4k
          ORDER BY mx ASC, vec_id ASC LIMIT 1),
        kc0 AS (SELECT 0 AS c, q AS cq FROM s1
          UNION ALL SELECT 1, q FROM s2
          UNION ALL SELECT 2, q FROM s3
          UNION ALL SELECT 3, q FROM s4),
        ka1 AS ${dKmeansAssign("kc0")},
        kc1 AS ${dKmeansUpdate("ka1", 64)},
        ka2 AS ${dKmeansAssign("kc1")},
        ksc AS (SELECT CAST(${dCosMicroI("v.q", "kc1.cq")} AS BIGINT) AS qm
          FROM ka2 JOIN v USING (vec_id) JOIN kc1 ON kc1.c = ka2.c),
        kagg AS (SELECT 'kcenter' AS seeding,
            CAST(count(*) AS BIGINT) AS n,
            round(sum(qm) / count(*) / 1000000.0, 6) AS mean_cos FROM ksc)
        SELECT * FROM kagg UNION ALL SELECT * FROM lagg
        ORDER BY seeding""")),

    // embedding-space outliers: the 50 vectors least aligned with their
    // own fitted centroid (cosine to the cluster mean after one Lloyd
    // iteration) — the embedding-QA sweep that catches corrupt or
    // out-of-distribution vectors before they poison ANN/clustering
    ("emb_outliers",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val (cells, cents) = Clustering.kmeansFit(
          Tables.spread(s, emb), "vec_id", "embedding", k = 8, iters = 1)
        val centDf = cents.toDF("cluster", "cq")
        // rank + emitted score on integer micro-units over EXACT integer
        // dots (micro corpus vector × integer-micro fitted centroid — the
        // dCosMicroI spelling): no accumulation-order dependence anywhere,
        // so the 50-row cutoff and every rounded digit are engine-proof
        emb.join(cells, "vec_id").join(broadcast(centDf), "cluster")
          .withColumn("__qv", VF.microVec(col("embedding")))
          .withColumn("__qm", floor(VF.dot(col("__qv"), col("cq")) /
            (VF.norm(col("__qv")) * VF.norm(col("cq")))
            * lit(1e6) + lit(0.5)))
          .orderBy(col("__qm").asc, col("vec_id").asc)
          .limit(50)
          .select(col("vec_id"), col("cluster"),
            (col("__qm") / lit(1e6)).as("aff"))
      },
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        c1 AS ${dKmeansUpdate("a1", 64)},
        a2 AS ${dKmeansAssign("c1")},
        sc AS (SELECT a2.vec_id, a2.c AS cluster,
            ${dCosMicroI("v.q", "c1.cq")} AS qm
          FROM a2 JOIN v USING (vec_id) JOIN c1 ON c1.c = a2.c),
        rk AS (SELECT vec_id, cluster, qm,
            row_number() OVER (ORDER BY qm ASC, vec_id ASC) AS rn FROM sc)
        SELECT vec_id, CAST(cluster AS INT) AS cluster,
          qm / 1000000.0 AS aff
        FROM rk WHERE rn <= 50 ORDER BY rn""")),

    // centroid-silhouette clustering quality: per cluster, the mean of
    // (cosine to own centroid − best cosine to any other) — the
    // separation report read before trusting SemDeDup/IVF cell
    // boundaries; micro-quantized per-vector scores, exact integer mean
    ("emb_silhouette",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val (cells, cents) = Clustering.kmeansFit(
          Tables.spread(s, emb), "vec_id", "embedding", k = 8, iters = 1)
        val centDf = cents.toDF("c", "cq")
        // affinities ride exact integer dots (micro vector × micro
        // centroid): the raw double below is a deterministic function of
        // identical integer operands on any engine
        val aff = emb.join(cells, "vec_id")
          .withColumn("__qv", VF.microVec(col("embedding")))
          .crossJoin(broadcast(centDf))
          .select(col("vec_id"), col("cluster"), col("c"),
            (VF.dot(col("__qv"), col("cq")) /
              (VF.norm(col("__qv")) * VF.norm(col("cq")))).as("aff"))
        aff.groupBy("vec_id", "cluster")
          .agg(max(when(col("c") === col("cluster"), col("aff"))).as("own"),
            max(when(col("c") =!= col("cluster"), col("aff"))).as("oth"))
          .select(col("cluster"),
            round((col("own") - col("oth")) * 1e6).cast("long").as("sq"))
          .groupBy("cluster")
          .agg(count(lit(1)).as("n"), sum("sq").as("ssq"))
          .select(col("cluster"), col("n"),
            round(col("ssq").cast("double") / col("n") / 1e6, 6)
              .as("mean_sep"))
          .orderBy("cluster")
      },
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        c1 AS ${dKmeansUpdate("a1", 64)},
        a2 AS ${dKmeansAssign("c1")},
        aff AS (SELECT a2.vec_id, a2.c AS cluster, c1.c AS cc,
            ${dDotI("v.q", "c1.cq")}
              / (sqrt(${dDotI("v.q", "v.q")})
                * sqrt(${dDotI("c1.cq", "c1.cq")})) AS aff
          FROM a2 JOIN v USING (vec_id) CROSS JOIN c1),
        sc AS (SELECT vec_id, cluster,
            CAST(round((max(CASE WHEN cc = cluster THEN aff END)
              - max(CASE WHEN cc != cluster THEN aff END)) * 1000000)
              AS BIGINT) AS sq
          FROM aff GROUP BY 1, 2)
        SELECT CAST(cluster AS INT) AS cluster,
          CAST(count(*) AS BIGINT) AS n,
          round(CAST(sum(sq) AS DOUBLE) / count(*) / 1000000.0, 6)
            AS mean_sep
        FROM sc GROUP BY 1 ORDER BY cluster""")),

    // SemDeDup (arXiv:2303.09540): cluster against the seed centroids,
    // then inside each cluster drop any member with a lower-id neighbor at
    // cosine >= 0.4 (greedy keep-first, like the rest of the dedup family)
    ("dedup_semantic",
      (s, d) => Clustering.semanticDedup(
          Tables.spread(s, Tables.embeddings(s, d)),
          "vec_id", "embedding", k = 8, threshold = 0.4)
        .orderBy("vec_id"),
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        a1 AS ${dKmeansAssign("c0")},
        m AS (SELECT a1.vec_id, a1.c, v.q FROM a1 JOIN v USING (vec_id)),
        drops AS (SELECT DISTINCT b.vec_id FROM m a JOIN m b
          ON a.c = b.c AND a.vec_id < b.vec_id
          WHERE ${dCosMicroI("a.q", "b.q")} >= 400000)
        SELECT m.vec_id, CAST(m.c AS INT) AS cluster,
          dr.vec_id IS NULL AS kept
        FROM m LEFT JOIN drops dr ON dr.vec_id = m.vec_id
        ORDER BY m.vec_id""")),

    // ------------------------------------------------ multimodal plumbing

    ("multimodal_features",
      (s, d) => {
        // the stub codec's byte-histogram feature is deterministic in the
        // content bytes, so DuckDB can recompute it: f0 is the count of
        // bytes with (b & 7) == 0, recovered exactly from the float ratio
        // by multiplying back the byte length (counts are exact in f32)
        import s.implicits._
        val docs = Tables.documents(s, d)
        val assets = Multimodal.syntheticAssets(s, docs)
        val blen = docs.select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).as("blen"))
        Multimodal.extractImageFeatures(assets)
          .join(blen, col("asset_id") === col("doc_id"))
          .select(col("asset_id"), col("width"), col("height"),
            round(element_at(col("feature"), 1).cast("double") * col("blen"))
              .cast("long").as("f0_count"))
          .orderBy("asset_id")
      },
      Some("""WITH img AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
        ch AS (SELECT doc_id, ascii(unnest(string_split(text, ''))) AS b FROM img),
        cnt AS (SELECT doc_id, CAST(count(*) FILTER (WHERE b % 8 = 0) AS BIGINT)
          AS f0_count FROM ch GROUP BY 1)
        SELECT i.doc_id AS asset_id, CAST(i.doc_id % 64 + 16 AS INT) AS width,
          CAST(i.doc_id % 48 + 16 AS INT) AS height,
          coalesce(c.f0_count, 0) AS f0_count
        FROM img i LEFT JOIN cnt c USING (doc_id) ORDER BY 1""")),

    // perceptual-hash bucketing over the decoded image features (aHash:
    // bit per histogram cell above the mean) — the binary-column dedup
    // entry point; codes + bucket sizes here, pair expansion deferred to
    // the sparse-bucket production hash (see Multimodal.aHashCode)
    ("multimodal_phash",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val assets = Multimodal.syntheticAssets(s, docs)
        val blen = docs.select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).as("blen"))
        val coded = Multimodal.extractImageFeatures(assets)
          .join(blen, col("asset_id") === col("doc_id"))
          .select(col("asset_id"),
            Multimodal.aHashCode(col("feature"), col("blen")).as("code"))
        coded.join(coded.groupBy("code").agg(count(lit(1)).as("bucket_n")),
            "code")
          .select(col("asset_id"), col("code"), col("bucket_n"))
          .orderBy("asset_id")
      },
      Some("""WITH img AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 3 = 0),
        ch AS (SELECT doc_id, ascii(unnest(string_split(text, ''))) AS b
          FROM img),
        hist AS (SELECT doc_id, b % 8 AS k, count(*) AS c
          FROM ch GROUP BY 1, 2),
        bl AS (SELECT doc_id, length(text) AS blen FROM img),
        code AS (SELECT bl.doc_id, CAST(coalesce(
            sum(CASE WHEN c * 8 > blen THEN (1 << k) END), 0) AS BIGINT)
            AS code
          FROM bl LEFT JOIN hist ON hist.doc_id = bl.doc_id
          GROUP BY bl.doc_id, blen),
        bk AS (SELECT code, count(*) AS bucket_n FROM code GROUP BY 1)
        SELECT doc_id AS asset_id, code.code, bk.bucket_n
        FROM code JOIN bk USING (code) ORDER BY asset_id""")),

    // image near-dup pairs via banded LSH over the perceptual hash: the
    // code splits into 2 nibble bands (pigeonhole: Hamming <= 1 implies
    // at least one band matches exactly), candidates meet in band
    // buckets, survivors verify by exact popcount. The MinHash-LSH shape
    // transplanted to images — one shuffle on (band, key), in-bucket
    // expansion only, never all-pairs. The stub 8-bit aHash keeps bucket
    // counts small here; a production 64-bit pHash uses 4x16-bit bands
    // (same plan, better selectivity)
    ("multimodal_phash_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val assets = Multimodal.syntheticAssets(s, docs)
        val blen = docs.select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).as("blen"))
        val coded = Multimodal.extractImageFeatures(assets)
          .join(blen, col("asset_id") === col("doc_id"))
          .select(col("asset_id"),
            Multimodal.aHashCode(col("feature"), col("blen")).as("code"))
        val banded = coded.select(col("asset_id"), col("code"),
            explode(array(
              struct(lit(0).as("band"), (col("code") % 16).as("key")),
              struct(lit(1).as("band"),
                shiftright(col("code"), 4).as("key")))).as("b"))
          .select(col("asset_id"), col("code"),
            col("b.band").as("band"), col("b.key").as("key"))
        val l = banded.select(col("band"), col("key"),
          col("asset_id").as("id1"), col("code").as("c1"))
        val r = banded.select(col("band"), col("key"),
          col("asset_id").as("id2"), col("code").as("c2"))
        l.join(r, Seq("band", "key")).filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2"), col("c1"), col("c2")).distinct()
          .select(bit_count(col("c1").bitwiseXOR(col("c2"))).as("ham"))
          .filter(col("ham") <= 1)
          .groupBy("ham").agg(count(lit(1)).as("n_pairs"))
          .orderBy("ham")
      },
      Some("""WITH img AS (SELECT doc_id, text FROM documents
          WHERE doc_id % 3 = 0),
        ch AS (SELECT doc_id, ascii(unnest(string_split(text, ''))) AS b
          FROM img),
        hist AS (SELECT doc_id, b % 8 AS k, count(*) AS c
          FROM ch GROUP BY 1, 2),
        bl AS (SELECT doc_id, length(text) AS blen FROM img),
        code AS (SELECT bl.doc_id, CAST(coalesce(
            sum(CASE WHEN c * 8 > blen THEN (1 << k) END), 0) AS BIGINT)
            AS code
          FROM bl LEFT JOIN hist ON hist.doc_id = bl.doc_id
          GROUP BY bl.doc_id, blen),
        banded AS (SELECT doc_id, code, 0 AS band, code % 16 AS key FROM code
          UNION ALL SELECT doc_id, code, 1, code // 16 FROM code),
        pairs AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
            a.code AS c1, b.code AS c2
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        SELECT CAST(bit_count(xor(c1, c2)) AS INT) AS ham,
          CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs WHERE bit_count(xor(c1, c2)) <= 1
        GROUP BY 1 ORDER BY 1""")),

    ("multimodal_frames",
      (s, d) => {
        import s.implicits._
        val assets = Multimodal.syntheticAssets(s, Tables.documents(s, d))
        Multimodal.sampleVideoFrames(assets, framesPerVideo = 4)
          .select(col("asset_id"), col("frame_idx"), length(col("content")).as("frame_bytes"))
          .orderBy("asset_id", "frame_idx")
      },
      // the stub samples n byte-slices of stride max(1, len/4): frame i
      // covers [i*stride, min(len, (i+1)*stride)) — pure arithmetic on
      // octet_length, reproduced below
      Some("""WITH vid AS (SELECT doc_id, octet_length(encode(text)) AS len
          FROM documents WHERE doc_id % 3 = 2),
        fr AS (SELECT doc_id, len, greatest(len // 4, 1) AS stride,
          unnest(range(least(4, len))) AS frame_idx FROM vid)
        SELECT doc_id AS asset_id, CAST(frame_idx AS INT) AS frame_idx,
          CAST(least(len, frame_idx * stride + stride) - frame_idx * stride AS INT)
            AS frame_bytes
        FROM fr ORDER BY 1, 2""")),

    // ------------------------------------------- sampling / decontamination

    // deterministic hash sampling: membership is a property of the row
    // (md5-derived hash60 of the key), so the oracle reproduces the exact
    // member set — impossible with rand()-based sampling
    ("sample_deterministic",
      (s, d) => graft.pipeline.Sampling.deterministicSample(
          Tables.documents(s, d), "doc_id", keep = 37)
        .select(col("doc_id"), col("lang")).orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${dHash60("CAST(doc_id AS VARCHAR)")} % 100 < 37
        ORDER BY doc_id""")),

    ("sample_stratified",
      (s, d) => graft.pipeline.Sampling.stratifiedSample(
          Tables.documents(s, d), strataCol = "lang", keyCol = "doc_id",
          rates = Map("en" -> 10, "de" -> 50), defaultKeep = 100)
        .select(col("doc_id"), col("lang")).orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang FROM documents
        WHERE ${dHash60("CAST(doc_id AS VARCHAR)")} % 100 <
          CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 50 ELSE 100 END
        ORDER BY doc_id""")),

    // benchmark decontamination: distinct 3-gram-shingle overlap of every
    // document against a synthetic benchmark subset (doc_id % 13 = 0);
    // shingle-less docs stay in the output with zero overlap
    ("decontaminate",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        graft.pipeline.Sampling.decontaminate(
            docs, docs.filter(col("doc_id") % 13 === 0), "doc_id", "text",
            n = 3, threshold = 0.2)
          .orderBy("doc_id")
      },
      Some(s"""WITH $dShingles,
        h AS (SELECT doc_id, ${dHash60("s")} AS h FROM sh),
        bh AS (SELECT DISTINCT h FROM h WHERE doc_id % 13 = 0),
        agg AS (SELECT d.doc_id,
            CAST(count(h.h) AS BIGINT) AS n_shingles,
            CAST(count(CASE WHEN bh.h IS NOT NULL THEN 1 END)
              AS BIGINT) AS n_overlap
          FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
          LEFT JOIN bh ON h.h = bh.h GROUP BY 1)
        SELECT doc_id, n_shingles, n_overlap,
          round(n_overlap * 1.0 / greatest(n_shingles, 1), 6) AS overlap,
          n_overlap * 1.0 / greatest(n_shingles, 1) >= 0.2 AS contaminated
        FROM agg ORDER BY doc_id""")),

    // weight-proportional Bernoulli sampling: P(keep) = rate·quality via
    // an EXACT integer test (hash ppm vs quality ppm scaled by the 3/5
    // rational rate) — importance sampling whose member set any engine
    // reproduces bit-exactly; zero shuffles (pure filter on the scan)
    ("sample_weighted",
      (s, d) => Sampling.weightedSample(
          Tables.documents(s, d).select(col("doc_id"), col("lang"),
            TF.qualityScore(col("text")).as("q")),
          "doc_id", "q", rateNum = 3, rateDen = 5)
        .orderBy("doc_id"),
      Some(s"""WITH q AS (SELECT doc_id, lang, $dQuality AS q FROM documents)
        SELECT doc_id, lang, q FROM q
        WHERE (${dHash60("CAST(doc_id AS VARCHAR)")} % 1000000) * 5
          < CAST(round(q * 1000000) AS BIGINT) * 3
        ORDER BY doc_id""")),

    // exact-size WEIGHTED sampling (Efraimidis-Spirakis A-ES): 5 docs
    // per language drawn with probability proportional to quality, via
    // the deterministic ln(u)/w key — reservoir guarantees without RNG;
    // the oracle replays the identical nano-quantized keys
    ("sample_weighted_fixed",
      (s, d) => Sampling.weightedFixedSample(
          Tables.documents(s, d).select(col("doc_id"), col("lang"),
            round(TF.qualityScore(col("text")), 6).as("q")),
          "lang", "doc_id", "q", n = 5)
        .orderBy("lang", "rank"),
      Some(s"""WITH q AS (SELECT doc_id, lang, $dQuality AS q FROM documents),
        k AS (SELECT doc_id, lang, CAST(round(
            ln((${dHash60("CAST(doc_id AS VARCHAR)")} + 1.0)
              / 1152921504606846976) / q * 1000000000) AS BIGINT) AS kq
          FROM q WHERE q > 0),
        r AS (SELECT lang, doc_id, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY kq DESC, doc_id ASC) AS INT) AS rank
          FROM k)
        SELECT lang, rank, doc_id FROM r WHERE rank <= 5
        ORDER BY lang, rank""")),

    // feature-hashing vectorizer (the hashing trick: Weinberger et al.
    // 2009) — fixed-width hashed token count vectors, the front end of
    // every cheap linear classifier over unbounded vocabularies; the
    // sparse vector compares as an md5 digest of its (bucket:count) runs
    ("text_hash_features",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode_outer(TF.tokens(col("text"))).as("t"))
        .filter(col("t").isNotNull)
        .withColumn("b", pmod(TF.hash60(col("t")), lit(64L)))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nnz"), sum("c").as("n_tokens"),
          sort_array(collect_list(struct(col("b"), col("c")))).as("bc"))
        .select(col("doc_id"), col("nnz"), col("n_tokens"),
          md5(array_join(transform(col("bc"),
            x => concat_ws(":", x.getField("b"), x.getField("c"))), ","))
            .as("vec_md5"))
        .orderBy("doc_id"),
      Some(s"""WITH occ AS (SELECT doc_id, ${dHash60("tok")} % 64 AS b
          FROM (SELECT doc_id, unnest($dToks) AS tok FROM documents)),
        c AS (SELECT doc_id, b, count(*) AS c FROM occ GROUP BY 1, 2)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nnz,
          CAST(sum(c) AS BIGINT) AS n_tokens,
          md5(array_to_string(list(b || ':' || c ORDER BY b), ','))
            AS vec_md5
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    // data mixing with fractional epoch upsampling: de×2.5, fr×2, zh×0.5,
    // rest ×1 — one (doc, epoch) row per training appearance. The ×0.5
    // stratum exercises the rows-dropped path, ×2.5 the deterministic
    // half-extra-epoch hash test; all arithmetic is integer ppm
    ("corpus_mix",
      (s, d) => Sampling.mixEpochs(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "lang", "doc_id",
          Map("de" -> 2500000L, "fr" -> 2000000L, "zh" -> 500000L))
        .orderBy("doc_id", "epoch"),
      Some(s"""WITH e AS (SELECT doc_id, lang, CASE lang
            WHEN 'de' THEN 2500000 WHEN 'fr' THEN 2000000
            WHEN 'zh' THEN 500000 ELSE 1000000 END AS ppm FROM documents),
        n AS (SELECT doc_id, lang, ppm // 1000000
            + CASE WHEN (${dHash60("CAST(doc_id AS VARCHAR)")} % 1000000)
                < ppm % 1000000 THEN 1 ELSE 0 END AS reps FROM e)
        SELECT doc_id, lang, CAST(unnest(range(reps)) AS BIGINT) AS epoch
        FROM n WHERE reps > 0 ORDER BY doc_id, epoch""")),

    // scalar int8 quantization of the embedding corpus: per-dimension
    // min/max codebook (dim-sized stats frame -> broadcast array
    // literals, zero-shuffle encode). Codes are bit-reproducible affine
    // math, so the md5 digest of the code array compares hash-exact
    ("emb_quantize_int8",
      (s, d) => Quantization.quantizeInt8(s, Tables.embeddings(s, d),
          "vec_id", "embedding")
        .select(col("vec_id"),
          size(col("codes")).as("n_dims"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("code_sum"),
          md5(encode(array_join(col("codes"), ","), "UTF-8")).as("codes_md5"))
        .orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings),
        st AS (SELECT d, min(e[d]) AS mn, max(e[d]) AS mx
          FROM v CROSS JOIN (SELECT unnest(range(1, 65)) AS d) GROUP BY d),
        arrs AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
          FROM st),
        codes AS (SELECT vec_id, list_transform(range(1, 65),
            i -> CASE WHEN mxs[i] = mns[i] THEN 0
              ELSE least(255, greatest(0, CAST(floor(
                (e[i] - mns[i]) * 255.0 / (mxs[i] - mns[i]) + 0.5) AS BIGINT)))
              END) AS c
          FROM v CROSS JOIN arrs)
        SELECT vec_id, CAST(len(c) AS INT) AS n_dims,
          CAST(list_aggregate(c, 'sum') AS BIGINT) AS code_sum,
          md5(array_to_string(c, ',')) AS codes_md5
        FROM codes ORDER BY vec_id""")),

    // self-trained Naive Bayes language classifier: per-class token
    // counts + add-α smoothing, every log-likelihood quantized to integer
    // micro-bits BEFORE summation so document scores are exact integer
    // sums and the argmax compares identically across engines.
    // Contract hardening (r8 verdict): the raw micro-bit sum is NOT
    // engine-version-proof — a 1-ulp log2 difference at a round() .5
    // boundary shifts one term by 1 and the driver's DuckDB build landed
    // on the other side. The exposed score is therefore coarsened to
    // MILLI-bits (floor(score_q / 1000)): a ±1-micro per-term wobble can
    // flip the exposed value only if the sum sits exactly on a multiple
    // of 1000, removing the boundary from the contract while keeping the
    // score comparable across runs. `pred` stays the exact integer argmax
    // (corpus_lang_confusion pins its stability separately).
    ("text_nb_lang",
      (s, d) => LanguageModel.naiveBayesClassify(
          Tables.documents(s, d), "doc_id", "lang", "text")
        .select(col("doc_id"), col("pred"),
          floor(col("score_q") / lit(1000)).cast("long").as("score_mb"))
        .orderBy("doc_id"),
      Some(s"""WITH p AS (SELECT doc_id, lang, $dToks AS w FROM documents),
        occ AS (SELECT doc_id, unnest(w) AS t FROM p),
        ct AS (SELECT lang AS c, t, count(*) AS ct
          FROM (SELECT lang, unnest(w) AS t FROM p) GROUP BY 1, 2),
        tot AS (SELECT c, sum(ct) AS n FROM ct GROUP BY 1),
        vv AS (SELECT count(DISTINCT t) AS v FROM occ),
        pr AS (SELECT lang AS c, CAST(round(log2(count(*)
            / (SELECT count(*) * 1.0 FROM p)) * 1000000) AS BIGINT) AS prior_q
          FROM p GROUP BY 1),
        sc AS (SELECT occ.doc_id, tot.c, pr.prior_q
            + sum(CAST(round(log2((coalesce(ct.ct, 0) + 0.5)
              / (tot.n + 0.5 * vv.v)) * 1000000) AS BIGINT)) AS score_q
          FROM occ CROSS JOIN tot CROSS JOIN vv
          LEFT JOIN ct ON ct.c = tot.c AND ct.t = occ.t
          JOIN pr ON pr.c = tot.c
          GROUP BY occ.doc_id, tot.c, pr.prior_q),
        rk AS (SELECT doc_id, c, score_q, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_q DESC, c ASC) AS rk FROM sc)
        SELECT doc_id, c AS pred,
          CAST(floor(score_q / 1000.0) AS BIGINT) AS score_mb
        FROM rk WHERE rk = 1
        ORDER BY doc_id""")),

    // Zipf-law fit over the top-100 token frequencies: one-row corpus
    // health metric; (ln rank, ln freq) pairs quantized to integer
    // micro-units so the normal-equation sums are exact in any engine
    ("text_zipf",
      (s, d) => Ranking.zipfFit(Tables.documents(s, d), "text", topN = 100),
      Some("""WITH cnts AS (SELECT tok, count(*) AS cnt
          FROM (SELECT unnest(regexp_split_to_array(
              regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
            FROM documents)
          GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 100),
        rk AS (SELECT tok, cnt, row_number() OVER (ORDER BY cnt DESC, tok)
          AS rank FROM cnts),
        q AS (SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS xq,
            CAST(round(ln(cnt) * 1000000) AS BIGINT) AS yq FROM rk),
        a AS (SELECT count(*) AS n, sum(xq) AS sx, sum(yq) AS sy,
            sum(xq * yq) AS sxy, sum(xq * xq) AS sxx FROM q)
        SELECT CAST(n AS BIGINT) AS n_terms,
          round((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
          round(((sy - (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx) * sx)
            / n) / 1000000.0, 6) AS intercept_ln
        FROM a""")),

    // winnowing fingerprints (MOSS): min-hash of each sliding window of 4
    // trigram hashes — ~2/(w+1) density with a guaranteed detection
    // length; pairs sharing >= 8 fingerprints, exact inverted-index count.
    // The df cap (64) excludes corpus-ubiquitous fingerprints from pair
    // counting on BOTH engines — min-hash selection concentrates on
    // globally small hash values, so without the cap this synthetic
    // small-vocabulary corpus degenerates to quadratic buckets; a
    // fingerprint shared by >64 documents is boilerplate, not near-dup
    // evidence
    ("dedup_winnow",
      (s, d) => DocDedup.winnowPairs(Tables.spread(s, Tables.documents(s, d)),
          "doc_id", "text", n = 3, w = 4, minShared = 8, maxFpDf = 64)
        .select(col("id1"), col("id2"), col("n1"), col("n2"), col("shared"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id1", "id2"),
      Some(s"""WITH toks AS (SELECT doc_id, $dToks AS tk FROM documents),
        ng AS (SELECT doc_id, CASE WHEN len(tk) >= 3 THEN list_filter(
            list_transform(range(1, len(tk) - 1),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]),
            s -> length(s) > 0) ELSE [] END AS gs FROM toks),
        hs AS (SELECT doc_id, list_transform(gs, s -> ${dHash60("s")}) AS h
          FROM ng),
        fp0 AS (SELECT doc_id, CASE
            WHEN len(h) >= 4 THEN list_distinct(list_transform(
              range(0, len(h) - 3), i -> list_min(h[i+1:i+4])))
            WHEN len(h) > 0 THEN [list_min(h)]
            ELSE [] END AS fps FROM hs),
        fpr AS (SELECT doc_id, unnest(fps) AS fp FROM fp0),
        sizes AS (SELECT doc_id, count(*) AS nf FROM fpr GROUP BY 1),
        rare AS (SELECT fp FROM fpr GROUP BY fp HAVING count(*) <= 64),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS shared
          FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
          WHERE a.fp IN (SELECT fp FROM rare)
          GROUP BY 1, 2)
        SELECT id1, id2, s1.nf AS n1, s2.nf AS n2, shared,
          round(shared * 1.0 / least(s1.nf, s2.nf), 6) AS containment
        FROM pairs JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2
        WHERE shared >= 8 ORDER BY id1, id2""")),

    // embedding-space decontamination: max cosine of every corpus vector
    // against the broadcast benchmark subset (vec_id % 13 = 0) — the
    // paraphrase-robust twin of the n-gram decontaminate
    ("decontaminate_semantic",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Sampling.decontaminateSemantic(emb,
            emb.filter(col("vec_id") % 13 === 0), "vec_id", "embedding",
            threshold = 0.4)
          .orderBy("vec_id")
      },
      // max-of-quantized == quantized-of-max (floor is monotone), so the
      // oracle maxes the per-pair micro cosine — exact integer dots, the
      // dCosMicroI spelling the Spark side mirrors
      Some(s"""WITH $dEmbMicro,
        b AS (SELECT e AS be FROM v WHERE vec_id % 13 = 0),
        m AS (SELECT vec_id, max(${dCosMicroI("e", "be")}) AS qmax
          FROM v CROSS JOIN b GROUP BY vec_id)
        SELECT vec_id, qmax / 1000000.0 AS max_cos,
          qmax >= 400000 AS contaminated
        FROM m ORDER BY vec_id""")),

    // incremental dedup: a "new batch" (doc_id % 7 = 0) matched against
    // the LSH index of the rest of the corpus — only the batch is
    // shingled/signed at query time; the index join broadcasts the small
    // batch side. Oracle = exact cross-set Jaccard closure (same LSH
    // recall-gap tolerance as dedup_components, documented there)
    ("dedup_incremental",
      (s, d) => {
        val docs = Tables.spread(s, Tables.documents(s, d))
        val corpus = docs.filter(col("doc_id") % 7 =!= 0)
        val batch = docs.filter(col("doc_id") % 7 === 0)
        val p = DocDedup.MinHashParams(numPerms = 32, bands = 16)
        val idx = DocDedup.lshIndex(corpus, "doc_id", "text", n = 3, p)
        DocDedup.incrementalNearDups(corpus, idx, batch, "doc_id", "text",
            n = 3, threshold = 0.7, p)
          .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
          .orderBy("id1", "id2")
      },
      Some(s"""WITH $dShingles,
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s
            AND a.doc_id % 7 != 0 AND b.doc_id % 7 = 0
          GROUP BY 1, 2)
        SELECT id1, id2,
          round(inter * 1.0 / (s1.n + s2.n - inter), 6) AS jaccard
        FROM pairs JOIN sizes s1 ON s1.doc_id = id1
          JOIN sizes s2 ON s2.doc_id = id2
        WHERE inter * 1.0 / (s1.n + s2.n - inter) >= 0.7
        ORDER BY id1, id2""")),

    // product quantization: 4 subspaces x 16 dims, 4 centroids each, one
    // Lloyd refinement per subspace — the IVF-PQ codebook layout; codes
    // are engine-reproducible via the same integer-quantized k-means
    // contract as emb_kmeans
    ("emb_pq_codes",
      (s, d) => Clustering.productQuantize(
          Tables.spread(s, Tables.embeddings(s, d)), "vec_id", "embedding",
          m = 4, k = 4, iters = 1)
        .orderBy("vec_id"),
      Some(s"""WITH $dKmeansPrep,
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")}
        SELECT a02.vec_id, CAST(a02.c AS INT) AS code_0,
          CAST(a12.c AS INT) AS code_1, CAST(a22.c AS INT) AS code_2,
          CAST(a32.c AS INT) AS code_3
        FROM a02 JOIN a12 USING (vec_id) JOIN a22 USING (vec_id)
          JOIN a32 USING (vec_id)
        ORDER BY vec_id""")),

    // Bloom membership sketch over normalized content: the streaming
    // prefilter for incremental dedup (probe the metadata-sized sketch;
    // only "maybe" rows pay an exact lookup). All-integer bit math, so
    // the oracle reproduces the exact bit pattern — false positives
    // included; corpus members can never probe false
    ("dedup_bloom",
      (s, d) => {
        import graft.pipeline.DocDedup
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"), TF.normalize(col("text")).as("k"))
        val bloom = DocDedup.bloomBuild(
          keyed.filter(col("doc_id") < 400), "k", mBits = 4096, kHashes = 3)
        DocDedup.bloomProbe(keyed, "doc_id", "k", bloom, 4096, 3)
          .orderBy("doc_id")
      },
      Some(s"""WITH ks AS (SELECT doc_id, $dNorm AS k FROM documents),
        pos AS (SELECT doc_id,
            ${dHash60("k || '#' || CAST(i AS VARCHAR)")} % 4096 AS p
          FROM ks CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        words AS (SELECT p // 60 AS w,
            bit_or(CAST(1 AS BIGINT) << CAST(p % 60 AS INT)) AS bits
          FROM pos WHERE doc_id < 400 GROUP BY 1),
        probe AS (SELECT pos.doc_id, count(*) FILTER (WHERE
            coalesce(words.bits, 0)
              & (CAST(1 AS BIGINT) << CAST(p % 60 AS INT)) <> 0) AS nset
          FROM pos LEFT JOIN words ON words.w = p // 60
          GROUP BY 1)
        SELECT doc_id, nset = 3 AS maybe_member FROM probe
        ORDER BY doc_id""")),

    // robust MAD outlier flagging per language: both medians are exact
    // lower medians via the driver-sized histogram (no per-stratum
    // sort); the oracle is the NAIVE row_number median — equality is the
    // two-level operator's correctness claim
    ("text_mad_outliers",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          TF.qualityScore(col("text")).as("q"))
        graft.pipeline.Sampling.madOutliers(docs, "doc_id", "lang", "q")
          .select(col("doc_id"), col("lang"), col("q"),
            round(col("dev"), 6).as("dev"), col("outlier"))
          .orderBy("doc_id")
      },
      Some(s"""WITH q AS (SELECT doc_id, lang, $dQuality AS q FROM documents),
        m1 AS (SELECT lang, q AS med FROM (
            SELECT lang, q, row_number() OVER (PARTITION BY lang
                ORDER BY q, doc_id) AS rk,
              count(*) OVER (PARTITION BY lang) AS n FROM q)
          WHERE rk = (n + 1) // 2),
        d AS (SELECT q.doc_id, q.lang, q.q, abs(q.q - m1.med) AS dev
          FROM q JOIN m1 USING (lang)),
        m2 AS (SELECT lang, dev AS mad FROM (
            SELECT lang, dev, row_number() OVER (PARTITION BY lang
                ORDER BY dev, doc_id) AS rk,
              count(*) OVER (PARTITION BY lang) AS n FROM d)
          WHERE rk = (n + 1) // 2)
        SELECT d.doc_id, d.lang, d.q, round(d.dev, 6) AS dev,
          d.dev > 3.0 * 1.4826 * m2.mad AS outlier
        FROM d JOIN m2 USING (lang) ORDER BY d.doc_id""")),

    // ADC search over the PQ codes (the IVF-PQ query path): per-query
    // distance tables against the fitted codebooks, corpus scored by m
    // table lookups — the oracle recomputes codebooks + codes with the
    // emb_pq_codes CTE chain, then replays the same integer-micro table
    // sums and the same (score desc, id) ranking
    ("ann_pq_topk",
      (s, d) => {
        val (codes, cb) = Clustering.pqFit(
          Tables.spread(s, Tables.embeddings(s, d)), "vec_id", "embedding",
          m = 4, k = 4, iters = 1)
        val queries = Tables.embeddings(s, d).filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.pqTopK(codes, cb, queries, k = 10)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("score"), 6).as("score"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dKmeansPrep,
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")},
        qx AS (SELECT vec_id AS q_id, q AS qe FROM v WHERE vec_id < 5),
        dt0 AS (SELECT q_id, c, ${dDotI("qe[1:16]", "cq")} AS d
          FROM qx CROSS JOIN c01),
        dt1 AS (SELECT q_id, c, ${dDotI("qe[17:32]", "cq")} AS d
          FROM qx CROSS JOIN c11),
        dt2 AS (SELECT q_id, c, ${dDotI("qe[33:48]", "cq")} AS d
          FROM qx CROSS JOIN c21),
        dt3 AS (SELECT q_id, c, ${dDotI("qe[49:64]", "cq")} AS d
          FROM qx CROSS JOIN c31),
        sc AS (SELECT dt0.q_id, a02.vec_id,
            (((dt0.d + dt1.d) + dt2.d) + dt3.d) / 1000000000000.0 AS score
          FROM a02 JOIN a12 USING (vec_id) JOIN a22 USING (vec_id)
            JOIN a32 USING (vec_id)
          JOIN dt0 ON dt0.c = a02.c
          JOIN dt1 ON dt1.q_id = dt0.q_id AND dt1.c = a12.c
          JOIN dt2 ON dt2.q_id = dt0.q_id AND dt2.c = a22.c
          JOIN dt3 ON dt3.q_id = dt0.q_id AND dt3.c = a32.c
          WHERE a02.vec_id != dt0.q_id),
        rk AS (SELECT q_id, vec_id, score, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY score DESC, vec_id) AS INT) AS rank
          FROM sc)
        SELECT q_id, rank, vec_id AS neighbor_id, round(score, 6) AS score
        FROM rk WHERE rank <= 10 ORDER BY q_id, rank""")),

    // recall@10 of PQ-ADC retrieval vs exact ground truth — the eval
    // that closes the PQ family (topk + distortion existed; this is the
    // operating number a PQ config ships on). ADC tables here are EXACT
    // Long integer dots of the micro query slices against micro-floored
    // codebook centroids (built driver-side from the bounded query
    // batch — the table build is m·k dots per query, metadata-scale), so
    // corpus scores are exact integer sums of 4 table lookups and the
    // top-10 set intersection is engine-proof end to end
    ("ann_pq_recall",
      (s, d) => {
        import s.implicits._
        val m = 4; val k = 4; val sub = 16
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        val (codes, books) = Clustering.pqFit(
          Tables.spread(s, Tables.embeddings(s, d)), "vec_id", "embedding",
          m = m, k = k, iters = 1)
        // codebooks arrive in integer micro-units from pqFit — no
        // re-quantization needed
        val cm: Map[(Int, Int), Array[Long]] = books.map { case (j, c, cq) =>
          (j, c) -> cq.toArray
        }.toMap
        val qmv = emb.filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).map(_.toLong).toArray))
        val qdt = qmv.toSeq.map { case (qid, qv) =>
          val t = (0 until m).map { j =>
            (0 until k).map { c =>
              val cc = cm((j, c))
              (0 until sub).map(i => qv(j * sub + i) * cc(i)).sum
            }
          }
          (qid, t(0), t(1), t(2), t(3))
        }.toDF("q_id", "dt0", "dt1", "dt2", "dt3")
        val scored = codes.crossJoin(broadcast(qdt))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (element_at(col("dt0"), col("code_0") + 1)
              + element_at(col("dt1"), col("code_1") + 1)
              + element_at(col("dt2"), col("code_2") + 1)
              + element_at(col("dt3"), col("code_3") + 1)).as("score"))
        val approx = scored
          .groupBy("q_id")
          .agg(graft.functions.TopK.topK(10)(col("score").cast("double"),
            col("vec_id")).as("tk"))
          .select(col("q_id"), explode(col("tk")).as("s2"))
          .select(col("q_id"), col("s2.id").as("neighbor_id"),
            lit(1).as("__h"))
        truth.join(approx, Seq("q_id", "neighbor_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $dKmeansPrep,
        qs AS (SELECT vec_id AS q_id, q AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT qs.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (
              PARTITION BY qs.q_id
              ORDER BY ${dCosMicroI("v.q", "qs.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN qs WHERE v.vec_id != qs.q_id) WHERE rk <= 10),
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")},
        ${(0 until 4).map { j =>
          val lo = j * 16
          s"""dt$j AS (SELECT qs.q_id, c${j}1.c,
              CAST(list_sum(list_transform(range(1, 17),
                i -> CAST(qs.qe[$lo + i] AS BIGINT) * c${j}1.cq[i]))
                AS BIGINT) AS dval
            FROM qs CROSS JOIN c${j}1)"""
        }.mkString(",\n")},
        sc AS (SELECT dt0.q_id, a02.vec_id,
            dt0.dval + dt1.dval + dt2.dval + dt3.dval AS score
          FROM a02 JOIN a12 USING (vec_id) JOIN a22 USING (vec_id)
            JOIN a32 USING (vec_id)
          JOIN dt0 ON dt0.c = a02.c
          JOIN dt1 ON dt1.q_id = dt0.q_id AND dt1.c = a12.c
          JOIN dt2 ON dt2.q_id = dt0.q_id AND dt2.c = a22.c
          JOIN dt3 ON dt3.q_id = dt0.q_id AND dt3.c = a32.c
          WHERE a02.vec_id != dt0.q_id),
        pq AS (SELECT q_id, neighbor_id FROM (SELECT q_id,
            vec_id AS neighbor_id, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, vec_id ASC) AS rk FROM sc)
          WHERE rk <= 10)
        SELECT bf.q_id,
          CAST(sum(CASE WHEN pq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN pq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf LEFT JOIN pq ON pq.q_id = bf.q_id
          AND pq.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id ORDER BY bf.q_id""")),

    // PQ distortion audit: per-subspace mean squared reconstruction
    // error between each micro vector slice and its assigned codebook
    // centroid — the quantization-quality dial (distortion up = recall
    // down) checked before trusting a PQ index config. Per-vector SSE is
    // an exact integer fold over the micro grid (centroids micro-floored
    // the same way on both engines); corpus totals accumulate in
    // decimal(38,0)/HUGEINT so the exposed mse is one division of
    // identical exact operands. One corpus pass + a 4-row aggregate
    ("ann_pq_distortion",
      (s, d) => {
        val m = 4; val k = 4; val sub = 16
        val (codes, books) = Clustering.pqFit(
          Tables.spread(s, Tables.embeddings(s, d)), "vec_id", "embedding",
          m = m, k = k, iters = 1)
        val bookLit: Map[Int, Column] = (0 until m).map { j =>
          j -> array((0 until k).map { c =>
            // codebooks are already integer micro-units from pqFit
            val cq = books.find(b => b._1 == j && b._2 == c).get._3
            array(cq.map(lit): _*)
          }: _*)
        }.toMap
        val q = Tables.embeddings(s, d).select(col("vec_id"),
          VF.microVec(col("embedding")).as("q"))
        val sseCols = (0 until m).map { j =>
          // q is array<double> of integer-valued micros (microVec); the
          // per-element squares (<= 4e12) and 16-term fold stay exact in
          // double (< 2^53), cast back to long once at the end
          aggregate(
            zip_with(slice(col("q"), j * sub + 1, sub),
              element_at(bookLit(j), col(s"code_$j") + 1),
              (x, c) => (x - c) * (x - c)),
            lit(0d), (acc, e) => acc + e).cast("long").as(s"__sse_$j")
        }
        codes.join(q, "vec_id")
          .select(col("vec_id") +: sseCols: _*)
          .select(posexplode(array(
            (0 until m).map(j => col(s"__sse_$j")): _*))
            .as(Seq("subspace", "sse")))
          .groupBy("subspace")
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("sse").cast("decimal(38,0)")).as("__t"))
          .select(col("subspace"), col("n_vecs"),
            round(col("__t").cast("double") / col("n_vecs").cast("double")
              / lit(1e12), 6).as("mse"))
          .orderBy("subspace")
      },
      Some(s"""WITH $dKmeansPrep,
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")},
        ${(0 until 4).map { j =>
          val lo = j * 16
          s"""e$j AS (SELECT a.vec_id, CAST(list_sum(list_transform(
              list_zip(v.q[${lo + 1}:${lo + 16}], cm.cq),
              p -> (p[1] - p[2]) * (p[1] - p[2]))) AS HUGEINT) AS sse
            FROM a${j}2 a JOIN v USING (vec_id)
            JOIN c${j}1 cm ON cm.c = a.c)"""
        }.mkString(",\n")}
        SELECT * FROM (
          ${(0 until 4).map(j =>
            s"""SELECT $j AS subspace, CAST(count(*) AS BIGINT) AS n_vecs,
              round(CAST(sum(sse) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                / 1e12, 6) AS mse FROM e$j""").mkString("\nUNION ALL\n")}
        ) ORDER BY subspace""")),

    // recall@k evaluation of the IVF index against brute-force ground
    // truth — the accuracy dial every ANN deployment tunes (nprobe vs
    // recall); exact hit counts per query, both sides replayed by the
    // oracle from their existing CTE chains. Every cosine in every
    // ranking step (truth top-k, centroid assignment, probe choice,
    // candidate top-k) is computed over integer-MICRO VECTORS (dEmbMicro)
    // on BOTH engines: dots and norms are exact order-free integer sums,
    // so the cosines are bit-equal before the microRank quantizer even
    // runs. The r8 fix (quantize the raw-double cosine AFTER the dot)
    // was not engine-proof — a 1-ulp dot difference at a .5-micro
    // boundary still flipped one quantized score (r9 verdict); with four
    // chained ranking stages over all pairs some pair always lands on
    // the boundary. Quantize-before-dot removes the wobble at the source
    // — IF the oracle's dot really sums those integers exactly. The last
    // implementation-defined piece was DuckDB's `list_dot_product`
    // builtin (r10 verdict: the driver's DuckDB build still hash-flipped
    // this query while 1.0.0 agreed with Spark — a FLOAT32 overload
    // there would inject ~0.2-micro wobble, enough to flip only the
    // most boundary-sensitive set-intersection queries, which is
    // exactly the observed failure set). r11: every dot in this oracle
    // is now an explicit BIGINT multiply+sum ([[dDotI]]) that cannot
    // bind a float path on any engine.
    // Matryoshka truncation eval (Kusupati et al. 2022, MRL): recall@10
    // of retrieval over the first 16 / 32 dims against full-64-dim ground
    // truth — the table that picks the serving dimensionality of an
    // MRL-trained embedding (half the dims = half the index bytes and
    // score FLOPs; serve at the knee). Prefix slices of integer-micro
    // vectors are still integer-micro, so every cosine in both rankings
    // is exact on any engine; one corpus scan per prefix, each the
    // broadcast + bounded-TopK brute-force posture
    ("ann_matryoshka_recall",
      (s, d) => {
        import s.implicits._
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10,
            microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        val perDim = Seq(16, 32).map { m =>
          val embT = emb.select(col("vec_id"),
            slice(col("embedding"), 1, m).as("embedding"))
          val qT = q.select(col("q_id"),
            slice(col("q_vec"), 1, m).as("q_vec"))
          Similarity.bruteForceTopK(embT, qT, k = 10, microRank = true)
            .select(col("q_id"), col("neighbor_id"), lit(1).as("__h"))
            .withColumn("dims", lit(m))
        }.reduce(_ unionByName _)
        truth.crossJoin(Seq(16, 32).toDF("dims"))
          .join(perDim, Seq("q_id", "neighbor_id", "dims"), "left")
          .groupBy("q_id", "dims")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("dims"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id", "dims")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        ${Seq(16, 32).map(m => s"""ap$m AS (SELECT q_id, neighbor_id,
            CAST($m AS INT) AS dims FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI(s"v.e[1:$m]", s"q.qe[1:$m]")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10)""")
          .mkString(",\n        ")},
        ap AS (SELECT * FROM ap16 UNION ALL SELECT * FROM ap32)
        SELECT bf.q_id, dm.dims,
          CAST(sum(CASE WHEN ap.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN ap.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf CROSS JOIN (SELECT CAST(unnest([16, 32]) AS INT) AS dims) dm
        LEFT JOIN ap ON ap.q_id = bf.q_id AND ap.dims = dm.dims
          AND ap.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id, dm.dims ORDER BY bf.q_id, dm.dims""")),

    ("ann_recall_eval",
      (s, d) => {
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        val approx = Similarity
          .ivfTopK(emb, centroids, q, k = 10, nprobe = 3, microRank = true)
          .select(col("q_id"), col("neighbor_id"), lit(1).as("__h"))
        truth.join(approx, Seq("q_id", "neighbor_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 3),
        cand AS (SELECT p.q_id, a.vec_id
          FROM probes p JOIN assign a ON a.c_id = p.c_id),
        iv AS (SELECT q_id, neighbor_id FROM (SELECT cand.q_id,
            cand.vec_id AS neighbor_id, row_number() OVER (
              PARTITION BY cand.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              cand.vec_id ASC) AS rk
          FROM cand JOIN v ON v.vec_id = cand.vec_id
          JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id) WHERE rk <= 10)
        SELECT bf.q_id,
          CAST(sum(CASE WHEN iv.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN iv.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf LEFT JOIN iv ON iv.q_id = bf.q_id
          AND iv.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id ORDER BY bf.q_id""")),

    // recall@10 of int8 scalar-quantized retrieval vs exact ground truth
    // — the eval that closes the SQ family (codes exist via
    // emb_quantize_int8; this measures what the 4x compression costs at
    // rank time). Asymmetric scoring (query exact, corpus dequantized),
    // with the dequantization on an INTEGER micro grid: rec_i = mnm_i +
    // code_i * dm_i where mnm/dm are micro-floored per-dim offsets/steps
    // computed with the identical op order on both engines — so every
    // dot is an exact < 2^53 sum and the top-10 set intersection is
    // engine-proof (the ann_recall_eval discipline)
    ("ann_sq_recall",
      (s, d) => {
        val embRaw = Tables.embeddings(s, d)
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        val stats = Quantization.int8Stats(embRaw, "embedding")
          .orderBy("dim").collect() // dim-sized codebook, driver metadata
        val mns = stats.map(_.getAs[Double]("mn"))
        val mxs = stats.map(_.getAs[Double]("mx"))
        // one recall row per (query, bit width): int8 vs int4 — the
        // compression dial with its rank cost made visible
        def arm(bits: Int): DataFrame = {
          val levels = (1 << bits) - 1
          val mnm = mns.map(mn => math.floor(mn * 1e6 + 0.5).toLong)
          val dm = mns.zip(mxs).map { case (mn, mx) =>
            math.floor((mx - mn) / levels.toDouble * 1e6 + 0.5).toLong }
          val steps = zip_with(array(mnm.map(lit): _*), array(dm.map(lit): _*),
            (a, b) => struct(a.as("mn"), b.as("dm")))
          val mnArr = array(mns.map(lit): _*)
          val mxArr = array(mxs.map(lit): _*)
          val rec = embRaw.select(col("vec_id"),
            zip_with(
              zip_with(VF.asDouble(col("embedding")),
                zip_with(mnArr, mxArr, (a, b) =>
                  struct(a.as("mn"), b.as("mx"))),
                (x, st) => {
                  val mn = st.getField("mn"); val mx = st.getField("mx")
                  when(mx === mn, lit(0L)).otherwise(
                    greatest(lit(0L), least(lit(levels.toLong),
                      floor((x - mn) * lit(levels.toDouble) / (mx - mn)
                        + 0.5).cast("long"))))
                }),
              steps,
              (c, st) => (st.getField("mn") + c * st.getField("dm"))
                .cast("double")).as("embedding"))
          Similarity.bruteForceTopK(rec, q, k = 10, microRank = true)
            .select(col("q_id"), col("neighbor_id"),
              lit(bits).as("bits"), lit(1).as("__h"))
        }
        import s.implicits._
        val approx = arm(8).unionByName(arm(4))
        truth.crossJoin(broadcast(Seq(8, 4).toDF("bits")))
          .join(approx, Seq("q_id", "neighbor_id", "bits"), "left")
          .groupBy("q_id", "bits")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("bits"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id", "bits")
      },
      Some(s"""WITH $dEmbMicro,
        raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
          FROM embeddings),
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        st AS (SELECT d, min(e[d]) AS mn, max(e[d]) AS mx
          FROM raw CROSS JOIN (SELECT unnest(range(1, 65)) AS d) GROUP BY d),
        arrs AS (SELECT
            list(CAST(floor(mn * 1000000.0 + 0.5) AS BIGINT) ORDER BY d) AS mnm,
            list(CAST(floor((mx - mn) / 255.0 * 1000000.0 + 0.5) AS BIGINT)
              ORDER BY d) AS dm8,
            list(CAST(floor((mx - mn) / 15.0 * 1000000.0 + 0.5) AS BIGINT)
              ORDER BY d) AS dm4,
            list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM st),
        ${Seq(8 -> 255, 4 -> 15).map { case (b, lv) =>
          s"""rec$b AS (SELECT vec_id, list_transform(range(1, 65),
            i -> mnm[i] + (CASE WHEN mxs[i] = mns[i] THEN 0
              ELSE least($lv, greatest(0, CAST(floor(
                (e[i] - mns[i]) * $lv.0 / (mxs[i] - mns[i]) + 0.5)
                AS BIGINT))) END) * dm$b[i]) AS e
          FROM raw CROSS JOIN arrs),
          sq$b AS (SELECT q_id, neighbor_id FROM (SELECT q.q_id,
            rec$b.vec_id AS neighbor_id, row_number() OVER (
              PARTITION BY q.q_id
              ORDER BY ${dCosMicroI(s"rec$b.e", "q.qe")} DESC,
              rec$b.vec_id ASC) AS rk
          FROM rec$b CROSS JOIN q WHERE rec$b.vec_id != q.q_id)
          WHERE rk <= 10)"""
        }.mkString(",\n        ")},
        sq AS (SELECT CAST(8 AS INT) AS bits, q_id, neighbor_id FROM sq8
          UNION ALL SELECT CAST(4 AS INT), q_id, neighbor_id FROM sq4)
        SELECT bf.q_id, b.bits,
          CAST(sum(CASE WHEN sq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN sq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf CROSS JOIN (SELECT CAST(unnest([8, 4]) AS INT) AS bits) b
        LEFT JOIN sq ON sq.bits = b.bits AND sq.q_id = bf.q_id
          AND sq.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id, b.bits ORDER BY bf.q_id, b.bits""")),

    // graded-relevance twin of ann_recall_eval: nDCG@10 of the IVF list
    // against brute-force ground truth (rel = 11 − truth rank). The log2
    // position discounts are micro-quantized ONCE driver-side and enter
    // both engines as integer literals, so DCG/IDCG are exact integer
    // sums and nDCG is one division of identical operands
    ("ann_ndcg_eval",
      (s, d) => {
        import s.implicits._
        val emb = qEmb(s, d)
        val centroids = emb.filter(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("neighbor_id"),
            (lit(11) - col("rank")).cast("long").as("rel"))
        val approx = Similarity
          .ivfTopK(emb, centroids, q, k = 10, nprobe = 3, microRank = true)
          .select(col("q_id"), col("neighbor_id"), col("rank"))
        val disc = dNdcgDisc.toDF("rank", "disc")
        approx.join(broadcast(disc), "rank")
          .join(truth, Seq("q_id", "neighbor_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("rel"), lit(0L)) * col("disc"))
            .as("dcg_micro"))
          .select(col("q_id"), col("dcg_micro"),
            round(col("dcg_micro") / lit(dNdcgIdcg), 6).as("ndcg"))
          .orderBy("q_id")
      },
      Some(s"""WITH $dEmbMicro,
        q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id, 11 - rk AS rel FROM (SELECT q.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN q WHERE v.vec_id != q.q_id) WHERE rk <= 10),
        c AS (SELECT vec_id AS c_id, e AS ce FROM v WHERE vec_id % 50 = 0),
        cosvc AS (SELECT v.vec_id, c.c_id,
            ${dCosMicroI("v.e", "c.ce")} AS aff
          FROM v CROSS JOIN c),
        assign AS (SELECT vec_id, c_id FROM (SELECT vec_id, c_id,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY aff DESC, c_id ASC) AS rn
          FROM cosvc) WHERE rn = 1),
        probes AS (SELECT q_id, c_id FROM (SELECT q.q_id, c.c_id,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${dCosMicroI("q.qe", "c.ce")} DESC,
              c.c_id ASC) AS rn
          FROM q CROSS JOIN c) WHERE rn <= 3),
        cand AS (SELECT p.q_id, a.vec_id
          FROM probes p JOIN assign a ON a.c_id = p.c_id),
        iv AS (SELECT q_id, neighbor_id, rk AS rank FROM (SELECT cand.q_id,
            cand.vec_id AS neighbor_id, row_number() OVER (
              PARTITION BY cand.q_id
              ORDER BY ${dCosMicroI("v.e", "q.qe")} DESC,
              cand.vec_id ASC) AS rk
          FROM cand JOIN v ON v.vec_id = cand.vec_id
          JOIN q ON q.q_id = cand.q_id
          WHERE cand.vec_id != cand.q_id) WHERE rk <= 10),
        disc(rank, disc) AS (VALUES $dDiscValues)
        SELECT iv.q_id,
          CAST(sum(coalesce(bf.rel, 0) * disc.disc) AS BIGINT) AS dcg_micro,
          round(CAST(sum(coalesce(bf.rel, 0) * disc.disc) AS BIGINT)
            * 1.0 / $dNdcgIdcg, 6) AS ndcg
        FROM iv JOIN disc ON disc.rank = iv.rank
        LEFT JOIN bf ON bf.q_id = iv.q_id AND bf.neighbor_id = iv.neighbor_id
        GROUP BY iv.q_id ORDER BY iv.q_id""")),

    // NB-classifier vs declared-label confusion matrix: the per-pair
    // agreement audit run after any corpus relabeling pass — composes
    // text_nb_lang's classifier with one counting aggregate
    ("corpus_lang_confusion",
      (s, d) => {
        val docs = Tables.documents(s, d)
        LanguageModel.naiveBayesClassify(docs, "doc_id", "lang", "text")
          .join(docs.select(col("doc_id"), col("lang")), "doc_id")
          .groupBy(col("lang"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      Some(s"""WITH p AS (SELECT doc_id, lang, $dToks AS w FROM documents),
        occ AS (SELECT doc_id, unnest(w) AS t FROM p),
        ct AS (SELECT lang AS c, t, count(*) AS ct
          FROM (SELECT lang, unnest(w) AS t FROM p) GROUP BY 1, 2),
        tot AS (SELECT c, sum(ct) AS n FROM ct GROUP BY 1),
        vv AS (SELECT count(DISTINCT t) AS v FROM occ),
        pr AS (SELECT lang AS c, CAST(round(log2(count(*)
            / (SELECT count(*) * 1.0 FROM p)) * 1000000) AS BIGINT) AS prior_q
          FROM p GROUP BY 1),
        sc AS (SELECT occ.doc_id, tot.c, pr.prior_q
            + sum(CAST(round(log2((coalesce(ct.ct, 0) + 0.5)
              / (tot.n + 0.5 * vv.v)) * 1000000) AS BIGINT)) AS score_q
          FROM occ CROSS JOIN tot CROSS JOIN vv
          LEFT JOIN ct ON ct.c = tot.c AND ct.t = occ.t
          JOIN pr ON pr.c = tot.c
          GROUP BY occ.doc_id, tot.c, pr.prior_q),
        rk AS (SELECT doc_id, c, score_q, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_q DESC, c ASC) AS rk FROM sc),
        cls AS (SELECT doc_id, c AS pred FROM rk WHERE rk = 1)
        SELECT p.lang, cls.pred, count(*) AS n
        FROM cls JOIN p USING (doc_id)
        GROUP BY 1, 2 ORDER BY lang, pred""")),

    // recall@10 of the composed IVF-PQ path vs exact ground truth — the
    // last cell of the recall matrix (IVF, PQ, SQ, Hamming all carry
    // one). Everything rank-bearing is integer-exact: probes rank by
    // the mirrored integer-micro cosine (computed driver-side from the
    // k=8 seed centroids — metadata), ADC tables are exact Long dots of
    // micro query slices against micro-floored PQ codebooks, and the
    // candidate scan is cell-pruned before any scoring. Both losses
    // compound here (probe misses + code distortion), which is exactly
    // what the number is for
    ("ann_ivfpq_recall",
      (s, d) => {
        import s.implicits._
        val m = 4; val k = 4; val sub = 16; val nprobe = 3
        val spread = Tables.spread(s, Tables.embeddings(s, d))
        val emb = qEmb(s, d)
        val q = emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val truth = Similarity.bruteForceTopK(emb, q, k = 10, microRank = true)
          .select(col("q_id"), col("neighbor_id"))
        // the coarse-quantizer fit, the PQ codebook fit and the
        // query-vector collect are mutually independent driver-barrier
        // phases (guide §2.6): run them as concurrent Spark jobs so the
        // barriers overlap instead of chaining; each is deterministic on
        // its own, so results are unchanged
        import scala.concurrent.{Await, ExecutionContext, Future, blocking}
        import scala.concurrent.duration.DurationInt
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fCoarse = Future(blocking(Clustering.kmeansFit(
          spread, "vec_id", "embedding", k = 8, iters = 0)))
        val fPq = Future(blocking(Clustering.pqFit(
          spread, "vec_id", "embedding", m = m, k = k, iters = 1)))
        val fQmv = Future(blocking(emb.filter(col("vec_id") < 5)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).map(_.toLong).toArray))))
        val (cells, coarse) = Await.result(fCoarse, 2.hours)
        val (codes, books) = Await.result(fPq, 2.hours)
        val qmv = Await.result(fQmv, 2.hours)
        // mirrored integer-micro cosine (the dCosMicroI expression order)
        def cosMicro(a: Array[Long], b: Array[Long]): Long = {
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
          math.floor(dot.toDouble
            / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
            * 1e6 + 0.5).toLong
        }
        val centM: Seq[(Int, Array[Long])] = coarse.map { case (c, cq) =>
          c -> cq.toArray }
        val probes = qmv.toSeq.flatMap { case (qid, qv) =>
          centM.map { case (c, cm) => (qid, c, cosMicro(qv, cm)) }
            .sortBy { case (_, c, s0) => (-s0, c) }.take(nprobe)
            .map { case (_, c, _) => (qid, c) }
        }.toDF("q_id", "cluster")
        // codebooks arrive in integer micro-units from pqFit — no
        // re-quantization needed
        val cm: Map[(Int, Int), Array[Long]] = books.map { case (j, c, cq) =>
          (j, c) -> cq.toArray
        }.toMap
        val qdt = qmv.toSeq.map { case (qid, qv) =>
          val t = (0 until m).map { j =>
            (0 until k).map { c =>
              val cc = cm((j, c))
              (0 until sub).map(i => qv(j * sub + i) * cc(i)).sum
            }
          }
          (qid, t(0), t(1), t(2), t(3))
        }.toDF("q_id", "dt0", "dt1", "dt2", "dt3")
        val scored = codes.join(cells, "vec_id")
          .join(broadcast(probes), "cluster")
          .join(broadcast(qdt), "q_id")
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"),
            (element_at(col("dt0"), col("code_0") + 1)
              + element_at(col("dt1"), col("code_1") + 1)
              + element_at(col("dt2"), col("code_2") + 1)
              + element_at(col("dt3"), col("code_3") + 1)).as("score"))
        val approx = scored
          .groupBy("q_id")
          .agg(graft.functions.TopK.topK(10)(col("score").cast("double"),
            col("vec_id")).as("tk"))
          .select(col("q_id"), explode(col("tk")).as("s2"))
          .select(col("q_id"), col("s2.id").as("neighbor_id"),
            lit(1).as("__h"))
        truth.join(approx, Seq("q_id", "neighbor_id"), "left")
          .groupBy("q_id")
          .agg(sum(coalesce(col("__h"), lit(0))).as("hits"))
          .select(col("q_id"), col("hits"),
            round(col("hits") / 10.0, 6).as("recall"))
          .orderBy("q_id")
      },
      Some(s"""WITH $dKmeansPrep,
        qs AS (SELECT vec_id AS q_id, q AS qe FROM v WHERE vec_id < 5),
        bf AS (SELECT q_id, neighbor_id FROM (SELECT qs.q_id,
            v.vec_id AS neighbor_id, row_number() OVER (
              PARTITION BY qs.q_id
              ORDER BY ${dCosMicroI("v.q", "qs.qe")} DESC,
              v.vec_id ASC) AS rk
          FROM v CROSS JOIN qs WHERE v.vec_id != qs.q_id) WHERE rk <= 10),
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        cell AS (SELECT vec_id, c AS cl FROM ${dKmeansAssign("c0")}),
        probes AS (SELECT q_id, c AS cl FROM (SELECT qs.q_id, c0.c,
            row_number() OVER (PARTITION BY qs.q_id
              ORDER BY ${dCosMicroI("qs.qe", "c0.cq")} DESC,
              c0.c ASC) AS rn
          FROM qs CROSS JOIN c0) WHERE rn <= 3),
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")},
        ${(0 until 4).map { j =>
          val lo = j * 16
          s"""dt$j AS (SELECT qs.q_id, c${j}1.c,
              CAST(list_sum(list_transform(range(1, 17),
                i -> CAST(qs.qe[$lo + i] AS BIGINT) * c${j}1.cq[i]))
                AS BIGINT) AS dval
            FROM qs CROSS JOIN c${j}1)"""
        }.mkString(",\n")},
        sc AS (SELECT p.q_id, a02.vec_id,
            dt0.dval + dt1.dval + dt2.dval + dt3.dval AS score
          FROM a02 JOIN a12 USING (vec_id) JOIN a22 USING (vec_id)
            JOIN a32 USING (vec_id)
          JOIN cell USING (vec_id)
          JOIN probes p ON p.cl = cell.cl
          JOIN dt0 ON dt0.q_id = p.q_id AND dt0.c = a02.c
          JOIN dt1 ON dt1.q_id = p.q_id AND dt1.c = a12.c
          JOIN dt2 ON dt2.q_id = p.q_id AND dt2.c = a22.c
          JOIN dt3 ON dt3.q_id = p.q_id AND dt3.c = a32.c
          WHERE a02.vec_id != p.q_id),
        pq AS (SELECT q_id, neighbor_id FROM (SELECT q_id,
            vec_id AS neighbor_id, row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, vec_id ASC) AS rk FROM sc)
          WHERE rk <= 10)
        SELECT bf.q_id,
          CAST(sum(CASE WHEN pq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS hits,
          round(sum(CASE WHEN pq.neighbor_id IS NULL THEN 0 ELSE 1 END)
            / 10.0, 6) AS recall
        FROM bf LEFT JOIN pq ON pq.q_id = bf.q_id
          AND pq.neighbor_id = bf.neighbor_id
        GROUP BY bf.q_id ORDER BY bf.q_id""")),

    // the composed IVF-PQ index (the billion-scale ANN query path):
    // coarse k-means cells prune the corpus to nprobe lists per query,
    // PQ ADC scores the survivors from codes alone — the oracle replays
    // the coarse assignment (seed centroids), the probe ranking, the PQ
    // codebook fit, and the cell-restricted integer-micro table sums
    ("ann_ivfpq_topk",
      (s, d) => {
        val spread = Tables.spread(s, Tables.embeddings(s, d))
        // coarse fit and PQ fit are independent driver-barrier phases —
        // overlap them (guide §2.6), results unchanged
        import scala.concurrent.{Await, ExecutionContext, Future, blocking}
        import scala.concurrent.duration.DurationInt
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fCoarse = Future(blocking(Clustering.kmeansFit(
          spread, "vec_id", "embedding", k = 8, iters = 0)))
        val fPq = Future(blocking(Clustering.pqFit(
          spread, "vec_id", "embedding", m = 4, k = 4, iters = 1)))
        val (cells, coarse) = Await.result(fCoarse, 2.hours)
        val (codes, cb) = Await.result(fPq, 2.hours)
        val q = Tables.embeddings(s, d).filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        Similarity.ivfPqTopK(codes, cells, coarse, cb, q, k = 10, nprobe = 3)
          .select(col("q_id"), col("rank"), col("neighbor_id"),
            round(col("score"), 6).as("score"))
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $dKmeansPrep,
        c0 AS (SELECT vec_id AS c, q AS cq FROM v WHERE vec_id < 8),
        cell AS (SELECT vec_id, c AS cl FROM ${dKmeansAssign("c0")}),
        ${(0 until 4).map(j => dPqSubspace(j, 16, 4)).mkString(",\n")},
        qx AS (SELECT vec_id AS q_id, q AS qe FROM v WHERE vec_id < 5),
        probes AS (SELECT q_id, c AS cl FROM (SELECT qx.q_id, c0.c,
            row_number() OVER (PARTITION BY qx.q_id
              ORDER BY ${dCosMicroI("qx.qe", "c0.cq")} DESC,
              c0.c ASC) AS rn
          FROM qx CROSS JOIN c0) WHERE rn <= 3),
        dt0 AS (SELECT q_id, c, ${dDotI("qe[1:16]", "cq")} AS d
          FROM qx CROSS JOIN c01),
        dt1 AS (SELECT q_id, c, ${dDotI("qe[17:32]", "cq")} AS d
          FROM qx CROSS JOIN c11),
        dt2 AS (SELECT q_id, c, ${dDotI("qe[33:48]", "cq")} AS d
          FROM qx CROSS JOIN c21),
        dt3 AS (SELECT q_id, c, ${dDotI("qe[49:64]", "cq")} AS d
          FROM qx CROSS JOIN c31),
        sc AS (SELECT p.q_id, a02.vec_id,
            (((dt0.d + dt1.d) + dt2.d) + dt3.d) / 1000000000000.0 AS score
          FROM a02 JOIN a12 USING (vec_id) JOIN a22 USING (vec_id)
            JOIN a32 USING (vec_id)
          JOIN cell USING (vec_id)
          JOIN probes p ON p.cl = cell.cl
          JOIN dt0 ON dt0.q_id = p.q_id AND dt0.c = a02.c
          JOIN dt1 ON dt1.q_id = p.q_id AND dt1.c = a12.c
          JOIN dt2 ON dt2.q_id = p.q_id AND dt2.c = a22.c
          JOIN dt3 ON dt3.q_id = p.q_id AND dt3.c = a32.c
          WHERE a02.vec_id != p.q_id),
        rk AS (SELECT q_id, vec_id, score, CAST(row_number() OVER (
            PARTITION BY q_id ORDER BY score DESC, vec_id) AS INT) AS rank
          FROM sc)
        SELECT q_id, rank, vec_id AS neighbor_id, round(score, 6) AS score
        FROM rk WHERE rank <= 10 ORDER BY q_id, rank""")),

    // exact corpus covariance (the whitening/PCA/OPQ input statistic):
    // upper-triangle (i, j, cov) from order-free integer sums on the 1e-6
    // quantized grid — the oracle re-derives the identical exact sums
    ("emb_covariance",
      (s, d) => Quantization.covariance(
          Tables.spread(s, Tables.embeddings(s, d)), "embedding")
        .orderBy("i", "j"),
      Some("""WITH v AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
          y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS q
          FROM embeddings),
        nn AS (SELECT count(*) AS n FROM v),
        dims AS (SELECT unnest(range(1, 65)) AS i),
        sx AS (SELECT i, sum(q[i]) AS s FROM v CROSS JOIN dims GROUP BY i),
        sxy AS (SELECT a.i AS i, b.i AS j,
            sum(CAST(q[a.i] AS HUGEINT) * q[b.i]) AS s
          FROM v CROSS JOIN dims a CROSS JOIN dims b
          WHERE b.i >= a.i GROUP BY 1, 2)
        SELECT CAST(sxy.i AS INT) AS i, CAST(sxy.j AS INT) AS j,
          round(CAST(nn.n * sxy.s - si.s * sj.s AS DOUBLE)
            / (CAST(nn.n AS DOUBLE) * nn.n * 1000000000000.0), 6) + 0 AS cov
        FROM sxy JOIN sx si ON si.i = sxy.i JOIN sx sj ON sj.i = sxy.j
        CROSS JOIN nn ORDER BY i, j""")),

    // dominant principal component by fixed-round power iteration on the
    // integer-micro covariance — engine-reproducible PCA where an
    // eigensolver is not (LAPACK/Jacobi differ across libraries): the
    // corpus reduces to the d×d covariance once, then 3 exact-integer
    // matrix-vector rounds with a micro re-normalization after each.
    // The oracle unrolls the identical recurrence as chained CTEs
    ("emb_top_component",
      (s, d) => Quantization.topComponent(
          Tables.spread(s, Tables.embeddings(s, d)), "embedding", iters = 3)
        .orderBy("dim"),
      Some {
        def round(t: Int, prev: String): String =
          s"""w$t AS (SELECT m.i, sum(m.m * $prev.v) AS w
            FROM m JOIN $prev ON $prev.j = m.j GROUP BY 1),
          x$t AS (SELECT max(abs(w)) AS wm FROM w$t),
          v$t AS (SELECT i AS j, CASE WHEN wm = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(floor(CAST(w AS DOUBLE) / CAST(wm AS DOUBLE)
                * 1000000.0 + 0.5) AS BIGINT) END AS v
            FROM w$t CROSS JOIN x$t)"""
        val rounds = (1 to 3).map(t =>
          round(t, if (t == 1) "v0" else s"v${t - 1}")).mkString(",\n")
        s"""WITH v AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
            y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS q
            FROM embeddings),
          nn AS (SELECT count(*) AS n FROM v),
          dims AS (SELECT unnest(range(1, 65)) AS i),
          sx AS (SELECT i, sum(q[i]) AS s FROM v CROSS JOIN dims GROUP BY i),
          sxy AS (SELECT a.i AS i, b.i AS j,
              sum(CAST(q[a.i] AS HUGEINT) * q[b.i]) AS s
            FROM v CROSS JOIN dims a CROSS JOIN dims b
            WHERE b.i >= a.i GROUP BY 1, 2),
          cm AS (SELECT sxy.i, sxy.j,
              CAST(floor(round(CAST(nn.n * sxy.s - si.s * sj.s AS DOUBLE)
                / (CAST(nn.n AS DOUBLE) * nn.n * 1000000000000.0), 6)
                * 1000000.0 + 0.5) AS BIGINT) AS m
            FROM sxy JOIN sx si ON si.i = sxy.i JOIN sx sj ON sj.i = sxy.j
            CROSS JOIN nn),
          m AS (SELECT i, j, m FROM cm
            UNION ALL SELECT j, i, m FROM cm WHERE i != j),
          v0 AS (SELECT i AS j, CAST(1000000 AS BIGINT) AS v FROM dims),
          $rounds
          SELECT CAST(j AS INT) AS dim, v / 1000000.0 AS loading
          FROM v3 ORDER BY dim"""
      }),

    // label-centroid separability matrix: pairwise cosine between the
    // per-label mean embeddings — the linear-separability audit run
    // before trusting the labels for a probe/classifier. Cosine is
    // scale-invariant, so both engines compute it over per-label integer
    // SUM vectors (never means): exact order-free sums, one IEEE divide
    // of identical operands
    ("emb_label_centroids",
      (s, d) => Clustering.labelCentroidCosines(
          Tables.spread(s, Tables.embeddings(s, d)), "label", "embedding")
        .orderBy("label_a", "label_b"),
      Some("""WITH v AS (SELECT label, list_transform(CAST(embedding AS DOUBLE[]),
          y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS q FROM embeddings),
        sums AS (SELECT label, d, sum(q[d]) AS s
          FROM v CROSS JOIN (SELECT unnest(range(1, 65)) AS d) GROUP BY 1, 2),
        nsq AS (SELECT label, sum(CAST(s AS HUGEINT) * s) AS nsq
          FROM sums GROUP BY 1),
        cnt AS (SELECT label, count(*) AS n FROM v GROUP BY 1),
        dots AS (SELECT a.label AS la, b.label AS lb,
            sum(CAST(a.s AS HUGEINT) * b.s) AS dot
          FROM sums a JOIN sums b ON a.d = b.d AND a.label < b.label
          GROUP BY 1, 2)
        SELECT la AS label_a, lb AS label_b, c1.n AS n_a, c2.n AS n_b,
          round(CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nsq AS DOUBLE))
            * sqrt(CAST(n2.nsq AS DOUBLE))), 6) + 0 AS cos
        FROM dots JOIN nsq n1 ON n1.label = la JOIN nsq n2 ON n2.label = lb
        JOIN cnt c1 ON c1.label = la JOIN cnt c2 ON c2.label = lb
        WHERE n1.nsq != 0 AND n2.nsq != 0
        ORDER BY label_a, label_b""")),

    // per-source embedding drift matrix: the same scale-invariant
    // integer-sum centroid cosine as emb_label_centroids, keyed on the
    // SOURCE string — a collapsing off-diagonal row means one crawl
    // source drifted into another's embedding region (dedup/mixing
    // implications before training)
    ("emb_source_centroids",
      (s, d) => {
        val j = Tables.documents(s, d).select(col("doc_id"), col("source"))
          .join(Tables.spread(s, Tables.embeddings(s, d))
            .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
        Clustering.labelCentroidCosines(j, "source", "embedding")
          .select(col("label_a").as("source_a"),
            col("label_b").as("source_b"), col("n_a"), col("n_b"),
            col("cos"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH j AS (SELECT d.source,
          list_transform(CAST(e.embedding AS DOUBLE[]),
            y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT)) AS q
          FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        sums AS (SELECT source, dd, sum(q[dd]) AS s
          FROM j CROSS JOIN (SELECT unnest(range(1, 65)) AS dd) GROUP BY 1, 2),
        nsq AS (SELECT source, sum(CAST(s AS HUGEINT) * s) AS nsq
          FROM sums GROUP BY 1),
        cnt AS (SELECT source, count(*) AS n FROM j GROUP BY 1),
        dots AS (SELECT a.source AS sa, b.source AS sb,
            sum(CAST(a.s AS HUGEINT) * b.s) AS dot
          FROM sums a JOIN sums b ON a.dd = b.dd AND a.source < b.source
          GROUP BY 1, 2)
        SELECT sa AS source_a, sb AS source_b, c1.n AS n_a, c2.n AS n_b,
          round(CAST(dot AS DOUBLE) / (sqrt(CAST(n1.nsq AS DOUBLE))
            * sqrt(CAST(n2.nsq AS DOUBLE))), 6) + 0 AS cos
        FROM dots JOIN nsq n1 ON n1.source = sa JOIN nsq n2 ON n2.source = sb
        JOIN cnt c1 ON c1.source = sa JOIN cnt c2 ON c2.source = sb
        WHERE n1.nsq != 0 AND n2.nsq != 0
        ORDER BY source_a, source_b""")),

    // cross-signal audit: does text quality correlate with embedding
    // norm? Pearson r from exact decimal moments over integer-quantized
    // inputs (norm² = Σ micro², quality in micro-units) — any drift here
    // flags degenerate embeddings for a quality stratum before training
    ("emb_quality_corr",
      (s, d) => {
        val q = Tables.documents(s, d).select(col("doc_id"),
          floor(TF.qualityScore(col("text")) * lit(1e6) + lit(0.5))
            .cast("long").as("q_micro"))
        val nsq = Tables.spread(s, Tables.embeddings(s, d))
          .select(col("vec_id").as("doc_id"),
            posexplode(Clustering.quantize(col("embedding")))
              .as(Seq("__d", "__x")))
          .groupBy("doc_id")
          .agg(sum(col("__x") * col("__x")).as("norm_sq"))
        Quantization.pearsonExact(q.join(nsq, "doc_id"), "norm_sq", "q_micro")
      },
      Some(s"""WITH q AS (SELECT doc_id,
          CAST(floor($dQuality * 1000000.0 + 0.5) AS BIGINT) AS qm
          FROM documents),
        e AS (SELECT vec_id AS doc_id, sum(x * x) AS nsq FROM (
          SELECT vec_id, unnest(list_transform(CAST(embedding AS DOUBLE[]),
            y -> CAST(floor(y * 1000000.0 + 0.5) AS BIGINT))) AS x
          FROM embeddings) GROUP BY 1),
        j AS (SELECT qm, nsq FROM q JOIN e USING (doc_id)),
        m AS (SELECT count(*) AS n,
          sum(CAST(nsq AS HUGEINT)) AS sx, sum(CAST(qm AS HUGEINT)) AS sy,
          sum(CAST(nsq AS HUGEINT) * nsq) AS sxx,
          sum(CAST(qm AS HUGEINT) * qm) AS syy,
          sum(CAST(nsq AS HUGEINT) * qm) AS sxy FROM j)
        SELECT n, round(CASE WHEN n * sxx - sx * sx > 0
            AND n * syy - sy * sy > 0
          THEN CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END, 6) + 0 AS r
        FROM m""")),

    // per-group top-k selection as a bounded AGGREGATE (TopK partial
    // aggregation: every map task reduces to k rows per group) instead of
    // a window sort of each group — identical output to the row_number
    // formulation the oracle runs
    ("sample_topk_group",
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), TF.qualityScore(col("text")).as("q"))
        .groupBy("lang")
        .agg(graft.functions.TopK.topK(3)(col("q"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("rk", "x")))
        .select(col("lang"), (col("rk") + 1).cast("int").as("rank"),
          col("x.id").as("doc_id"), col("x.score").as("q"))
        .orderBy("lang", "rank"),
      Some(s"""WITH q AS (SELECT lang, doc_id, $dQuality AS q FROM documents),
        rk AS (SELECT lang, doc_id, q, CAST(row_number() OVER (
            PARTITION BY lang ORDER BY q DESC, doc_id ASC) AS INT) AS rank
          FROM q)
        SELECT lang, rank, doc_id, q FROM rk WHERE rank <= 3
        ORDER BY lang, rank"""))
  )
}
