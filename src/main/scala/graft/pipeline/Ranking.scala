package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Relevance ranking of a document corpus against a query term set —
  * the retrieval step of a training-data curation pipeline (e.g. pulling
  * topic-matched documents out of a crawl).
  *
  * Scale posture: BM25 against a query needs term frequencies for the
  * QUERY terms only, so token occurrences are filtered to the term set
  * BEFORE the one tf shuffle — no full-corpus inverted index is ever
  * materialized. Document-frequency and corpus statistics are two
  * single-row/short aggregates that broadcast back onto the scored side;
  * the whole plan is scan → filter → one groupBy → broadcast joins.
  */
object Ranking {

  /** Okapi BM25 (Robertson et al.; the `+1` idf variant that keeps every
    * term's contribution positive): per document
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with
    * `idf = ln((N − df + 0.5)/(df + 0.5) + 1)`. Documents matching no
    * term are absent from the result (score 0 by definition). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    // the single-query special case of the multi-query plan: one scoring
    // pipeline means the micro-quantization spelling (the cross-engine
    // bit-exactness contract) lives in exactly one place
    bm25MultiQuery(docs, idCol, textCol, Seq("q" -> terms), k1, b)
      .drop("query_id")

  /** Multi-query BM25: score EVERY query of a batch with corpus work
    * INDEPENDENT of the query count — the retrieval shape of a RAG
    * evaluation or a topic-routing pipeline, where thousands of queries
    * rank the same passage corpus. Returns one row per
    * (query_id, document) with a matching term.
    *
    * Scale posture: running [[bm25]] per query would redo the scan, the
    * tokenize and the tf shuffle once per query. Here the token stream is
    * filtered once to the UNION of all query vocabularies, term
    * frequencies are aggregated once (plus one corpus-stats aggregate),
    * and a broadcast (query_id, term) table fans each term row out to the
    * queries that asked for it — adding a query adds only broadcast-sized
    * work, and everything query-sized stays broadcast.
    *
    * Determinism: identical contribution quantization to [[bm25]] (each
    * per-term contribution floors to integer micro-units before the sum),
    * so per-query scores are exact integer sums in any engine. */
  def bm25MultiQuery(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every query needs at least one term")
    val sp = docs.sparkSession
    import sp.implicits._
    val queryTerms = queries
      .flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val base = docs
      .select(col(idCol), TF.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("__dl")).as("avg_dl"))
    val tf = base
      .select(col(idCol), col("__dl"), explode_outer(col("__toks")).as("term"))
      .filter(col("term").isin(allTerms: _*)) // in-set also drops the outer null
      .groupBy(col(idCol), col("term"), col("__dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .join(broadcast(queryTerms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__contrib",
        floor(col("__idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("avg_dl")))
          * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg((sum(col("__contrib")) / lit(1e6)).as("bm25"))
  }

  /** Classic tf-idf scoring against a query term set — the pre-BM25
    * baseline retrieval ranker, still the standard vectorizer for
    * lightweight corpus topic filters: per document
    * `Σ_t (1 + ln tf) · ln(N/df)` (sublinear tf, plain idf).
    *
    * Same scale shape as [[bm25]] (filter-before-shuffle, broadcast df
    * and corpus stats), with one determinism upgrade: each term's
    * contribution is quantized to integer micro-units before the
    * per-document sum, so scores are exact integer sums — no
    * accumulation-order dependence — and ORDER BY score is an exact
    * decimal comparison in any engine. */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "tf-idf needs at least one query term")
    val base = docs.select(col(idCol), TF.tokens(col(textCol)).as("__toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"))
    val tf = base
      .select(col(idCol), explode_outer(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*)) // in-set also drops the outer null
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__cq",
        floor((lit(1.0) + log(col("tf"))) * log(col("n_docs") / col("df"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col(idCol))
      .agg((sum(col("__cq")) / lit(1e6)).as("tfidf"))
  }

  /** Per-document keyphrase extraction: the `topK` terms of each
    * document by tf·idf (`(1 + ln tf) · ln(N/df)`, the [[tfidf]]
    * weighting applied per term instead of summed) — the classic
    * unsupervised keyword tagger for corpus topic audits.
    *
    * Scale shape: one token-count aggregate per (doc, term), a
    * vocab-sized df table joined back (AQE broadcasts it), then a
    * row_number window PARTITIONED BY DOCUMENT — a high-cardinality
    * key, so groups are tiny and the sort is per-document, never a
    * corpus sort. Scores quantize to integer micro-units; ties break by
    * term asc — total determinism. */
  def keyphrases(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    require(topK >= 1, "need a positive keyphrase count")
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol), TF.tokens(col(textCol)).as("__toks"))
    val stats = base.agg(count(lit(1)).as("n_docs"))
    val tf = base
      .select(col(idCol), explode_outer(col("__toks")).as("term"))
      .filter(col("term").isNotNull && length(col("term")) >= 4)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sq").desc, col("term").asc)
    tf.join(df, "term")
      .crossJoin(broadcast(stats))
      .withColumn("__sq",
        floor((lit(1.0) + log(col("tf"))) * log(col("n_docs") / col("df"))
          * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank").cast("int").as("rank"), col("term"),
        (col("__sq").cast("double") / lit(1e6)).as("score"))
  }

  /** Zipf-law fit over the corpus token distribution: least-squares slope
    * and intercept of `ln(freq)` against `ln(rank)` for the `topN` most
    * frequent tokens. Natural-language corpora land near slope ≈ −1;
    * machine-generated or template-heavy corpora flatten or step — a
    * one-row corpus health metric (token distribution sanity check) run
    * alongside per-document quality scores.
    *
    * Determinism: each term's (ln rank, ln freq) pair is quantized to
    * integer micro-units before the Σx/Σy/Σxy/Σxx sums, so the normal
    * equations divide identical integers in every engine; only the two
    * final divisions are floats. Scale shape: one token-count aggregate
    * (vocab-sized), a bounded top-N (orderBy+limit on the vocab frame,
    * NOT the corpus), and a single-row reduce. */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int = 100): DataFrame = {
    require(topN >= 2, "a line needs two points")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode_outer(TF.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull) // outer+filter: see DocDedup.explodePairs
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(topN)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("tok").asc)))
    val q = ranked.select(
      round(log(col("rank").cast("double")) * 1e6).cast("long").as("xq"),
      round(log(col("cnt").cast("double")) * 1e6).cast("long").as("yq"))
    q.agg(count(lit(1)).as("n"), sum("xq").as("sx"), sum("yq").as("sy"),
        sum(col("xq") * col("yq")).as("sxy"), sum(col("xq") * col("xq")).as("sxx"))
      .select(col("n").cast("long").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round(((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"))
          / 1e6, 6).as("intercept_ln"))
  }

  /** Clipped n-gram precision of each candidate document against a
    * REFERENCE corpus — the per-document core of corpus BLEU (Papineni
    * et al. 2002): p_n = Σ_g min(tf_doc(g), tf_ref(g)) / Σ_g tf_doc(g),
    * an absent reference gram clipping to 0. Reads as a coverage /
    * contamination eval between two corpus builds: ≈1 means the
    * candidate's phrasing is already in the reference, ≈0 means novel
    * text. No brevity penalty (there is no aligned reference length for
    * corpus-vs-corpus scoring).
    *
    * Scale shape: candidate tf is a per-(doc, gram) aggregate; the
    * reference side collapses to a vocab-sized count table joined by
    * gram (AQE broadcasts it when small). Integer clipped/total sums, so
    * the ratio is one exact division. Documents with no n-grams surface
    * with NULL precision (explode_outer keeps them). */
  def ngramPrecision(cand: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cTf = cand
      .select(col(idCol), explode_outer(TF.ngrams(col(textCol), n)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    val rTf = ref.select(explode(TF.ngrams(col(textCol), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("rc"))
    cTf.join(rTf, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("g").isNull, 0L)
          .otherwise(least(col("c"), coalesce(col("rc"), lit(0L))))).as("clipped"),
        sum(when(col("g").isNull, 0L).otherwise(col("c"))).as("total"))
      .withColumn("precision",
        when(col("total") > 0, col("clipped").cast("double") / col("total")))
  }
}
