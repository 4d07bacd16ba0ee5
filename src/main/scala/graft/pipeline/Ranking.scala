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
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val base = docs
      .select(col(idCol), TF.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__dl"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("__dl")).as("avg_dl"))
    val tf = base
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"), col("__dl"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("__contrib",
        col("__idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("__dl") / col("avg_dl"))))
      .groupBy(col(idCol))
      .agg(sum(col("__contrib")).as("bm25"))
  }
}
