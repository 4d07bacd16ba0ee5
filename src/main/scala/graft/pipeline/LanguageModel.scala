package graft.pipeline

import org.apache.spark.sql.DataFrame
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
      .select(explode(TF.tokens(col(textCol))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__cw"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val occ = docs
      .select(col(idCol), explode(TF.ngrams(col(textCol), 2)).as("__bg"))
    val bgCounts = occ.groupBy("__bg").agg(count(lit(1)).as("__cbg"))
    occ
      .join(bgCounts, "__bg")
      .withColumn("__w1", split(col("__bg"), " ").getItem(0))
      .join(uni, "__w1")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log2((col("__cbg") + alpha) /
        (col("__cw") + lit(alpha) * col("__v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (-avg(col("__lp"))).as("bits_per_bigram"))
  }
}
