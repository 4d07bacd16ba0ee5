package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  */
object Similarity {

  /** Rank the scored candidates: top-k rows per group via the bounded
    * [[graft.functions.TopK]] aggregate — partial aggregation means each
    * map task ships at most k rows per group, so a handful of query groups
    * over a huge corpus is NOT a single-reducer sort (which is what a
    * row_number window would do). Output matches the window formulation
    * exactly (score desc, id asc ties). */
  private def rankTopK(scored: DataFrame, k: Int, groupCol: String,
      scoreCol: String, idCol: String): DataFrame =
    scored.groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(k)(col(scoreCol), col(idCol)).as("tk"))
      .select(col(groupCol), posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col(groupCol), col("s.id").as("neighbor_id"),
        col("s.score").as(scoreCol), (col("pos") + 1).cast("int").as("rank"))

  /** Brute-force top-k by cosine. `queries` must be small (it is broadcast).
    * Ties break by ascending corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
      .select(col(qIdCol), col(idCol), col("cos"))
    rankTopK(scored, k, qIdCol, "cos", idCol)
  }

  /** Centroid-affinity metric: similarity (descending = best first). The
    * default is cosine; any deterministic (vec, centroid) -> Column scoring
    * works (negated L2 for euclidean clustering). */
  type Metric = (Column, Column) => Column
  val CosineMetric: Metric = (a, b) => cosine(a, b)
  val NegL2Metric: Metric = (a, b) => -l2Distance(a, b)

  /** Assign each corpus vector to its best centroid: broadcast join +
    * argmax AGGREGATE `max(struct(aff, -c_id))`. Partial aggregation
    * collapses the corpus x nlist expansion back to one row per vector
    * before the shuffle — a windowed row_number would shuffle the full
    * expansion and sort per-vector groups. Ties take the smallest c_id. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      cIdCol: String = "c_id", cVecCol: String = "c_vec",
      metric: Metric = CosineMetric): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .withColumn("aff", metric(col(vecCol), col(cVecCol)))
      .groupBy(col(idCol))
      .agg(first(col(vecCol)).as(vecCol),
        max(struct(col("aff").as("a"), (-col(cIdCol)).as("nc"))).as("m"))
      .select(col(idCol), col(vecCol), (-col("m.nc")).as(cIdCol))

  /** IVF top-k: probe the `nprobe` centroid lists nearest to each query.
    * Approximate — recall depends on nprobe/nlist; exactness returns as
    * nprobe -> nlist. */
  def ivfTopK(corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec",
      metric: Metric = CosineMetric): DataFrame = {
    val assigned = assignToCentroids(corpus, centroids, idCol, vecCol, metric = metric)
    // centroid lists each query probes
    val probeW = Window.partitionBy(col(qIdCol)).orderBy(col("aff").desc, col("c_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("aff", metric(col(qVecCol), col("c_vec")))
      .withColumn("rnk", row_number().over(probeW))
      .filter(col("rnk") <= nprobe)
      .select(col(qIdCol), col(qVecCol), col("c_id"))
    val scored = assigned.join(broadcast(probes), "c_id")
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
      .select(col(qIdCol), col(idCol), col("cos"))
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
    * the pair stage is a single dot product per collision, not a full
    * cosine; `dot / (normA * normB)` keeps the exact float expression
    * order of `cosine`, so values are bit-equal to the naive form. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val b = df.select(col(idCol), asDouble(col(vecCol)).as("__e"),
        cosineLshBuckets(df, vecCol, planes).as("bucket"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos",
        dot(col("a.__e"), col("b.__e")) / (col("a.__n") * col("b.__n")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("cos"))
  }
}
