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

  /** Brute-force top-k by cosine. `queries` must be small (it is broadcast).
    * Ties break by ascending corpus id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qIdCol: String = "q_id", qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos", cosine(col(vecCol), col(qVecCol)))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Centroid-affinity metric: similarity (descending = best first). The
    * default is cosine; any deterministic (vec, centroid) -> Column scoring
    * works (negated L2 for euclidean clustering). */
  type Metric = (Column, Column) => Column
  val CosineMetric: Metric = (a, b) => cosine(a, b)
  val NegL2Metric: Metric = (a, b) => -l2Distance(a, b)

  /** Assign each corpus vector to its best centroid (broadcast join +
    * windowed argmax — corpus never shuffles). */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String,
      cIdCol: String = "c_id", cVecCol: String = "c_vec",
      metric: Metric = CosineMetric): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("aff").desc, col(cIdCol).asc)
    corpus.crossJoin(broadcast(centroids))
      .withColumn("aff", metric(col(vecCol), col(cVecCol)))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .drop("rnk", "aff", cVecCol)
  }

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
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cos").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
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

  /** All pairs with cosine >= threshold among LSH-bucket collisions. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      planes: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
      cosineLshBuckets(df, vecCol, planes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", cosine(col(s"a.$vecCol"), col(s"b.$vecCol")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), col("cos"))
  }
}
