package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Streaming semantic deduplication — the continuous-ingest twin of
  * [[graft.pipeline.Clustering.semanticDedup]]: each arriving batch of
  * embeddings is checked against the corpus-so-far's PERSISTED IVF index
  * ([[Similarity.ivfIndex]] rows), and only then folded into it — the
  * incremental posture of [[graft.pipeline.DocDedup.lshIndex]] applied
  * to vectors.
  *
  * Shape per micro-batch (compose inside `foreachBatch`, the
  * [[WriteBuffer]] / span-miner discipline — the scorer's bounded TopK
  * aggregate and broadcast joins are batch operators):
  *
  *  1. [[nearDupsAgainstIndex]] — the BATCH assigns itself to `nprobe`
  *     lists and scores only those lists' members (the index is never
  *     re-assigned or re-shuffled; batch-sized frames broadcast);
  *  2. survivors append via [[appendToIndex]] — one assignment pass over
  *     the batch alone.
  *
  * State is the index itself (parquet, partitioned by list id), not
  * executor memory — restarts resume from what was last persisted. */
object StreamSemanticDedup {

  /** Flag each batch vector's nearest indexed neighbor: returns
    * (idCol, neighbor_id, cos micro, is_dup) with `is_dup` = micro-cosine
    * >= `thresholdMicro` (the quantize-before-compare contract —
    * [[Similarity.micro]]). Batch vectors with no candidate in the probed
    * lists (or zero norm) are kept with a NULL neighbor.
    *
    * Replay-safe: the scorer runs WITHOUT the retrieval path's self-id
    * exclusion (`excludeSelf = false`), so a batch vector re-delivered
    * with an id already in the index (at-least-once redelivery) matches
    * its own indexed copy at cos = 1e6 and flags `is_dup` — the
    * filter-survivors-then-append loop then drops it instead of
    * inserting a second copy. */
  def nearDupsAgainstIndex(batch: DataFrame, index: DataFrame,
      centroids: DataFrame, thresholdMicro: Long, nprobe: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = batch.select(col(idCol).as("__bid"), col(vecCol).as("q_vec"))
    val best = Similarity.ivfTopKIndexed(index, centroids,
        q.withColumnRenamed("__bid", "q_id"), k = 1, nprobe = nprobe,
        idCol = idCol, microRank = true, excludeSelf = false)
      .select(col("q_id").as(idCol), col("neighbor_id"), col("cos"))
    batch.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .withColumn("is_dup",
        coalesce(col("cos") >= thresholdMicro, lit(false)))
  }

  /** Fold a batch into the index: assign ONLY the batch to the centroid
    * lists and append. Callers typically filter to `!is_dup` survivors
    * first so duplicates never enter the index. */
  def appendToIndex(index: DataFrame, batch: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    index.unionByName(
      Similarity.ivfIndex(batch, centroids, idCol, vecCol, microRank = true))
}
