package graft

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.pipeline.DocDedup

/** Streaming incremental span mining: micro-batches of documents arrive
  * over Structured Streaming; each batch's repeated spans are mined
  * against the corpus-so-far shingle index
  * ([[DocDedup.incrementalRepeatedSpans]]), then the batch folds into
  * the index ([[DocDedup.mergeSpanShingleIndex]]) — the foreachBatch
  * deployment of the incremental path (the index would live in the
  * warehouse at scale; here it round-trips through collected rows so
  * each micro-batch sees a fully materialized snapshot, exactly like a
  * reload from storage).
  *
  * The parity contract pinned here: for EVERY micro-batch, the
  * streaming spans equal the one-shot batch recompute over all
  * documents that had arrived by then, restricted to that batch —
  * arrival-order semantics, no drift as the corpus grows. */
class StreamSpansSpec extends SparkSpec {
  import spark.implicits._

  private val indexSchema = StructType(Seq(
    StructField("sh", StringType), StructField("n", LongType)))

  test("per-micro-batch spans match the batch recompute over the " +
      "corpus so far (arrival-order parity)") {
    val k = 3
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    // index snapshot between micro-batches (metadata-sized here; the
    // warehouse-parquet equivalent at scale)
    var indexRows: Seq[Row] = Nil
    val arrived = mutable.ArrayBuffer.empty[(Long, String)]
    val perBatch = mutable.Map.empty[Long, Seq[(Long, Int, Int, Long)]]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val batch = df.collect().map(r => (r.getLong(0), r.getString(1)))
        if (batch.nonEmpty) {
          val batchDf = batch.toSeq.toDF("doc_id", "text")
          val index = spark.createDataFrame(
            spark.sparkContext.parallelize(indexRows, 1), indexSchema)
          perBatch(batchId) = DocDedup.incrementalRepeatedSpans(
              index, batchDf, "doc_id", "text", k)
            .orderBy("doc_id", "span_start")
            .as[(Long, Int, Int, Long)].collect().toSeq
          indexRows = DocDedup.mergeSpanShingleIndex(
            index, batchDf, "doc_id", "text", k).collect().toSeq
          arrived ++= batch
        }
        ()
      }
      .start()
    try {
      val b1 = Seq(
        (1L, "the quick brown fox jumps high"),
        (2L, "prefix the quick brown fox jumps low")) // repeats vs doc 1
      val b2 = Seq(
        (3L, "tail the quick brown fox jumps again"), // repeats vs index
        (4L, "m n o p m n o p"), // repeats wholly inside itself
        (5L, "nothing shared here at all"))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()

      // arrival-order parity per batch
      val batches = perBatch.keys.toSeq.sorted
      assert(batches.size == 2, perBatch.keys.toSeq)
      val upTo = mutable.ArrayBuffer.empty[(Long, String)]
      for ((bid, docs) <- batches.zip(Seq(b1, b2))) {
        upTo ++= docs
        val want = DocDedup.repeatedSpans(
            upTo.toSeq.toDF("doc_id", "text"), "doc_id", "text", k)
          .filter($"doc_id".isin(docs.map(_._1): _*))
          .orderBy("doc_id", "span_start")
          .as[(Long, Int, Int, Long)].collect().toSeq
        assert(perBatch(bid) == want, s"batch $bid: ${perBatch(bid)} != $want")
      }
      // and the semantics are the interesting ones: batch-2 docs repeat
      // against batch-1 history (doc 3) and within themselves (doc 4)
      assert(perBatch(batches(1)).exists(_._1 == 3L))
      assert(perBatch(batches(1)).exists(_._1 == 4L))
      assert(!perBatch(batches(1)).exists(_._1 == 5L))
    } finally q.stop()
  }
}
