package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Streaming exact deduplication — the continuous-ingest twin of
  * [[graft.pipeline.DocDedup.exactDedup]]. A training-data pipeline that
  * ingests a crawl continuously dedups each document AS IT ARRIVES rather
  * than re-running batch dedup over the accumulated corpus.
  *
  * Built on `dropDuplicatesWithinWatermark`: a first-writer-wins content
  * filter whose state store holds one entry per distinct content hash
  * seen within the watermark horizon — the knob that makes indefinite
  * streams viable (unbounded `dropDuplicates` state grows with corpus
  * cardinality forever; the watermark bounds it to the dedup window a
  * crawl actually needs, e.g. re-fetch storms arrive within hours).
  *
  * Scale posture: one shuffle on the content hash (the dedup key), state
  * partitioned with it; the text never enters the state store — only the
  * fixed-width hash survives the projection, so state size is
  * O(distinct hashes in window) × ~100 bytes regardless of document
  * length.
  */
object StreamDedup {

  /** Drop re-arrivals of identical content within `window` of event time.
    * `tsCol` must be a timestamp column (the watermark axis); the dedup
    * key is the normalized content hash plus any `extraKeys` (e.g. a
    * language partition). Emits input rows unchanged plus `text_hash`. */
  def dedupStream(df: DataFrame, textCol: String, tsCol: String,
      window: String, extraKeys: Seq[String] = Nil): DataFrame =
    df.withColumn("text_hash",
        md5(TextFunctions.normalize(col(textCol))))
      .withWatermark(tsCol, window)
      .dropDuplicatesWithinWatermark("text_hash" +: extraKeys)
}
