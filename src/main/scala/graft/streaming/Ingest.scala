package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.core.{IoxSchema, NsTime}
import graft.operators.Upsert
import graft.sources.LineProtocol

/** Streaming ingest + lifecycle, the Spark twin of the reference's write
  * path (server/src/db.rs:627 store_entry; lifecycle/src/policy.rs;
  * persistence_windows/src/persistence_windows.rs):
  *
  *  - line-protocol text stream  -> parse in executors -> partitioned
  *    Parquet micro-batches (the "mutable buffer -> persisted chunk" flow
  *    collapses into Structured Streaming's micro-batch + exactly-once
  *    file sink; replay/checkpointing replaces the write-ahead buffer)
  *  - late-arrival tolerance     -> `withWatermark(ts, lateArrival)`
  *    (PersistenceWindows.late_arrival_period,
  *    persistence_windows.rs:24-57)
  *  - background compaction      -> [[compact]]: read small files,
  *    upsert-dedup on the primary key, sort by it, rewrite — the
  *    ReorgPlanner compact plan (query/src/frontend/reorg.rs:64-100)
  *  - hot ∪ cold unified view    -> [[hotColdView]]: queries see streamed
  *    (not yet compacted) data unioned with compacted Parquet, the
  *    Spark analog of one table spanning MUB/RUB/ObjectStore chunks
  *    (query/src/provider.rs:89-196).
  */
object Ingest {

  /** Parse a line-protocol text stream into a typed streaming DataFrame of
    * one measurement. Fully executor-side (flatMap over strings). */
  def parseStream(lines: Dataset[String], measurement: String, schema: StructType)
      : DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val fieldsIdx = schema.fields.zipWithIndex
    val parsed = lines.flatMap { raw =>
      LineProtocol.parseLines(Iterator.single(raw))
        .filter(_.measurement == measurement)
        .map { l =>
          val tagMap = l.tags.toMap
          val fieldMap = l.fields.toMap
          org.apache.spark.sql.Row.fromSeq(fieldsIdx.toSeq.map { case (f, _) =>
            IoxSchema.categoryOf(f) match {
              case Some(IoxSchema.Tag) => tagMap.get(f.name).orNull
              case Some(IoxSchema.Time) => l.timestampNs.getOrElse(0L)
              case _ => fieldMap.get(f.name).map {
                case LineProtocol.F64(v) => v
                case LineProtocol.I64(v) => v
                case LineProtocol.U64(v) => new java.math.BigDecimal(v.bigInteger)
                case LineProtocol.Str(v) => v
                case LineProtocol.Bool(v) => v
              }.orNull
            }
          })
        }.toSeq
    }(enc)
    parsed.toDF()
  }

  /** Start persisting a parsed stream to a date-partitioned Parquet layout
    * (`tablePath/part_date=YYYY-MM-DD/` — the partition-key template
    * `TimeFormat` of database_rules.rs:233). Watermark bounds state by the
    * late-arrival window. */
  def startPersist(df: DataFrame, tablePath: String, checkpoint: String,
      lateArrival: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    df.withColumn("ts_view", NsTime.nsToTimestamp(col(NsTime.TimeColumn)))
      .withWatermark("ts_view", lateArrival)
      .withColumn("part_date", to_date(col("ts_view")))
      .drop("ts_view")
      .writeStream
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("part_date")
      .trigger(trigger)
      .start()
  }

  /** Compaction job (batch): read a table directory, upsert-dedup on the
    * primary key with arrival order taken from the real file-modification
    * timestamp (`_metadata.file_modification_time`, a per-row hidden
    * column evaluated at scan — NOT monotonically_increasing_id, whose
    * partition-index prefix follows Spark's size-ordered split planning,
    * not write order), sort by the sort key within partitions, and
    * rewrite compacted. Run on a schedule, exactly like the reference's
    * lifecycle `compact_chunks`. When the data carries an explicit chunk
    * sequence column (the robust path for concurrent writers), pass it as
    * `seqCol` instead. */
  def compact(spark: SparkSession, tablePath: String, outPath: String,
      pkCols: Seq[String], seqCol: Option[String] = None): Unit = {
    val raw = spark.read.parquet(tablePath)
    val df = seqCol match {
      case Some(c) => raw.withColumn("__seq", col(c))
      case None => raw.withColumn("__seq",
        unix_micros(col("_metadata.file_modification_time")))
    }
    val deduped = Upsert.dedup(df.drop(seqCol.toSeq: _*), pkCols, "__seq")
    val sorted = deduped
      .repartitionByRange(pkCols.map(col): _*)
      .sortWithinPartitions(pkCols.map(col): _*)
    // chunk metadata sidecar: lets tag_values/table_names answer from
    // metadata without scanning (reference TableSummary role). Scalar
    // stats ride the write job via Dataset.observe instead of a full
    // re-read of what was just written.
    if (pkCols.contains(NsTime.TimeColumn)) {
      val stats = graft.sources.StatsCatalog.computeDuringWrite(sorted,
        tagCols = pkCols.filterNot(_ == NsTime.TimeColumn),
        sortKey = Some(pkCols))( // dedup-sorted on PK just above
        observed => observed.write.mode("overwrite").parquet(outPath),
        spark.read.parquet(outPath))
      graft.sources.StatsCatalog.save(spark, outPath, stats)
    } else sorted.write.mode("overwrite").parquet(outPath)
  }

  /** Streaming twin of readWindowAggregate: per-tag tumbling-window counts
    * over a stream, with the watermark playing PersistenceWindows'
    * late_arrival_period (persistence_windows.rs:24-57) — a window
    * finalizes (emits, state dropped) once the watermark passes its end,
    * exactly like a closed window becoming persistable. Buckets are
    * labeled with the window STOP bound in ns, matching the batch
    * convention (func/window.rs:44-57): Spark's `window()` end for an
    * epoch-aligned grid is the same value windowStopNs computes. */
  def streamWindowCounts(df: DataFrame, tagCols: Seq[String], everyNs: Long,
      lateArrival: String = "10 minutes"): DataFrame = {
    require(everyNs % 1000L == 0L, "stream windows have microsecond grain")
    df.withColumn("__ts", NsTime.nsToTimestamp(col(NsTime.TimeColumn)))
      .withWatermark("__ts", lateArrival)
      .groupBy(tagCols.map(col) :+
        window(col("__ts"), s"${everyNs / 1000L} microseconds"): _*)
      .agg(count(lit(1)).as("n"))
      .select(tagCols.map(col) :+
        (unix_micros(col("window.end")) * 1000L).as(NsTime.TimeColumn) :+ col("n"): _*)
  }

  /** StreamSplit (reference query/src/exec/split.rs:34-120): split one
    * frame into (matching, rest) by a boolean expression — used by the
    * persist lifecycle to write "cold" rows (time <= split point) while
    * keeping "hot" rows buffered. Rows where the expression is NULL go to
    * the REST side, exactly like the reference (split.rs negates with
    * null-safe semantics). No custom plan node needed: two filters over
    * the same scan, each independently pushdown-eligible. */
  def streamSplit(df: DataFrame, expr: org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) =
    (df.filter(expr), df.filter(!coalesce(expr, lit(false))))

  /** Persist the cold half of a split and return the hot remainder —
    * the reorg "split plan" (query/src/frontend/reorg.rs:146-177):
    * everything at or before `splitTimeNs` is compact-sorted and written;
    * newer rows stay in memory for further writes. */
  def persistCold(df: DataFrame, splitTimeNs: Long, outPath: String,
      pkCols: Seq[String]): DataFrame = {
    val (cold, hot) = streamSplit(df, col(NsTime.TimeColumn) <= splitTimeNs)
    cold.repartitionByRange(pkCols.map(col): _*)
      .sortWithinPartitions(pkCols.map(col): _*)
      .write.mode("append").parquet(outPath)
    hot
  }

  /** One logical table over hot (streaming micro-batch files) and cold
    * (compacted) storage, with scan-time dedup preferring hot rows —
    * the reference's multi-chunk stitch + DeduplicateExec
    * (provider.rs:336-427). Schemas may differ; they merge. */
  def hotColdView(hot: DataFrame, cold: DataFrame, pkCols: Seq[String]): DataFrame = {
    val tagged = IoxSchema.mergeUnion(Seq(
      cold.withColumn("__seq", lit(0L)),
      hot.withColumn("__seq", lit(1L))))
    Upsert.dedup(tagged, pkCols, "__seq")
  }
}
