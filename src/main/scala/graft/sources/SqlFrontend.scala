package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.IoxSchema

/** SQL frontend (reference M4: SqlQueryPlanner, query/src/frontend/sql.rs
  * + the `system` schema of docs/sql.md): registers engine tables as
  * temp views so `spark.sql(...)` is a full query surface, plus the
  * system-table analogs the reference exposes:
  *
  *  - `system_columns`: (table, column, type, category) — the reference's
  *    system.columns with IOx column categories.
  *  - `system_chunks`: (table, path, row_count, time_min, time_max) from
  *    stats sidecars — the reference's system.chunks summary view. For
  *    lifecycle-managed chunk directories, [[registerChunked]] instead
  *    registers the reference-shaped per-chunk views with the storage
  *    stage column (system_tables.rs:192) and `system_chunk_columns`
  *    (docs/sql.md:234, system_tables.rs:373).
  *
  * Catalyst takes over from here (analysis, optimization, codegen) the
  * way DataFusion does in the reference; no custom planner is needed.
  */
object SqlFrontend {

  /** Register each (name -> frame) as a replaceable temp view. */
  def register(spark: SparkSession, tables: Map[String, DataFrame]): Unit = {
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    systemColumns(spark, tables).createOrReplaceTempView("system_columns")
  }

  /** Register lifecycle-managed chunk tables: each table's dedup scan as
    * a view plus the per-chunk system tables (`system_chunks` with the
    * ChunkStorage stage column; `system_chunk_columns` with per-column
    * count/min/max) — all answered from sidecar metadata, no data scan. */
  def registerChunked(spark: SparkSession,
      tables: Map[String, graft.streaming.Lifecycle.ChunkedTable]): Unit = {
    // a server may register before its first lifecycle table exists; the
    // system views must still answer (empty), not crash on reduce
    val scans = tables.map { case (name, t) => name -> t.scan() }
    scans.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    systemColumns(spark, scans).createOrReplaceTempView("system_columns")
    def view(name: String, frames: Seq[DataFrame], emptySql: String): Unit =
      frames.reduceOption(_ union _)
        .getOrElse(spark.sql(emptySql).limit(0))
        .createOrReplaceTempView(name)
    val sorted = tables.toSeq.sortBy(_._1)
    view("system_chunks", sorted.map { case (n, t) => t.systemChunks(n) },
      """SELECT CAST(0 AS BIGINT) id, '' partition_key, '' table_name,
         '' storage, CAST(0 AS BIGINT) estimated_bytes,
         CAST(0 AS BIGINT) row_count, CAST(0 AS BIGINT) time_of_last_write""")
    view("system_chunk_columns",
      sorted.map { case (n, t) => t.systemChunkColumns(n) },
      """SELECT CAST(0 AS BIGINT) chunk_id, '' partition_key, '' table_name,
         '' column_name, '' storage, CAST(0 AS BIGINT) row_count,
         '' min_value, '' max_value""")
    view("system_operations", sorted.map { case (n, t) => t.systemOperations(n) },
      """SELECT '' id, '' status, CAST(0 AS BIGINT) wall_time_used,
         '' partition_key, '' table_name, CAST(0 AS BIGINT) chunk_id,
         '' chunk_ids, '' description""")
  }

  /** system.columns analog: one row per column with its engine category
    * (tag / field / time — absent for plain SQL tables). */
  def systemColumns(spark: SparkSession, tables: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    tables.toSeq.flatMap { case (name, df) =>
      df.schema.fields.map { f =>
        (name, f.name, f.dataType.simpleString,
          IoxSchema.categoryOf(f).getOrElse(""))
      }
    }.toDF("table_name", "column_name", "column_type", "category")
      .orderBy("table_name", "column_name")
  }

  /** system.chunks analog over compacted table paths: per-chunk summary
    * from the stats sidecars, no data scan. */
  def systemChunks(spark: SparkSession, tablePaths: Map[String, String]): DataFrame = {
    import spark.implicits._
    tablePaths.toSeq.flatMap { case (name, path) =>
      StatsCatalog.load(spark, path).map(st =>
        (name, path, st.rowCount, st.timeMin, st.timeMax))
    }.toDF("table_name", "path", "row_count", "time_min", "time_max")
      .orderBy("table_name")
  }
}
