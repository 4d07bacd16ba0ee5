package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in QueriesCore / QueriesPipeline; each
  * entry pairs a Spark builder with a DuckDB oracle of identical output
  * shape (column names, deterministic total ordering).
  */
object SparkEntry {
  private val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    QueriesCore.entries ++ QueriesPipeline.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * (Multi-join + aggregate over the star schema; avoids the events table
    * whose TIMESTAMP(NANOS) needs a session conf the driver may not set.) */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.entries.find(_._1 == "q04_multi_join").get
      ._2(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (n, b, _) => n -> b }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
