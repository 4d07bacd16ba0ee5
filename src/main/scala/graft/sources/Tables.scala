package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.NsTime

/** Loaders for the driver-supplied corpus (/root/testdata, TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` so Catalyst's vectorized
  * reader, predicate pushdown and column pruning apply — this is the
  * engine's "Parquet chunk" scan path (reference
  * parquet_file/src/storage.rs:301 plays the same role via ParquetExec).
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** The events table's `ts` is physical INT64 TIMESTAMP(NANOS), which
    * Spark's µs TimestampType cannot represent; read it as a raw ns long
    * (exactly the reference's i64-ns convention, schema.rs:36-40) and keep
    * a derived µs view for SQL ergonomics. The legacy conf is per-session
    * and dynamic, so set it just-in-time.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns_raw")
      // truncate to µs grain: SQL engines with µs timestamps (DuckDB
      // reading this file, Spark TimestampType) see exactly these values,
      // so cross-engine results agree; the raw ns column stays available
      .withColumn("ts_ns", col("ts_ns_raw") - pmod(col("ts_ns_raw"), lit(1000L)))
      .withColumn("ts", NsTime.nsToTimestamp(col("ts_ns")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** Round-robin rebalance for CPU-dense per-row pipelines (shingling,
    * hashing): a small corpus arrives as ONE parquet split (single row
    * group) and would serialize all downstream per-row work on one core,
    * no matter how many the cluster has. Opt-in per pipeline — the shuffle
    * only pays for itself when per-row compute dominates, so cheap scans
    * should read the raw splits. At real scale splits >= cores and this is
    * a no-op. */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
