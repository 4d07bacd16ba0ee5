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

  /** Per-process memo of the base table frames, keyed by (session, dir,
    * table). `spark.read.parquet` pays a footer read + schema merge and
    * every reuse of the returned frame re-analyzes the same relation;
    * across a 265-query bench each table is re-loaded hundreds of times
    * and that fixed cost dominates the suite's flat ~0.4 s/query profile
    * (r12 verdict #6). The testdata dirs are immutable for a process
    * lifetime, so memoizing the DataFrame (NOT a .cache() of its data —
    * data caching measurably hurt here, see DocDedup.ensemblePairs) is
    * a pure plan-construction saving with bit-identical results. Keyed
    * on the session object itself so a restarted session (tests) can
    * never see a frame bound to a stopped one. */
  private val frameMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  /** get-then-putIfAbsent, NOT computeIfAbsent: the derived-frame memos
    * (events/documents below) build on the raw-load memo of the same
    * map, and a nested computeIfAbsent on one ConcurrentHashMap throws
    * "Recursive update" when the keys land in one bin. A racing
    * duplicate build is benign — both sides produce the same plan and
    * putIfAbsent keeps exactly one. */
  /** Drop entries whose session has stopped: the memo would otherwise
    * retain every stopped session (and its analyzed plans) for the
    * process lifetime — a slow leak in long test runs that create many
    * sessions (r13 advice). Swept on the MISS path only: a miss is the
    * moment a new session first loads a table (exactly when older
    * sessions have typically been stopped), and the map is small
    * (sessions x dirs x tables), so the sweep is O(dozens) and never on
    * the memo-hit hot path. */
  private def purgeStopped(): Unit = {
    val it = frameMemo.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
  }

  private def memo(spark: SparkSession, dir: String, slot: String)(
      mk: => DataFrame): DataFrame = {
    val key = (spark, dir, slot)
    val cur = frameMemo.get(key)
    if (cur != null) cur
    else {
      purgeStopped()
      val df = mk
      val prev = frameMemo.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memo(spark, dir, name)(spark.read.parquet(path(dir, name)))

  /** Schema-adaptive events loader. The testdata generator has shipped the
    * `ts` column under two physical encodings across rounds — INT64
    * TIMESTAMP(NANOS) (reads as a raw ns long under the legacy conf below,
    * which Spark's µs TimestampType cannot represent) and INT64
    * TIMESTAMP_MICROS (reads as timestamp / timestamp_ntz). Branch on the
    * file schema and normalize both to the engine's i64-ns convention
    * (reference schema.rs:36-40), µs-truncated so µs engines (DuckDB
    * reading the same file, Spark TimestampType) see identical values.
    * Output columns `ts_ns` (long) and `ts` (timestamp) are byte-identical
    * across encodings. The legacy conf is per-session and dynamic, so set
    * it just-in-time; it is a no-op for µs-encoded files.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "events::normalized") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      eventsNormalize(load(spark, dir, "events"))
    }

  /** Normalize any supported `ts` encoding to (`ts_ns`: long ns, `ts`:
    * µs timestamp). Factored out so specs can exercise both encodings. */
  def eventsNormalize(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val tsNs = raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw ns: truncate to µs grain
        col("ts") - pmod(col("ts"), lit(1000L))
      case TimestampType | TimestampNTZType =>
        // NTZ→TZ cast is identity under the UTC session timezone all
        // entry points pin (Verify/Bench/SparkSpec)
        unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
      case other =>
        throw new IllegalStateException(s"unsupported events.ts encoding: $other")
    }
    raw.withColumn("ts_ns", tsNs)
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
  /** Frames spread() has already returned, by object identity (weak —
    * entries die with their frames). The partition probe below costs a
    * full physical planning pass (`df.rdd`); ~60 query builders call
    * spread() on the ALREADY-SPREAD memoized documents/embeddings frames
    * (r15 measured: ~30-80 ms of pure plan construction per query per
    * bench pass), so the identity hit makes the redundant outer call
    * free without touching every call site.
    * Assumptions made explicit (r16 advice): the membership test relies
    * on Dataset NOT overriding equals/hashCode (true in every Spark
    * release to date — identity semantics), contains+add is non-atomic
    * under concurrent warmup threads (a racing duplicate probe is benign:
    * both sides plan the same frame once), and the cached decision pins
    * the defaultParallelism observed at first call (constant for a
    * session's lifetime in this engine's entry points). */
  private val spreadDone = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[DataFrame, java.lang.Boolean]))

  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    if (spreadDone.contains(df)) return df
    val target = spark.sparkContext.defaultParallelism
    val out = if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    spreadDone.add(out)
    out
  }

  /** The pipeline corpora load pre-spread: at test SF both arrive as ONE
    * parquet split, which would serialize every downstream per-row
    * regex/array/dot-product pass on one core (the text_* family spent
    * 1-2.5 s each on a 32-core box doing exactly that). Per-row compute
    * dominates every consumer of these two tables, so the one-time
    * ~600 KB rebalance always pays; at real scale splits >= cores and
    * [[spread]] is a no-op. Row-preserving, so oracle outputs (all
    * order-insensitive or explicitly ordered) are unchanged. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "documents::spread")(
      spread(spark, load(spark, dir, "documents")))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    memo(spark, dir, "embeddings::spread")(
      spread(spark, load(spark, dir, "embeddings")))

  /** Unspread scans, for plan-shape assertions: the default loaders'
    * round-robin rebalance is a scan-level concern, not part of any
    * operator's shuffle shape, and would read as a spurious Exchange
    * in a zero-shuffle pin. */
  def documentsRaw(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
  def embeddingsRaw(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
}
