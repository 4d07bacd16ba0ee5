package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.NsTime
import graft.operators.Upsert
import graft.sources.StatsCatalog

/** Data-lifecycle policy — the reference's background loop
  * (lifecycle/src/policy.rs) re-expressed as a pure planner plus a
  * chunk-directory executor over the engine's compaction/persist
  * primitives.
  *
  * Rules (data_types/src/database_rules.rs:124-186 LifecycleRules):
  *  - `lateArriveWindowMs` — a chunk that hasn't been written for this
  *    long "can move": it closes and becomes compactable / persistable
  *    (can_move, policy.rs:556-568); it is also the persist split point
  *    (writers get this long to send late data).
  *  - `persistRowThreshold` / `persistAgeThresholdMs` — persistence
  *    triggers on EITHER bound (maybe_persist_chunks, policy.rs:291-330);
  *    a triggered persist stalls compaction that round so it can claim
  *    its chunks (policy.rs:276-289).
  *  - `bufferSizeSoft` / `bufferSizeHard` — over the soft limit the
  *    planner persists early to shrink the buffer (the reference instead
  *    drops already-persisted in-memory copies, maybe_free_memory
  *    policy.rs:55 — a distinction without a difference here, where hot
  *    chunks ARE the only copies); when persistence is off, the
  *    flag-gated `dropNonPersisted` response drops closed hot chunks
  *    oldest-first (FreeAction::Drop, policy.rs:78-84); over the hard
  *    limit writes are rejected (database_rules.rs:130-132).
  *  - `retentionNs` — whole chunks whose data time range has aged out
  *    expire and are dropped, any stage, before the rest of the round
  *    plans.
  *
  * The planner is pure ((chunk metadata, rules, now) -> actions), like
  * the reference policy over its LockablePartition trait — unit-testable
  * on synthetic timelines with no cluster. The executor mutates a chunk
  * directory layout (`hot/open-N`, `hot/compacted-N`, `cold/chunk-N`,
  * each with a stats sidecar) using the same dedup-sort-write machinery
  * as [[Ingest.compact]], and every listing/planning decision reads only
  * sidecar metadata — no data scan, which is what keeps the loop
  * O(chunks) at 100 TB.
  */
object Lifecycle {

  final case class Rules(
      lateArriveWindowMs: Long = 5 * 60 * 1000L,
      persistRowThreshold: Long = 1000000L,
      persistAgeThresholdMs: Long = 30 * 60 * 1000L,
      bufferSizeSoft: Option[Long] = None,
      bufferSizeHard: Option[Long] = None,
      persist: Boolean = true,
      /** Under memory pressure, allow dropping closed chunks that were
        * never persisted — accepted data loss, off by default
        * (database_rules.rs:133-135 drop_non_persisted). */
      dropNonPersisted: Boolean = false,
      /** Age-based retention on the DATA time axis: a chunk whose entire
        * time range is older than `dataNow - retentionNs` expires and is
        * dropped, any stage. Whole-chunk granularity, like the
        * reference's chunk-level lifecycle ops. */
      retentionNs: Option[Long] = None,
      /** Max chunks merged by ONE compact/persist action (r14 chunk-count
        * measurement: an unbounded 1000-chunk merge ran 20+ minutes —
        * every member costs a footer read + a relation in the union plan,
        * so per-action work must be bounded and reduction GEOMETRIC:
        * 1000 chunks → ⌈1000/64⌉ actions → 16 chunks → 1. Correctness is
        * unaffected by splitting: cross-group duplicates stay resolved by
        * the overlap-aware dedup scan and the later-chunk-id-wins rule,
        * same as any two overlapping chunks that were never compacted
        * together. */
      maxCompactFanIn: Int = 64) {
    // fail loudly, not livelock: a fan-in under 1 would plan empty
    // Persist/Compact actions forever and the policy would never quiesce
    require(maxCompactFanIn >= 1,
      s"maxCompactFanIn must be >= 1 (got $maxCompactFanIn)")
  }

  sealed trait Stage
  case object Open extends Stage // receiving writes (OpenMutableBuffer)
  case object Compacted extends Stage // closed + merged (ReadBuffer analog)
  case object Persisted extends Stage // cold / object store

  /** The reference's ChunkStorage stage string for a chunk's lifecycle
    * stage (data_types/src/chunk_metadata.rs:35-62 as_str) — what the
    * system.chunks `storage` column carries. */
  def storageOf(stage: Stage): String = stage match {
    case Open => "OpenMutableBuffer"
    case Compacted => "ReadBuffer"
    case Persisted => "ObjectStoreOnly"
  }

  final case class ChunkMeta(id: Long, path: String, stage: Stage,
      rows: Long, bytes: Long, lastWriteMs: Long,
      /** Max data timestamp from the sidecar — what retention expires on.
        * MaxValue when unknown (no sidecar): never expires. */
      timeMaxNs: Long = Long.MaxValue)

  sealed trait Action
  /** Merge hot chunks (idle opens roll over + existing compacted ones
    * under the row budget) into one compacted chunk. */
  final case class Compact(chunkIds: Seq[Long]) extends Action
  /** Combine persistable hot chunks, split at `splitNs`: rows at or
    * before it go cold, the remainder reopens hot (prepare_persist /
    * StreamSplit flow). */
  final case class Persist(chunkIds: Seq[Long], splitNs: Long) extends Action
  /** Hot bytes exceed the hard limit: reject writes. */
  case object RejectWrites extends Action
  /** Delete these chunks outright: retention expiry, or memory-pressure
    * freeing (policy.rs:55-118 maybe_free_memory / FreeAction::Drop). */
  final case class Drop(chunkIds: Seq[Long]) extends Action

  /** One policy round (check_for_work, policy.rs:448): returns the
    * actions to run now. `nowMs` and all chunk times share one clock;
    * the persist split point is ns on the DATA time axis, so callers
    * whose data time differs from the wall clock pass `splitNsOf`. */
  def plan(chunks: Seq[ChunkMeta], rules: Rules, nowMs: Long,
      splitNsOf: Long => Long = _ * 1000000L): Seq[Action] = {
    // retention first: chunks whose whole time range aged out expire
    // regardless of stage, and the rest of the round plans over what
    // remains (the drop also relieves any buffer pressure)
    val expired = rules.retentionNs.toSeq.flatMap { r =>
      chunks.filter(_.timeMaxNs < splitNsOf(nowMs) - r)
    }
    val drops = if (expired.isEmpty) Nil else Seq(Drop(expired.map(_.id).sorted))
    val live = chunks.filterNot(c => expired.exists(_.id == c.id))

    val hot = live.filter(_.stage != Persisted).sortBy(_.id)
    val hotBytes = hot.map(_.bytes).sum

    if (rules.bufferSizeHard.exists(hotBytes >= _)) return drops :+ RejectWrites

    val overSoft = rules.bufferSizeSoft.exists(hotBytes >= _)
    val closed = hot.filter(c => nowMs - c.lastWriteMs >= rules.lateArriveWindowMs)

    // persistence first — it stalls compaction when triggered
    if (rules.persist && closed.nonEmpty) {
      val persistableRows = closed.map(_.rows).sum
      val oldestAgeMs = nowMs - hot.map(_.lastWriteMs).min
      if (persistableRows >= rules.persistRowThreshold ||
          oldestAgeMs >= rules.persistAgeThresholdMs || overSoft) {
        // fan-in bounded per ACTION, but every closed chunk persists this
        // round: one Persist per <= maxCompactFanIn chunks, disjoint sets,
        // executed concurrently by runOnce — the reference's lifecycle
        // drives independent per-partition persist actions in parallel
        // (lifecycle/src/policy.rs check_for_work loops all partitions);
        // a single action per round made the ×1000-chunk persist timeline
        // 16 sequential rounds (r14 measurement). Groups are id-ordered,
        // so later input chunks land in later actions (and later output
        // ids — last-write-wins is preserved across groups).
        val splitNs = splitNsOf(nowMs - rules.lateArriveWindowMs)
        return drops ++ closed.sortBy(_.id).grouped(rules.maxCompactFanIn)
          .map(g => Persist(g.map(_.id), splitNs)).toSeq
      }
    }

    // memory pressure with persistence unavailable: the reference frees
    // persisted in-memory copies first, then (flag-gated) drops
    // unpersisted chunks oldest-first (maybe_free_memory, policy.rs:55).
    // Here hot chunks are the ONLY copies (no unload analog, documented
    // above), so the entire response is the flag-gated one: drop closed
    // hot chunks, oldest write first, until projected under the limit.
    if (overSoft && !rules.persist && rules.dropNonPersisted && closed.nonEmpty) {
      var bytes = hotBytes
      val toDrop = closed.sortBy(c => (c.lastWriteMs, c.id)).takeWhile { c =>
        val stillOver = rules.bufferSizeSoft.exists(bytes >= _)
        if (stillOver) bytes -= c.bytes
        stillOver
      }
      if (toDrop.nonEmpty) return drops :+ Drop(toDrop.map(_.id).sorted)
    }

    // compaction: rolled-over opens + small compacted chunks, row budget =
    // persist threshold (maybe_compact_chunks, policy.rs:187-257)
    var rowsLeft = rules.persistRowThreshold
    val rolledOver = closed.filter(_.stage == Open)
    val smallCompacted = closed.filter(c => c.stage == Compacted && {
      val fits = c.rows < rowsLeft
      if (fits) rowsLeft -= c.rows
      fits
    })
    val toCompact = (rolledOver ++ smallCompacted).sortBy(_.id)
    if (toCompact.size >= 2 || rolledOver.nonEmpty)
      // one Compact action per <= maxCompactFanIn chunks: bounded merge
      // width per action, geometric chunk-count reduction across rounds
      drops ++ toCompact.grouped(rules.maxCompactFanIn.max(2))
        .map(g => Compact(g.map(_.id))).toSeq
    else drops
  }

  // ------------------------------------------------------------- executor

  /** Dedicated bounded pool for driver-side blocking lifecycle work:
    * concurrent sidecar/filesystem metadata reads and the Spark jobs of
    * concurrent compact/persist actions. NOT ExecutionContext.global —
    * blocking the CPU-sized global pool on filesystem latency starves
    * every other user of it on the driver. Daemon threads, so an idle
    * pool never pins the JVM. */
  private val ioEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(64,
        new java.util.concurrent.ThreadFactory {
          private val i = new java.util.concurrent.atomic.AtomicInteger
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"graft-lifecycle-io-${i.getAndIncrement()}")
            t.setDaemon(true); t
          }
        }))

  /** A table as a directory of lifecycle-managed chunks. `pkCols` is the
    * dedup/sort key (tags + time). All metadata comes from sidecars +
    * file status; chunk data is only read by compact/persist jobs.
    *
    * `metaTimeout` / `jobTimeout` bound every internal await (metadata
    * fan-out / whole compact-persist Spark jobs): one hung object-store
    * call surfaces as a TimeoutException instead of stalling the driver
    * forever (`Await.result(..., Inf)` was the r14 shape). */
  final class ChunkedTable(spark: SparkSession, tablePath: String,
      pkCols: Seq[String],
      metaTimeout: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.FiniteDuration(10, "min"),
      jobTimeout: scala.concurrent.duration.FiniteDuration =
        scala.concurrent.duration.FiniteDuration(4, "h")) {
    private val root = new Path(tablePath)
    // ONE FileSystem for the table: newHadoopConf() clones the session conf
    // per call (~1 ms CPU) and every chunk-metadata touch needs the fs —
    // a per-call def made 10^4-chunk listings conf-construction-bound
    private lazy val fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())

    /** Append a write batch as a new open chunk stamped at `nowMs`. */
    def writeChunk(df: DataFrame, nowMs: Long): ChunkMeta = {
      val id = nextId()
      val path = new Path(root, s"hot/open-$id")
      writeWithStats(df, path, sorted = false, durable = false)
      stamp(path, nowMs)
      meta(path, Open, id)
    }

    /** Land n write batches as n open chunks in ONE Spark write job plus
      * ONE stats job: union the batches under a chunk-id partition column,
      * write `partitionBy` (each chunk becomes a partition directory,
      * renamed into `hot/open-$id`), and compute every chunk's scalar
      * sidecar stats with one grouped aggregation. The serial
      * [[writeChunk]] path schedules 1 job per chunk and is job-LAUNCH
      * bound at high chunk counts (~0.5-1.5 s/chunk, r14 ChunkScaleBench);
      * a real ingest batch amortizes the launch across every chunk it
      * lands, which is exactly what this does. Batches must share a
      * union-mergeable schema (one table's write batches do). */
    def writeChunks(dfs: Seq[DataFrame], nowMs: Long): Seq[ChunkMeta] = {
      if (dfs.isEmpty) return Nil
      if (dfs.size == 1) return Seq(writeChunk(dfs.head, nowMs))
      val base = nextId()
      val ids = dfs.indices.map(i => base + i)
      val keyCol = "__graft_chunk"
      val union = graft.core.IoxSchema.mergeUnion(
        dfs.zip(ids).map { case (df, id) => df.withColumn(keyCol, lit(id)) })
      val landed = landPartitioned(union, keyCol, nowMs)
      dfs.zip(ids).map { case (df, id) =>
        landed.get(id) match {
          case Some(m) => m
          case None =>
            // an EMPTY batch leaves no partition directory and no stats
            // row — land it through the serial path (nextId() is safe:
            // it re-lists, so already-renamed batch ids are visible)
            writeChunk(df, nowMs)
        }
      }
    }

    /** Batch-land a DISTRIBUTED frame as one open chunk per distinct
      * value of `chunkCol` (non-negative longs; chunk id = next free id
      * + value): ONE `partitionBy` write job + ONE grouped stats job
      * regardless of chunk count. This is the 100 TB backfill entry
      * point — a real ingest batch arrives as one distributed frame.
      * [[writeChunks]]'s union-of-frames form measured 1.8× SLOWER than
      * serial at 10³ driver-local frames (r15 ChunkScaleBench: the
      * 1000-child union plan plus driver-embedded rows dominate); this
      * form has no union and no driver-side data at all. */
    def writeChunksBy(df: DataFrame, chunkCol: String,
        nowMs: Long): Seq[ChunkMeta] = {
      val base = nextId()
      val keyCol = "__graft_chunk"
      val keyed = df.withColumn(keyCol, col(chunkCol).cast("long") + lit(base))
        .drop(chunkCol)
      landPartitioned(keyed, keyCol, nowMs).values.toSeq.sortBy(_.id)
    }

    /** Shared batch-landing tail: write `keyed` partitioned by `keyCol`
      * into a temp dir (one job), compute every chunk's scalar sidecar
      * stats with one grouped aggregation, then rename each partition
      * directory into `hot/open-<id>` with its sidecar. Returns landed
      * chunks by id (empty groups simply have no entry). */
    private def landPartitioned(keyed: DataFrame, keyCol: String,
        nowMs: Long): Map[Long, ChunkMeta] = {
      val tmp = new Path(root, s".batch-${System.nanoTime()}")
      keyed.write.partitionBy(keyCol).mode("error").parquet(tmp.toString)
      val statsById = StatsCatalog.computeGrouped(keyed, keyCol)
      val hotDir = new Path(root, "hot")
      if (!fs.exists(hotDir)) fs.mkdirs(hotDir)
      val out = statsById.toSeq.sortBy(_._1).map { case (id, stats) =>
        val path = new Path(root, s"hot/open-$id")
        require(fs.rename(new Path(tmp, s"$keyCol=$id"), path),
          s"batch chunk move failed for chunk $id")
        StatsCatalog.save(spark, path.toString, stats)
        stamp(path, nowMs)
        id -> ChunkMeta(id, path.toString, Open, rows = stats.rowCount,
          bytes = fs.getContentSummary(path).getLength, lastWriteMs = nowMs,
          timeMaxNs = stats.timeMax)
      }.toMap
      fs.delete(tmp, true)
      out
    }

    /** Bounded-pool fan-out with a finite deadline: dedicated I/O threads
      * (never the global pool), `blocking{}`-marked bodies, and a named
      * TimeoutException when the filesystem hangs past the deadline. */
    private def awaitAll[A](what: String,
        timeout: scala.concurrent.duration.FiniteDuration)(
        bodies: Seq[() => A]): Seq[A] = {
      import scala.concurrent.{Await, Future, blocking}
      implicit val ec: scala.concurrent.ExecutionContext = ioEc
      try Await.result(
        Future.sequence(bodies.map(b => Future(blocking(b())))), timeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new java.util.concurrent.TimeoutException(
            s"$what on $tablePath did not complete within $timeout")
      }
    }

    def chunks(): Seq[ChunkMeta] = {
      // per-chunk metadata (sidecar JSON + file status) is fetched
      // CONCURRENTLY: it is ~1 ms of filesystem latency per chunk, and a
      // sequential loop made listing 10⁴ chunks an 11 s driver stall
      // (r14 measurement) — on an object store the per-call latency is
      // 10-50× that. Order is restored by the final sort.
      def ls(sub: String, stage: Stage, prefix: String): Seq[() => ChunkMeta] = {
        val dir = new Path(root, sub)
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
          .map(st => () => meta(st.getPath, stage,
            st.getPath.getName.stripPrefix(prefix).toLong))
      }
      awaitAll("chunk metadata listing", metaTimeout)(
        ls("hot", Open, "open-") ++ ls("hot", Compacted, "compacted-") ++
          ls("cold", Persisted, "chunk-")).sortBy(_.id)
    }

    /** The queryable view: overlap-aware dedup scan over every chunk,
      * later chunk ids winning (provider.rs chunk stitch). A chunk is
      * self-clean iff its sidecar RECORDS a SortKey equal to the scan's
      * dedup key — metadata-driven like the reference's
      * may_contain_pk_duplicates, not a naming convention. */
    def scan(): DataFrame = scan(graft.core.RpcPredicate())

    /** Predicate-aware scan: chunks whose sidecar stats prove the
      * predicate unsatisfiable (time range everywhere; column min/max
      * only for chunks overlapping no other chunk — field pruning of an
      * overlapped chunk could resurrect a stale PK value through dedup)
      * never reach the plan; the predicate then applies to the
      * surviving union. */
    def scan(pred: graft.core.RpcPredicate): DataFrame = {
      val cs = chunks()
      require(cs.nonEmpty, s"no chunks under $tablePath")
      val loaded = cs.map(c => c -> StatsCatalog.load(fs, c.path))
      val timeKept = loaded.filter { case (_, st) =>
        st.forall(StatsCatalog.timeMayMatch(_, pred))
      }
      val ranges = timeKept.map { case (_, st) =>
        st.map(s => (s.timeMin, s.timeMax)).getOrElse((Long.MinValue, Long.MaxValue))
      }
      val overlapped: Set[Int] = Upsert.overlapGroups(ranges)
        .filter(_.size > 1).flatten.toSet
      val kept = timeKept.zipWithIndex.filter { case ((_, st), i) =>
        overlapped.contains(i) ||
          st.forall(StatsCatalog.fieldsMayMatch(_, pred))
      }.map(_._1)
      if (kept.isEmpty)
        return pred.applyTo(graft.core.IoxSchema.mergeUnion(
          cs.map(c => spark.read.parquet(c.path).limit(0))))
      pred.applyTo(Upsert.scanWithDedup(kept.map { case (c, stats) =>
        val range = stats.map(st => (st.timeMin, st.timeMax))
          .getOrElse((Long.MinValue, Long.MaxValue))
        (spark.read.parquet(c.path), range, stats.flatMap(_.sortKey).contains(pkCols))
      }, pkCols))
    }

    /** system.chunks rows (server/src/db/system_tables.rs:192-206): one
      * row per chunk with its storage stage. All from sidecar/file
      * metadata — no data scan. `partition_key` is empty here: a
      * ChunkedTable is one partition's chunk directory (the partition
      * template layer sits above it); lifecycle_action, first-write and
      * closed times aren't tracked (no in-flight async actions). */
    def systemChunks(tableName: String): DataFrame = {
      import spark.implicits._
      chunks().map(c => (c.id, "", tableName, Lifecycle.storageOf(c.stage),
          c.bytes, c.rows, c.lastWriteMs))
        .toDF("id", "partition_key", "table_name", "storage",
          "estimated_bytes", "row_count", "time_of_last_write")
        .orderBy("id")
    }

    /** system.chunk_columns rows (system_tables.rs:373-461): per chunk,
      * per column, the storage stage plus non-null count and min/max
      * rendered as strings — served straight from the stats sidecars'
      * columnStats, the reference's TableSummary/ColumnSummary role. */
    def systemChunkColumns(tableName: String): DataFrame = {
      import spark.implicits._
      // second sidecar read per chunk — concurrent for the same reason
      // as chunks(): per-call filesystem latency × chunk count
      val rows = awaitAll("chunk column stats", metaTimeout)(
        chunks().map(c => () => {
          val storage = Lifecycle.storageOf(c.stage)
          StatsCatalog.load(fs, c.path).toSeq.flatMap(_.columnStats.toSeq.map {
            case (colName, st) => (c.id, "", tableName, colName, storage,
              st.count, st.min.orNull, st.max.orNull)
          })
        })).flatten
      rows.toDF("chunk_id", "partition_key", "table_name", "column_name",
          "storage", "row_count", "min_value", "max_value")
        .orderBy("chunk_id", "column_name")
    }

    /** Completed lifecycle jobs, newest last — what system.operations
      * serves (the reference's JobRegistry tracked task list). */
    private val jobLog = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Seq[Long])] // id, status, descr, wallNs, chunks

    /** Run one policy round, returning the actions applied. Each executed
      * action lands in the job log with its wall time and the reference
      * Job description strings (data_types/src/job.rs:89-98). */
    def runOnce(rules: Rules, nowMs: Long,
        splitNsOf: Long => Long = _ * 1000000L): Seq[Action] = {
      val listed = chunks()
      val actions = plan(listed, rules, nowMs, splitNsOf)
      val byId = listed.map(c => c.id -> c).toMap
      def describe(a: Action): (String, Seq[Long]) = a match {
        case Compact(ids) => ("Compacting chunks to ReadBuffer", ids)
        case Persist(ids, _) => ("Persisting chunks to object storage", ids)
        case Drop(ids) => ("Dropping chunks", ids)
        case RejectWrites => ("Rejecting writes over hard buffer limit", Nil)
      }
      def timedStatus(body: => Unit): (String, Long) = {
        val t0 = System.nanoTime()
        val status = try { body; "Complete" }
          catch { case scala.util.control.NonFatal(e) => s"Error: ${e.getMessage}" }
        (status, System.nanoTime() - t0)
      }
      // Compact AND Persist actions in one round touch DISJOINT chunk
      // sets (the planner groups one eligible list), so they run
      // CONCURRENTLY — the fan-in bound makes each action's merge cheap,
      // and a 32-core local[32] (or any real cluster) would otherwise
      // idle while 16 bounded merges run back to back (r14 ×1000
      // measurement: 493 s sequential persist-first policy; the Spark
      // scheduler interleaves the jobs fine — this is the reference's
      // per-partition lifecycle actions running independently,
      // lifecycle/src/policy.rs check_for_work). Output ids are
      // pre-assigned from one listing so concurrent actions can never
      // collide, and LATER input groups get LATER output ids, preserving
      // last-write-wins across groups; drop/reject stay sequential, and
      // the job log appends in the plan's action order regardless of
      // completion order.
      val compactActs = actions.collect { case c: Compact => c }
      val persistActs = actions.collect { case p: Persist => p }
      val idBase = nextId()
      val compactOut = compactActs.zipWithIndex.map { case (c, i) =>
        c -> (idBase + i)
      }.toMap
      // each persist writes TWO chunks (cold output + hot remainder):
      // two ids per action, allocated after the compact ids
      val persistOut = persistActs.zipWithIndex.map { case (p, i) =>
        p -> (idBase + compactActs.size + 2L * i)
      }.toMap
      def runAll[A <: Action](acts: Seq[A])(exec: A => Unit): Map[Action, (String, Long)] =
        if (acts.size <= 1)
          acts.map(a => (a: Action) -> timedStatus(exec(a))).toMap
        else awaitAll("lifecycle actions", jobTimeout)(
          acts.map(a => () => (a: Action) -> timedStatus(exec(a)))).toMap
      val compactResults = runAll(compactActs)(c =>
        compact(c.chunkIds.flatMap(byId.get), compactOut(c), nowMs))
      val persistResults = runAll(persistActs)(p =>
        persistSplit(p.chunkIds.flatMap(byId.get), p.splitNs, persistOut(p), nowMs))
      actions.foreach { a =>
        val (descr, ids) = describe(a)
        val (status, wallNs) = a match {
          case c: Compact => compactResults(c)
          case p: Persist => persistResults(p)
          case Drop(dids) => timedStatus(
            dids.flatMap(byId.get).foreach(c => fs.delete(new Path(c.path), true)))
          case RejectWrites => timedStatus(())
        }
        jobLog += ((jobLog.size.toLong, status, descr, wallNs, ids))
      }
      actions
    }

    /** system.operations rows (system_tables.rs:483-560): one row per
      * tracked lifecycle job. cpu_time is not split from wall time (one
      * in-process executor, no per-task cpu accounting); partition_key is
      * empty as in [[systemChunks]]; multi-chunk jobs list every chunk id
      * (the reference emits its first chunk_id column per job). */
    def systemOperations(tableName: String): DataFrame = {
      import spark.implicits._
      jobLog.toSeq.map { case (id, status, descr, wallNs, ids) =>
        (id.toString, status, wallNs, "", tableName,
          ids.headOption.getOrElse(-1L), ids.mkString(","), descr)
      }.toDF("id", "status", "wall_time_used", "partition_key", "table_name",
          "chunk_id", "chunk_ids", "description")
        .orderBy("id")
    }

    /** Merge `members` into `hot/compacted-$outId`. The output id is
      * PRE-ASSIGNED by the caller (one listing, ids base+i per action)
      * so concurrent compact actions of one policy round can never
      * collide on a directory name. */
    private def compact(members: Seq[ChunkMeta], outId: Long, nowMs: Long): Unit = {
      val merged = dedupSorted(members)
      val out = new Path(root, s"hot/compacted-$outId")
      writeWithStats(merged, out, sorted = true)
      // compaction PRESERVES write recency: the merged chunk is as recent
      // as its newest member, else a just-compacted chunk of fresh data
      // would instantly look persist-aged
      stamp(out, members.map(_.lastWriteMs).max)
      members.foreach(c => fs.delete(new Path(c.path), true))
    }

    /** Merge `members`, split at `splitNs`: rows at/under it go cold as
      * `cold/chunk-$outIdBase`, the remainder reopens hot as
      * `hot/open-${outIdBase+1}`. Ids are PRE-ASSIGNED by runOnce (like
      * [[compact]]) so the disjoint persist actions of one policy round
      * can run concurrently without colliding. */
    private def persistSplit(members: Seq[ChunkMeta], splitNs: Long,
        outIdBase: Long, nowMs: Long): Unit = {
      val merged = dedupSorted(members)
      val (cold, hotRest) = Ingest.streamSplit(merged,
        col(NsTime.TimeColumn) <= splitNs)
      val coldId = outIdBase
      val coldPath = new Path(root, s"cold/chunk-$coldId")
      writeWithStats(cold.repartitionByRange(pkCols.map(col): _*)
        .sortWithinPartitions(pkCols.map(col): _*), coldPath, sorted = true)
      stamp(coldPath, nowMs)
      // the remainder is a filter of the dedup-sorted merge: still sorted.
      // Write unconditionally — the observed row count replaces the old
      // cache + limit(1).count() emptiness probe (one job instead of two,
      // and no cached copy of the remainder); an empty write is removed.
      val hotId = outIdBase + 1
      val hotPath = new Path(root, s"hot/open-$hotId")
      val restStats = writeWithStats(hotRest, hotPath, sorted = true,
        durable = false)
      if (restStats.rowCount == 0L) fs.delete(hotPath, true)
      else stamp(hotPath, members.map(_.lastWriteMs).max)
      members.foreach(c => fs.delete(new Path(c.path), true))
    }

    /** Union members in chunk-id order with dedup (last chunk wins) and
      * a PK sort — the ReorgPlanner compact plan (reorg.rs:64-100). */
    private def dedupSorted(members: Seq[ChunkMeta]): DataFrame = {
      val tagged = members.sortBy(_.id).zipWithIndex.map { case (c, i) =>
        spark.read.parquet(c.path).withColumn("__seq", lit(i.toLong))
      }
      Upsert.dedup(graft.core.IoxSchema.mergeUnion(tagged), pkCols, "__seq")
        .repartitionByRange(pkCols.map(col): _*)
        .sortWithinPartitions(pkCols.map(col): _*)
    }

    /** Write a chunk with its stats sidecar computed in the SAME job
      * (scalar stats ride the write via Dataset.observe; only the tag
      * distinct-set pass re-reads, pruned to tag columns) — compaction
      * used to re-read every chunk it had just written, a 2× read
      * amplification on the dominant background cost at scale. `sorted`
      * records the SortKey (sort.rs:89-146) for chunks written
      * dedup-sorted on the PK; open chunks carry none. `durable = false`
      * (hot-stage chunks: fresh opens AND the sorted persist remainder)
      * additionally skips the tag distinct-set pass — hot chunks are
      * transient, compaction replaces them before any metadata fast path
      * would read their sidecars — so a hot write is exactly ONE pass
      * over the data. */
    private def writeWithStats(df: DataFrame, path: Path,
        sorted: Boolean, durable: Boolean = true): StatsCatalog.TableStats = {
      val stats = StatsCatalog.computeDuringWrite(df,
        tagCols = pkCols.filterNot(_ == NsTime.TimeColumn),
        sortKey = if (sorted) Some(pkCols) else None,
        tagSets = durable)(
        observed => observed.write.mode("error").parquet(path.toString),
        spark.read.parquet(path.toString))
      StatsCatalog.save(spark, path.toString, stats)
      stats
    }

    /** The sidecar's mtime is the chunk's last-write clock (the reference
      * tracks time_of_last_write in its in-memory catalog). */
    private def stamp(path: Path, ms: Long): Unit =
      fs.setTimes(new Path(path, StatsCatalog.StatsFile), ms, -1)

    private def meta(path: Path, stage: Stage, id: Long): ChunkMeta = {
      val stats = StatsCatalog.load(fs, path.toString)
      val sidecar = new Path(path, StatsCatalog.StatsFile)
      val mtime = if (fs.exists(sidecar)) fs.getFileStatus(sidecar).getModificationTime
        else fs.getFileStatus(path).getModificationTime
      ChunkMeta(id, path.toString, stage,
        rows = stats.map(_.rowCount).getOrElse(0L),
        bytes = fs.getContentSummary(path).getLength,
        lastWriteMs = mtime,
        timeMaxNs = stats.map(_.timeMax).getOrElse(Long.MaxValue))
    }

    private def nextId(): Long = {
      val existing = Seq("hot", "cold").flatMap { sub =>
        val dir = new Path(root, sub)
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).toSeq.map(_.getPath.getName)
          .collect { case n if n.contains("-") => n.substring(n.lastIndexOf('-') + 1).toLong }
      }
      if (existing.isEmpty) 0L else existing.max + 1L
    }
  }
}
