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
      maxCompactFanIn: Int = 64)

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
          oldestAgeMs >= rules.persistAgeThresholdMs || overSoft)
        // fan-in bounded: oldest chunks first, the rest persist on the
        // following rounds (see Rules.maxCompactFanIn)
        return drops :+ Persist(
          closed.sortBy(_.id).take(rules.maxCompactFanIn).map(_.id),
          splitNsOf(nowMs - rules.lateArriveWindowMs))
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

  /** A table as a directory of lifecycle-managed chunks. `pkCols` is the
    * dedup/sort key (tags + time). All metadata comes from sidecars +
    * file status; chunk data is only read by compact/persist jobs. */
  final class ChunkedTable(spark: SparkSession, tablePath: String,
      pkCols: Seq[String]) {
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

    def chunks(): Seq[ChunkMeta] = {
      // per-chunk metadata (sidecar JSON + file status) is fetched
      // CONCURRENTLY: it is ~1 ms of filesystem latency per chunk, and a
      // sequential loop made listing 10⁴ chunks an 11 s driver stall
      // (r14 measurement) — on an object store the per-call latency is
      // 10-50× that. Order is restored by the final sort.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      def ls(sub: String, stage: Stage, prefix: String): Seq[Future[ChunkMeta]] = {
        val dir = new Path(root, sub)
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
          .map(st => Future(meta(st.getPath, stage,
            st.getPath.getName.stripPrefix(prefix).toLong)))
      }
      Await.result(
        Future.sequence(ls("hot", Open, "open-") ++
          ls("hot", Compacted, "compacted-") ++
          ls("cold", Persisted, "chunk-")),
        Duration.Inf).sortBy(_.id)
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
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      // second sidecar read per chunk — concurrent for the same reason
      // as chunks(): per-call filesystem latency × chunk count
      val rows = Await.result(Future.sequence(chunks().map(c => Future {
        val storage = Lifecycle.storageOf(c.stage)
        StatsCatalog.load(fs, c.path).toSeq.flatMap(_.columnStats.toSeq.map {
          case (colName, st) => (c.id, "", tableName, colName, storage,
            st.count, st.min.orNull, st.max.orNull)
        })
      })), Duration.Inf).flatten
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
      // Compact actions in one round touch DISJOINT chunk sets (the
      // planner groups one eligible list), so they run CONCURRENTLY —
      // the fan-in bound makes each action's merge cheap, and a 32-core
      // local[32] (or any real cluster) would otherwise idle while 16
      // bounded merges run back to back (r14 ×1000 measurement: 493 s
      // sequential policy; the Spark scheduler interleaves the jobs
      // fine). Output ids are pre-assigned from one listing so
      // concurrent compacts can never collide; everything else
      // (persist/drop/reject) stays sequential, and the job log appends
      // in the plan's action order regardless of completion order.
      val compactActs = actions.collect { case c: Compact => c }
      val idBase = nextId()
      val compactOut = compactActs.zipWithIndex.map { case (c, i) =>
        c -> (idBase + i)
      }.toMap
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val compactResults: Map[Action, (String, Long)] =
        if (compactActs.size <= 1)
          compactActs.map(c => (c: Action) ->
            timedStatus(compact(c.chunkIds.flatMap(byId.get), compactOut(c), nowMs))).toMap
        else Await.result(Future.sequence(compactActs.map(c => Future {
          (c: Action) ->
            timedStatus(compact(c.chunkIds.flatMap(byId.get), compactOut(c), nowMs))
        })), Duration.Inf).toMap
      actions.foreach { a =>
        val (descr, ids) = describe(a)
        val (status, wallNs) = a match {
          case c: Compact => compactResults(c)
          case Persist(pids, splitNs) => timedStatus(persistSplit(pids, splitNs, nowMs))
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

    private def persistSplit(ids: Seq[Long], splitNs: Long, nowMs: Long): Unit = {
      val byId = chunks().map(c => c.id -> c).toMap
      val members = ids.map(byId)
      val merged = dedupSorted(members)
      val (cold, hotRest) = Ingest.streamSplit(merged,
        col(NsTime.TimeColumn) <= splitNs)
      val coldId = nextId()
      val coldPath = new Path(root, s"cold/chunk-$coldId")
      writeWithStats(cold.repartitionByRange(pkCols.map(col): _*)
        .sortWithinPartitions(pkCols.map(col): _*), coldPath, sorted = true)
      stamp(coldPath, nowMs)
      // the remainder is a filter of the dedup-sorted merge: still sorted.
      // Write unconditionally — the observed row count replaces the old
      // cache + limit(1).count() emptiness probe (one job instead of two,
      // and no cached copy of the remainder); an empty write is removed.
      val hotId = nextId()
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
