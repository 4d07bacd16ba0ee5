package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scan-time upsert deduplication.
  *
  * Semantics from the reference's DeduplicateExec
  * (query/src/provider/deduplicate.rs:72-105): rows with equal primary key
  * (tags, time) collapse to one row taking, per field column independently,
  * the **last non-null** value in arrival order.
  *
  * Spark shuffles do not preserve arrival order, so arrival must be an
  * explicit column (`seqCol`, e.g. chunk sequence number + row position).
  * The reference gets the same effect implicitly from its
  * SortPreservingMergeExec over ordered chunk streams (provider.rs:510).
  *
  * Implementation: a single hash aggregation —
  * `max(struct(seq-if-value-not-null, value))` per field. Struct ordering
  * compares fields left-to-right with nulls smallest, so the row with the
  * greatest sequence number among rows where the field is non-null wins;
  * if every value is null the result is null. One shuffle on the PK, fully
  * codegen'd, spill-safe — the shape that scales to arbitrary key counts
  * (vs. a window function, which would sort within partitions needlessly).
  */
object Upsert {

  def lastNonNull(field: Column, seq: Column): Column =
    max(struct(when(field.isNotNull, seq).as("s"), field.as("v"))).getField("v")

  /** Deduplicate `df` on `pkCols`, arrival order given by `seqCol`.
    * Every non-PK, non-seq column is treated as a field. */
  def dedup(df: DataFrame, pkCols: Seq[String], seqCol: String): DataFrame = {
    val fields = df.columns.filterNot(c => pkCols.contains(c) || c == seqCol)
    if (fields.isEmpty) df.select(pkCols.map(col): _*).distinct()
    else df.groupBy(pkCols.map(col): _*)
      .agg(lastNonNull(col(fields.head), col(seqCol)).as(fields.head),
        fields.toIndexedSeq.tail.map(f => lastNonNull(col(f), col(seqCol)).as(f)): _*)
  }

  /** Overlap-aware dedup scan (reference Deduplicator::build_scan_plan,
    * query/src/provider.rs:336-427): chunks whose PK-statistics ranges
    * don't overlap any other chunk scan straight through with ZERO dedup
    * cost (no shuffle!), only overlapping groups pay the groupBy — at
    * scale, compacted data is mostly non-overlapping, so the common case
    * is a clean union of parquet scans. `chunks` are (frame, pk-range,
    * selfClean) triples; selfClean=false means the chunk may contain
    * internal duplicates and needs dedup even when it overlaps nothing
    * (the reference's may_contain_pk_duplicates, query/src/lib.rs:83).
    * Arrival order across chunks follows the given chunk order; WITHIN a
    * chunk it matters only when the chunk self-duplicates — such chunks
    * must carry an `__arrival` row-order column (the reference gets the
    * same ordering from its order-preserving chunk streams,
    * provider.rs:510), which composes below the chunk index. */
  val ArrivalCol = "__arrival"

  def scanWithDedup(chunks: Seq[(DataFrame, (Long, Long), Boolean)],
      pkCols: Seq[String], seqCol: String = "__seq"): DataFrame = {
    require(chunks.nonEmpty, "no chunks")
    val groups = overlapGroups(chunks.map(_._2))
    val parts = groups.map { g =>
      val members = g.sorted.map(chunks)
      if (members.size == 1 && members.head._3)
        members.head._1.drop(ArrivalCol)
      else {
        // Arrival = struct(chunkIdx, withinChunkArrival): struct ordering is
        // lexicographic, so chunk order always dominates and NO bound on the
        // within-chunk arrival value is assumed (monotonically_increasing_id
        // emits partitionIdx << 33 | rowNumber, far beyond 32 bits — a packed
        // `(i << 32) + arrival` long would overflow across chunk slots).
        val tagged = members.zipWithIndex.map { case ((df, _, _), i) =>
          val arrival =
            if (df.columns.contains(ArrivalCol)) col(ArrivalCol).cast("long")
            else lit(0L)
          df.withColumn(seqCol,
              struct(lit(i).as("chunk"), arrival.as("arrival")))
            .drop(ArrivalCol)
        }
        dedup(graft.core.IoxSchema.mergeUnion(tagged), pkCols, seqCol)
      }
    }
    graft.core.IoxSchema.mergeUnion(parts)
  }

  /** Overlap-aware scan over compacted chunk DIRECTORIES: each chunk's
    * time range comes from its stats sidecar (no data read for planning),
    * compacted chunks are self-clean by construction (dedup+sort on
    * write), and a chunk with no sidecar pessimistically overlaps
    * everything. This is the reference's provider flow end-to-end:
    * chunk metadata -> overlap groups -> clean scans ∪ dedup scans.
    *
    * `pred.partitionKey` prunes chunk dirs BEFORE any sidecar load or
    * footer read (the reference's partition-level pruning,
    * predicate.rs:63 + catalog partition filtering) — a dir with a
    * Hive-style `col=value` segment is pruned when no segment value
    * equals the requested key; dirs without one can't be judged and stay.
    * The row-level parts of `pred` then filter the scan (and push down). */
  def scanChunks(spark: org.apache.spark.sql.SparkSession,
      chunkPaths: Seq[String], pkCols: Seq[String],
      pred: graft.core.RpcPredicate = graft.core.RpcPredicate())
      : org.apache.spark.sql.DataFrame = {
    val keptByKey = chunkPaths.filter(p => pred.partitionKey.forall(pk =>
      chunkPartitionKeys(p) match {
        case Nil => true // unprunable: no template key in the path
        case keys => keys.contains(pk)
      }))
    // statistics pruning (query_tests/src/pruning.rs; the reference's
    // PruningPredicate over chunk min/max): a chunk whose sidecar proves
    // the predicate unsatisfiable is dropped before ANY footer or data
    // read. Time-range pruning is dedup-safe everywhere (the dedup key
    // includes time, so a time-disjoint chunk can't hold another chunk's
    // PK); FIELD min/max pruning applies only to chunks overlapping no
    // other chunk — pruning an overlapped chunk could drop the LATEST
    // value of a shared PK and resurrect a stale one through dedup.
    val loaded = keptByKey.map(p => p -> graft.sources.StatsCatalog.load(spark, p))
    val timeKept = loaded.filter { case (_, st) =>
      st.forall(graft.sources.StatsCatalog.timeMayMatch(_, pred))
    }
    val ranges = timeKept.map { case (_, st) =>
      st.map(s => (s.timeMin, s.timeMax)).getOrElse((Long.MinValue, Long.MaxValue))
    }
    val overlapped: Set[Int] = overlapGroups(ranges)
      .filter(_.size > 1).flatten.toSet
    val kept = timeKept.zipWithIndex.filter { case ((_, st), i) =>
      overlapped.contains(i) ||
        st.forall(graft.sources.StatsCatalog.fieldsMayMatch(_, pred))
    }.map(_._1)
    if (kept.isEmpty) {
      // all chunks pruned: empty frame with the UNION schema (footer-only
      // reads, no data scan — and the schema must not depend on which
      // chunks were pruned)
      val empty = graft.core.IoxSchema.mergeUnion(
        chunkPaths.map(p => spark.read.parquet(p).limit(0)))
      return pred.applyTo(empty)
    }
    val chunks = kept.map { case (p, stats) =>
      val range = stats.map(st => (st.timeMin, st.timeMax))
        .getOrElse((Long.MinValue, Long.MaxValue)) // unknown: overlaps all
      // SortKey metadata (sort.rs:89-146): a recorded sort order that
      // differs from this scan's dedup key means the chunk may
      // self-duplicate under THIS key; absent metadata keeps the
      // compacted-chunk convention (self-clean by construction)
      val selfClean = stats.flatMap(_.sortKey).forall(_ == pkCols)
      (spark.read.parquet(p), range, selfClean)
    }
    pred.applyTo(scanWithDedup(chunks, pkCols))
  }

  /** Hive-style `col=value` segment values of a chunk path — the
    * template-computed partition key(s) the dir layout encodes. */
  def chunkPartitionKeys(path: String): Seq[String] =
    path.split('/').toSeq.collect {
      case seg if seg.contains('=') && !seg.startsWith("=") =>
        seg.substring(seg.indexOf('=') + 1)
    }

  /** Interval-overlap grouping over per-chunk [min, max] primary-key
    * statistics: only chunks whose PK ranges overlap can hold duplicates of
    * each other, so everything else scans clean with no dedup cost
    * (reference overlap analysis, query/src/provider/overlap.rs:49-239).
    *
    * Chunks here are anything with an interval statistic (files, ranges of
    * a sort key, time ranges). Returns groups of indices; singleton groups
    * need no cross-chunk dedup. O(n log n) in chunk count — runs on the
    * driver over file-footer stats, never touching data.
    */
  def overlapGroups(ranges: Seq[(Long, Long)]): Seq[Seq[Int]] = {
    val sorted = ranges.zipWithIndex.sortBy(_._1._1)
    val groups = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Int]]
    var curEnd = Long.MinValue
    sorted.foreach { case ((lo, hi), idx) =>
      if (groups.nonEmpty && lo <= curEnd) {
        groups.last += idx
        curEnd = math.max(curEnd, hi)
      } else {
        groups += scala.collection.mutable.ArrayBuffer(idx)
        curEnd = hi
      }
    }
    groups.map(_.toSeq).toSeq
  }
}
