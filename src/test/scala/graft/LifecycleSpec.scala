package graft

import org.apache.spark.sql.functions._
import graft.streaming.Lifecycle
import graft.streaming.Lifecycle._

/** Policy planner + chunk-directory executor against the reference's
  * lifecycle semantics (lifecycle/src/policy.rs, database_rules.rs:124-186):
  * rollover on late-arrive idle, persist on row/age thresholds (stalling
  * compaction), buffer limits, and the full rollover -> compact -> persist
  * timeline over a real chunk directory. */
class LifecycleSpec extends SparkSpec {

  private val MB = 1024L * 1024L
  private def chunk(id: Long, stage: Stage, rows: Long, lastWriteMs: Long,
      bytes: Long = MB) =
    ChunkMeta(id, s"/c/$id", stage, rows, bytes, lastWriteMs)

  private val rules = Rules(
    lateArriveWindowMs = 10000L,
    persistRowThreshold = 1000L,
    persistAgeThresholdMs = 60000L)

  test("plan: young open chunk - nothing to do") {
    assert(plan(Seq(chunk(0, Open, 10, lastWriteMs = 95000L)), rules, 100000L).isEmpty)
  }

  test("plan: idle open chunk rolls over into a compaction (can_move)") {
    val actions = plan(Seq(chunk(0, Open, 10, 80000L)), rules, 100000L)
    assert(actions == Seq(Compact(Seq(0L))))
  }

  test("plan: compaction and persistence fan-in are bounded (r14)") {
    // an unbounded 1000-chunk merge measured 20+ minutes (every member =
    // a footer read + a union-plan relation); actions must bound their
    // width and reduce chunk count geometrically across rounds
    val many = (0L until 200L).map(i => chunk(i, Open, 10, 80000L))
    val compacts = plan(many, rules.copy(persist = false, maxCompactFanIn = 64),
      100000L).collect { case Compact(ids) => ids }
    assert(compacts.forall(_.size <= 64), s"over-wide: ${compacts.map(_.size)}")
    assert(compacts.flatten.sorted == (0L until 200L),
      "bounded groups must cover every chunk exactly once")
    val persists = plan(many, rules.copy(maxCompactFanIn = 64), 100000L)
      .collect { case Persist(ids, _) => ids }
    // r15: every closed chunk persists THIS round, in disjoint id-ordered
    // groups of <= fan-in (the reference runs per-partition persist
    // actions independently; runOnce executes these concurrently)
    assert(persists.forall(_.size <= 64), s"over-wide: ${persists.map(_.size)}")
    assert(persists.flatten == (0L until 200L),
      s"persist groups must cover every closed chunk in id order: $persists")
    assert(persists.map(_.max) == persists.map(_.max).sorted,
      "later input chunks must land in later persist actions")
  }

  test("Rules: a fan-in under 1 fails loudly instead of livelocking") {
    intercept[IllegalArgumentException] { Rules(maxCompactFanIn = 0) }
    intercept[IllegalArgumentException] { Rules(maxCompactFanIn = -3) }
  }

  test("plan: two small compacted chunks merge; a huge one is skipped (row budget)") {
    val actions = plan(Seq(
      chunk(0, Compacted, 100, 80000L),
      chunk(1, Compacted, 5000, 80000L), // >= persistRowThreshold: skipped
      chunk(2, Compacted, 200, 80000L)), rules.copy(persist = false), 100000L)
    assert(actions == Seq(Compact(Seq(0L, 2L))))
  }

  test("plan: persist triggers on row threshold and stalls compaction") {
    val actions = plan(Seq(
      chunk(0, Open, 900, 80000L),
      chunk(1, Compacted, 400, 80000L)), rules, 100000L)
    // both closed, 1300 rows >= 1000 -> persist both, NO compact this round
    assert(actions == Seq(Persist(Seq(0L, 1L), splitNs = 90000L * 1000000L)))
  }

  test("plan: persist triggers on age threshold alone") {
    val actions = plan(Seq(chunk(0, Open, 5, 30000L)), rules, 100000L)
    // age 70s >= 60s threshold, rows far under threshold
    assert(actions == Seq(Persist(Seq(0L), splitNs = 90000L * 1000000L)))
  }

  test("plan: a chunk still inside the late-arrive window never persists") {
    // oldest hot age is over the persist age threshold, but the only chunk
    // was written 5s ago (< 10s window): nothing is persistABLE yet
    assert(plan(Seq(chunk(0, Open, 5000, 95000L)), rules, 100000L).isEmpty)
  }

  test("plan: buffer limits - soft persists early, hard rejects writes") {
    val big = Seq(chunk(0, Open, 10, 80000L, bytes = 600 * MB))
    val soft = plan(big, rules.copy(bufferSizeSoft = Some(500 * MB)), 100000L)
    assert(soft == Seq(Persist(Seq(0L), splitNs = 90000L * 1000000L)))
    val hard = plan(big, rules.copy(bufferSizeHard = Some(512 * MB)), 100000L)
    assert(hard == Seq(RejectWrites))
  }

  test("plan: persist=false never persists, still compacts") {
    val actions = plan(Seq(chunk(0, Open, 99999, 10000L)),
      rules.copy(persist = false), 100000L)
    assert(actions == Seq(Compact(Seq(0L))))
  }

  test("plan: retention expires whole chunks on the data time axis, any stage") {
    // data-now = nowMs * 1e6 (default splitNsOf); retention 50s of data time
    val withTimes = Seq(
      chunk(0, Persisted, 100, 1000L).copy(timeMaxNs = 10000L * 1000000L),
      chunk(1, Compacted, 100, 95000L).copy(timeMaxNs = 40000L * 1000000L),
      chunk(2, Open, 100, 95000L).copy(timeMaxNs = 90000L * 1000000L))
    val actions = plan(withTimes, rules.copy(retentionNs = Some(50000L * 1000000L)),
      nowMs = 100000L)
    // cutoff = 100s - 50s = 50s data time: chunks 0 and 1 aged out entirely
    assert(actions == Seq(Drop(Seq(0L, 1L))))
    // a chunk with unknown time bounds (no sidecar) never expires
    val unknown = chunk(3, Persisted, 1, 1000L) // timeMaxNs = MaxValue
    assert(plan(Seq(unknown), rules.copy(retentionNs = Some(1L)), 100000L).isEmpty)
  }

  test("plan: memory-pressure drop is flag-gated and oldest-first (policy.rs:55)") {
    val over = Seq(
      chunk(0, Compacted, 10, 20000L, bytes = 300 * MB),
      chunk(1, Compacted, 10, 40000L, bytes = 300 * MB),
      chunk(2, Open, 10, 99000L, bytes = 300 * MB)) // still open: not droppable
    val noPersist = rules.copy(persist = false, bufferSizeSoft = Some(500 * MB))
    // without the flag: no Drop — pressure without persistence only compacts
    assert(!plan(over, noPersist, 100000L).exists(_.isInstanceOf[Drop]))
    // with the flag: drop the OLDEST closed chunks until projected under
    // the soft limit (900MB -> dropping chunk 0 projects 600MB, still
    // over -> also chunk 1 -> 300MB under)
    val actions = plan(over, noPersist.copy(dropNonPersisted = true), 100000L)
    assert(actions == Seq(Drop(Seq(0L, 1L))))
    // with persistence available, early persist still wins over dropping
    val persisting = plan(over,
      noPersist.copy(persist = true, dropNonPersisted = true), 100000L)
    assert(persisting.exists(_.isInstanceOf[Persist]) &&
      !persisting.exists(_.isInstanceOf[Drop]))
  }

  test("chunked table: retention expires a cold chunk and the scan reflects it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-retention").toString
    val table = new ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    // old data (times ~1-2s ns) and fresh data (~95s ns) in separate chunks
    table.writeChunk(Seq(("a", 1000L * 1000000L, 1.0), ("b", 2000L * 1000000L, 2.0))
      .toDF("host", "time", "v"), nowMs = 0L)
    table.runOnce(rules, nowMs = 70000L) // -> persisted cold chunk
    table.writeChunk(Seq(("c", 95000L * 1000000L, 3.0)).toDF("host", "time", "v"),
      nowMs = 95000L)
    assert(table.chunks().map(_.stage).sortBy(_.toString) == Seq(Open, Persisted))
    assert(table.scan().count() == 3L)

    // retention 50s of data time at t=100s: the cold chunk (max 2s) expires,
    // the open chunk (95s) survives
    val actions = table.runOnce(rules.copy(retentionNs = Some(50000L * 1000000L)),
      nowMs = 100000L)
    assert(actions.exists { case Drop(ids) => ids.nonEmpty; case _ => false })
    val remaining = table.chunks()
    assert(remaining.map(_.stage) == Seq(Open))
    assert(table.scan().as[(String, Long, Double)].collect().toSeq ==
      Seq(("c", 95000L * 1000000L, 3.0)))
  }

  test("chunked table timeline: rollover -> compact -> persist with split") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle").toString
    val table = new ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    def mkChunk(hosts: Seq[String], times: Seq[Long]) =
      hosts.flatMap(h => times.map(t => (h, t, s"$h-$t")))
        .toDF("host", "time", "v")

    // t=0s and t=5s: two write batches (data times in ns on the same clock)
    table.writeChunk(mkChunk(Seq("a", "b"), Seq(1000L, 2000L).map(_ * 1000000L)), nowMs = 0L)
    table.writeChunk(mkChunk(Seq("a", "c"), Seq(3000L, 4000L).map(_ * 1000000L)), nowMs = 5000L)
    assert(table.chunks().map(_.stage) == Seq(Open, Open))

    // t=7s: inside the late-arrive window - no work
    assert(table.runOnce(rules, nowMs = 7000L).isEmpty)

    // t=16s: both chunks idle >= 10s window -> rollover + compact
    val r1 = table.runOnce(rules, nowMs = 16000L)
    assert(r1 == Seq(Compact(Seq(0L, 1L))))
    val afterCompact = table.chunks()
    assert(afterCompact.map(_.stage) == Seq(Compacted))
    assert(afterCompact.head.rows == 8L)
    assert(afterCompact.head.lastWriteMs == 5000L) // newest member's clock

    // t=70s: age 70s - 5s = 65s >= 60s threshold -> persist, split at
    // (70s - 10s) = 60s wall -> 60e9 ns; every data time is below it, so
    // everything goes cold and no hot remainder reopens
    val r2 = table.runOnce(rules, nowMs = 70000L)
    assert(r2 == Seq(Persist(Seq(2L), splitNs = 60000L * 1000000L)))
    val afterPersist = table.chunks()
    assert(afterPersist.map(_.stage) == Seq(Persisted))
    assert(afterPersist.head.rows == 8L)

    // full scan still returns every row exactly once
    assert(table.scan().count() == 8L)

    // t=75s: fresh write, then a persist with a mid-data split point:
    // rows at/below the split go cold, the rest reopens as a hot chunk
    table.writeChunk(mkChunk(Seq("d"), Seq(100000L, 99999999999L).map(_ * 1000000L)),
      nowMs = 75000L)
    val r3 = table.runOnce(rules, nowMs = 140000L,
      splitNsOf = _ => 500000L * 1000000L) // custom data-axis split
    assert(r3.head.isInstanceOf[Persist])
    val stages = table.chunks().map(_.stage)
    assert(stages.count(_ == Persisted) == 2 && stages.count(_ == Open) == 1)
    assert(table.scan().count() == 10L)
    // the reopened hot chunk holds exactly the row past the split point
    val hotRows = table.chunks().filter(_.stage == Open)
    assert(hotRows.head.rows == 1L)
  }

  test("SortKey metadata: compact records it; scan trusts it over naming") {
    import spark.implicits._
    import graft.sources.StatsCatalog
    val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle3").toString
    val table = new ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    table.writeChunk(Seq(("a", 1000L, 1.0)).toDF("host", "time", "v"), 0L)
    // open chunk: no SortKey recorded
    assert(StatsCatalog.load(spark, table.chunks().head.path)
      .flatMap(_.sortKey).isEmpty)
    table.runOnce(rules, nowMs = 20000L) // compact
    val compacted = table.chunks().head
    // compacted chunk: SortKey == the table PK (sort.rs:89-146)
    assert(StatsCatalog.load(spark, compacted.path)
      .flatMap(_.sortKey).contains(Seq("host", "time")))
    assert(table.scan().count() == 1L)

    // scanChunks: a chunk whose RECORDED sort key differs from the scan's
    // dedup key is not self-clean; one that matches is
    val mismatchDir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    Seq(("a", 1000L, 1.0), ("a", 1000L, 2.0)).toDF("host", "time", "v")
      .write.parquet(s"$mismatchDir/c0")
    StatsCatalog.save(spark, s"$mismatchDir/c0",
      StatsCatalog.compute(spark.read.parquet(s"$mismatchDir/c0"),
        tagCols = Seq("host"), sortKey = Some(Seq("other_col"))))
    val scanned = graft.operators.Upsert.scanChunks(
      spark, Seq(s"$mismatchDir/c0"), Seq("host", "time"))
    assert(scanned.count() == 1L) // mismatching SortKey forced the dedup
  }

  test("concurrent persists: disjoint bounded actions, result-identical scan (r15)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cpersist").toString
    val table = new ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    // 5 chunks; each rewrites PK ("a", 1s) — the LAST chunk must win even
    // though the chunks persist via 3 concurrent disjoint actions — plus
    // one distinct row per chunk
    (0 until 5).foreach { i =>
      table.writeChunk(Seq(
        ("a", 1000L * 1000000L, i.toDouble),
        (s"b$i", (2000L + i) * 1000000L, 100.0 + i)).toDF("host", "time", "v"),
        nowMs = i * 1000L)
    }
    val actions = table.runOnce(rules.copy(maxCompactFanIn = 2), nowMs = 70000L)
    val persists = actions.collect { case p: Persist => p }
    assert(persists.size == 3, s"expected 3 bounded persist actions: $actions")
    assert(persists.flatMap(_.chunkIds).sorted == (0L until 5L),
      "persist actions must cover every closed chunk exactly once")
    val after = table.chunks()
    assert(after.map(_.stage).distinct == Seq(Persisted))
    assert(after.size == 3, s"3 concurrent persists -> 3 cold chunks: $after")
    val rows = table.scan().orderBy("host").as[(String, Long, Double)].collect().toSeq
    assert(rows == Seq(
      ("a", 1000L * 1000000L, 4.0), // chunk 4 (latest group, latest id) wins
      ("b0", 2000L * 1000000L, 100.0), ("b1", 2001L * 1000000L, 101.0),
      ("b2", 2002L * 1000000L, 102.0), ("b3", 2003L * 1000000L, 103.0),
      ("b4", 2004L * 1000000L, 104.0)))
    // job log records every action, Complete, in plan order
    val ops = table.systemOperations("t").collect()
    assert(ops.length == 3 && ops.forall(_.getString(1) == "Complete"))
  }

  test("writeChunks: one batched job lands n open chunks identical to the serial path") {
    import spark.implicits._
    def mk(i: Int) = Seq(
      ("a", 1000L * 1000000L, i.toDouble),
      (s"c$i", (3000L + i) * 1000000L, 50.0 + i)).toDF("host", "time", "v")
    val serialDir = java.nio.file.Files.createTempDirectory("graft-batch-s").toString
    val serial = new ChunkedTable(spark, serialDir, pkCols = Seq("host", "time"))
    (0 until 4).foreach(i => serial.writeChunk(mk(i), nowMs = 500L))
    val batchDir = java.nio.file.Files.createTempDirectory("graft-batch-b").toString
    val batch = new ChunkedTable(spark, batchDir, pkCols = Seq("host", "time"))
    val metas = batch.writeChunks((0 until 4).map(mk), nowMs = 500L)
    assert(metas.map(_.id) == (0L until 4L) && metas.forall(_.stage == Open))
    assert(metas.forall(_.rows == 2L), s"per-chunk row counts: $metas")
    // same chunk inventory (ids, stages, rows) and the same scan result
    val (sc, bc) = (serial.chunks(), batch.chunks())
    assert(bc.map(c => (c.id, c.stage, c.rows)) == sc.map(c => (c.id, c.stage, c.rows)))
    def sorted(t: ChunkedTable) =
      t.scan().orderBy("host", "time").as[(String, Long, Double)].collect().toSeq
    assert(sorted(batch) == sorted(serial))
    // chunk-id ordering preserved: the upserted PK resolves to chunk 3's value
    assert(sorted(batch).head == ("a", 1000L * 1000000L, 3.0))
    // sidecars carry per-column stats (system.chunk_columns source)
    assert(batch.systemChunkColumns("t").count() == 4L * 3L)
    // and the batch chunks flow through the normal lifecycle
    batch.runOnce(rules.copy(persist = false), nowMs = 20000L)
    assert(batch.chunks().map(_.stage) == Seq(Compacted))
    assert(sorted(batch).head == ("a", 1000L * 1000000L, 3.0))
  }

  test("writeChunksBy: one distributed frame lands per-key open chunks identical to serial") {
    import spark.implicits._
    def mk(i: Int) = Seq(
      ("a", 1000L * 1000000L, i.toDouble),
      (s"c$i", (3000L + i) * 1000000L, 50.0 + i)).toDF("host", "time", "v")
    val serialDir = java.nio.file.Files.createTempDirectory("graft-by-s").toString
    val serial = new ChunkedTable(spark, serialDir, pkCols = Seq("host", "time"))
    (0 until 4).foreach(i => serial.writeChunk(mk(i), nowMs = 500L))
    val byDir = java.nio.file.Files.createTempDirectory("graft-by-b").toString
    val byTable = new ChunkedTable(spark, byDir, pkCols = Seq("host", "time"))
    // the same rows as ONE frame keyed by a chunk column — the backfill shape
    val frame = (0 until 4).flatMap(i => Seq(
      (i.toLong, "a", 1000L * 1000000L, i.toDouble),
      (i.toLong, s"c$i", (3000L + i) * 1000000L, 50.0 + i)))
      .toDF("ck", "host", "time", "v")
    val metas = byTable.writeChunksBy(frame, "ck", nowMs = 500L)
    assert(metas.map(_.id) == (0L until 4L) && metas.forall(_.stage == Open))
    assert(metas.forall(_.rows == 2L), s"per-chunk row counts: $metas")
    assert(byTable.chunks().map(c => (c.id, c.stage, c.rows)) ==
      serial.chunks().map(c => (c.id, c.stage, c.rows)))
    def sorted(t: ChunkedTable) =
      t.scan().orderBy("host", "time").as[(String, Long, Double)].collect().toSeq
    assert(sorted(byTable) == sorted(serial))
    assert(sorted(byTable).head == ("a", 1000L * 1000000L, 3.0)) // key 3 wins
    // ids continue from the table's current max on a second batch
    val more = byTable.writeChunksBy(
      Seq((0L, "z", 9000L * 1000000L, 1.0)).toDF("ck", "host", "time", "v"),
      "ck", nowMs = 600L)
    assert(more.map(_.id) == Seq(4L))
    assert(byTable.scan().count() == sorted(serial).size + 1L)
  }

  test("chunked table: upsert across chunks - later write wins on scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle2").toString
    val table = new ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    table.writeChunk(Seq(("a", 1000L, 1.0), ("b", 1000L, 2.0)).toDF("host", "time", "v"), 0L)
    table.writeChunk(Seq(("a", 1000L, 9.0)).toDF("host", "time", "v"), 5000L)
    val rows = table.scan().orderBy("host").collect().map(r =>
      (r.getString(0), r.getDouble(r.fieldIndex("v"))))
    assert(rows.toSeq == Seq(("a", 9.0), ("b", 2.0)))
    // and the property survives compaction
    table.runOnce(rules, nowMs = 20000L)
    val rows2 = table.scan().orderBy("host").collect().map(r =>
      (r.getString(0), r.getDouble(r.fieldIndex("v"))))
    assert(rows2.toSeq == Seq(("a", 9.0), ("b", 2.0)))
  }
}
