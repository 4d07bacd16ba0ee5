package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.RpcPredicate
import graft.operators.InfluxRpc
import graft.sources.LineProtocol
import graft.streaming.Lifecycle

/** Chunk pruning on sidecar statistics, ported from the reference's
  * query_tests/src/pruning.rs: two chunks of `cpu` — chunk A with
  * bar:[1,2], chunk B with bar:[3,3] — and a `bar < 3.0` predicate must
  * answer from chunk A ALONE, with chunk B never reaching the plan
  * (asserted via the result's inputFiles, the analog of the reference's
  * pruned-chunks metric). Covers both entry points the reference tests:
  * the SQL-shaped scan and the influxrpc read_filter path. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  /** The pruning.rs fixture with one deliberate change: the chunks are
    * TIME-DISJOINT (the reference's overlap in time means its pruning
    * can change which duplicate survives dedup — an interaction this
    * engine refuses: field pruning only applies to chunks overlapping
    * no other chunk; see the dedup-safety test below). */
  private def table(): Lifecycle.ChunkedTable = {
    val dir = Files.createTempDirectory("graft-prune").toString
    val t = new Lifecycle.ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    // chunk 0: bar in [1, 2] (pruning.rs:23-24)
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=a bar=1.0 10", "cpu,host=b bar=2.0 20"))("cpu"), nowMs = 0L)
    // chunk 1: bar = 3 everywhere (pruning.rs:37-40) — the pruned one
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=c bar=3.0 30", "cpu,host=c bar=3.0 100",
      "cpu,host=c bar=3.0 1000"))("cpu"), nowMs = 0L)
    t
  }

  test("chunk_pruning_sql: bar < 3.0 scans only the matching chunk") {
    val t = table()
    val pred = RpcPredicate().withExpr(col("bar") < 3.0)
    val out = t.scan(pred)
    assert(out.select("host", "bar", "time").orderBy("time")
      .as[(String, Double, Long)].collect().toSeq ==
      Seq(("a", 1.0, 10L), ("b", 2.0, 20L)))
    // the pruned chunk's files never entered the plan
    val files = out.inputFiles.toSeq
    assert(files.nonEmpty && files.forall(_.contains("open-0")), files)
  }

  test("chunk_pruning_influxrpc: the read_filter plan sees one chunk") {
    val t = table()
    val pred = RpcPredicate().withExpr(col("bar") < 3.0)
    val out = InfluxRpc.readFilter(t.scan(pred), RpcPredicate())
    assert(out.select("host").as[String].collect().sorted.toSeq == Seq("a", "b"))
    assert(out.inputFiles.forall(_.contains("open-0")))
  }

  test("time-range pruning: a disjoint [start, stop) drops chunks before any read") {
    val t = table()
    // [500, 2000) keeps only chunk 1 (times 10,100,1000 -> 1000 matches)
    val out = t.scan(RpcPredicate().withRange(500L, 2000L))
    assert(out.count() == 1L)
    assert(out.inputFiles.forall(_.contains("open-1")))
    // a range beyond every chunk yields the empty frame with zero scans
    val none = t.scan(RpcPredicate().withRange(5000L, 9000L))
    assert(none.count() == 0L)
  }

  test("pruning is conservative: unanalyzable predicates keep every chunk") {
    val t = table()
    // an expression richer than col-op-literal cannot prune
    val out = t.scan(RpcPredicate().withExpr(col("bar") + 1.0 < 4.0))
    assert(out.count() == 2L)
    assert(out.inputFiles.exists(_.contains("open-0")) &&
      out.inputFiles.exists(_.contains("open-1")))
    // equality inside the range keeps; outside prunes
    assert(t.scan(RpcPredicate().withExpr(col("bar") === 2.0))
      .inputFiles.forall(_.contains("open-0")))
    assert(t.scan(RpcPredicate().withExpr(col("bar") === 9.0)).count() == 0L)
  }

  test("field pruning never resurrects a stale PK value through dedup") {
    // chunk 0 and chunk 1 OVERLAP in time and share PK (host=a, 10);
    // the later chunk's bar=5.0 is the live value. A naive bar<3 field
    // prune would drop chunk 1 and resurrect bar=1.0 — the correct
    // upsert-deduped answer is: time=10 carries bar=5.0, which fails
    // bar<3, so only (b, 2.0, 20) survives.
    val dir = Files.createTempDirectory("graft-prune3").toString
    val t = new Lifecycle.ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=a bar=1.0 10", "cpu,host=b bar=2.0 20"))("cpu"), nowMs = 0L)
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=a bar=5.0 10"))("cpu"), nowMs = 0L)
    val out = t.scan(RpcPredicate().withExpr(col("bar") < 3.0))
    assert(out.select("host", "bar", "time")
      .as[(String, Double, Long)].collect().toSeq == Seq(("b", 2.0, 20L)))
  }

  test("interval checks are exact for long magnitudes and case-insensitive on columns") {
    import graft.sources.StatsCatalog
    import StatsCatalog.{ColumnStat, TableStats}
    val big = 9007199254740993L // 2^53 + 1: a Double detour would round
    val st = TableStats(rowCount = 1, timeMin = 0, timeMax = 0,
      tagValues = Map.empty, cappedTags = Nil,
      columnStats = Map("seq" -> ColumnStat(1,
        Some(big.toString), Some(big.toString))))
    // max = 2^53+1 satisfies > 2^53; double rounding would prune it
    assert(StatsCatalog.fieldsMayMatch(st,
      RpcPredicate().withExpr(col("seq") > 9007199254740992L)))
    assert(!StatsCatalog.fieldsMayMatch(st,
      RpcPredicate().withExpr(col("seq") > big)))
    // Spark resolves columns case-insensitively; so does the prune check
    assert(StatsCatalog.fieldsMayMatch(st,
      RpcPredicate().withExpr(col("SEQ") === big)))
    // a numeric-looking STRING literal compares numerically ("10" vs 5.0
    // lexicographic would wrongly prune)
    val st2 = st.copy(columnStats = Map("bar" -> ColumnStat(1,
      Some("5.0"), Some("20.0"))))
    assert(StatsCatalog.fieldsMayMatch(st2,
      RpcPredicate().withExpr(col("bar") === "10")))
  }

  test("a comparison on a column the chunk lacks prunes it (all-null there)") {
    val dir = Files.createTempDirectory("graft-prune2").toString
    val t = new Lifecycle.ChunkedTable(spark, dir, pkCols = Seq("host", "time"))
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=a bar=1.0 10"))("cpu"), nowMs = 0L)
    t.writeChunk(LineProtocol.ingest(spark, Seq(
      "cpu,host=b baz=5.0 20"))("cpu"), nowMs = 0L)
    val out = t.scan(RpcPredicate().withExpr(col("baz") > 0.0))
    assert(out.select("host").as[String].collect().toSeq == Seq("b"))
    assert(out.inputFiles.forall(_.contains("open-1")))
  }
}
