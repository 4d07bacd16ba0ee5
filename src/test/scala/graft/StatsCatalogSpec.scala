package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.RpcPredicate
import graft.sources.{LineProtocol, StatsCatalog}
import graft.streaming.Ingest

class StatsCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val table: String = {
    val tmp = Files.createTempDirectory("graft-stats").toString
    LineProtocol.ingest(spark, Seq(
      "cpu,host=a,region=west user=22.5 100",
      "cpu,host=b,region=east user=9.9 150",
      "cpu,host=a,region=west user=24.0 200"))("cpu")
      .write.parquet(s"$tmp/raw")
    Ingest.compact(spark, s"$tmp/raw", s"$tmp/cpu", Seq("host", "region", "time"))
    s"$tmp/cpu"
  }

  test("compact writes a stats sidecar that round-trips") {
    val st = StatsCatalog.load(spark, table).get
    assert(st.rowCount == 3)
    assert(st.timeMin == 100L && st.timeMax == 200L)
    assert(st.tagValues("host").sorted == Seq("a", "b"))
    assert(st.tagValues("region").sorted == Seq("east", "west"))
    assert(st.cappedTags.isEmpty)
  }

  test("tag_values answers from metadata when the predicate is coverable") {
    // covering range: no scan — fallback must NOT run
    val vals = StatsCatalog.tagValuesFast(spark, table, "host",
      RpcPredicate().withRange(0L, 1000L)) {
      fail("fallback scan must not run for a covering predicate")
    }
    assert(vals.as[String].collect().toSeq == Seq("a", "b"))
    // non-covering range: must fall back
    var fell = false
    StatsCatalog.tagValuesFast(spark, table, "host",
      RpcPredicate().withRange(0L, 150L)) {
      fell = true; Seq("a").toDF("value")
    }
    assert(fell)
    // row-expression predicate: must fall back
    var fell2 = false
    StatsCatalog.tagValuesFast(spark, table, "host",
      RpcPredicate().withExpr(col("user") > 10)) {
      fell2 = true; Seq("a").toDF("value")
    }
    assert(fell2)
  }

  test("tag_keys from metadata for coverable predicates") {
    val keys = StatsCatalog.tagKeysFast(spark, table, RpcPredicate()) {
      fail("no scan needed")
    }
    assert(keys == Seq("host", "region"))
    var fell = false
    StatsCatalog.tagKeysFast(spark, table,
      RpcPredicate().withExpr(col("user") > 10)) { fell = true; Nil }
    assert(fell)
  }

  test("table_names from sidecars with range intersection") {
    val names = StatsCatalog.tableNamesFast(spark, Map("cpu" -> table),
      RpcPredicate().withRange(150L, 1000L))(_ => fail("no probe needed"))
    assert(names == Seq("cpu"))
    val none = StatsCatalog.tableNamesFast(spark, Map("cpu" -> table),
      RpcPredicate().withRange(1000L, 2000L))(_ => fail("no probe needed"))
    assert(none.isEmpty)
  }

  test("scanChunks plans dedup from sidecar ranges alone") {
    val tmp = Files.createTempDirectory("graft-chunks").toString
    // chunk A: t 10..20 ; chunk B: t 15..30 (overlaps A); chunk C: t 100
    LineProtocol.ingest(spark, Seq("m,host=a v=1.0 10", "m,host=b v=2.0 20"))("m")
      .write.parquet(s"$tmp/rawA")
    LineProtocol.ingest(spark, Seq("m,host=b v=9.0 20", "m,host=c v=3.0 30"))("m")
      .write.parquet(s"$tmp/rawB")
    LineProtocol.ingest(spark, Seq("m,host=z v=7.0 100"))("m")
      .write.parquet(s"$tmp/rawC")
    for (c <- Seq("A", "B", "C"))
      Ingest.compact(spark, s"$tmp/raw$c", s"$tmp/chunk$c", Seq("host", "time"))

    val out = graft.operators.Upsert.scanChunks(spark,
      Seq(s"$tmp/chunkA", s"$tmp/chunkB", s"$tmp/chunkC"), Seq("host", "time"))
    val rows = out.orderBy("host", "time")
      .select("host", "v").as[(String, Double)].collect().toSeq
    // (b,20) deduped with later chunk B winning; chunk C scans clean
    assert(rows == Seq(("a", 1.0), ("b", 9.0), ("c", 3.0), ("z", 7.0)))
  }

  test("capped tags are excluded from metadata-only answering") {
    // far over cap (50 >> 2*10): the HLL pre-check skips collect_set
    // entirely — no unbounded aggregation buffer — and marks the tag capped
    val df = (1 to 50).map(i => (s"t$i", i.toLong, 1.0)).toDF("host", "time", "v")
    val st = StatsCatalog.compute(df, tagCols = Seq("host"), cap = 10)
    assert(st.cappedTags == Seq("host"))
    assert(st.tagValues("host").isEmpty)
    // capped tags never answer tag_values from metadata
    val tmp = Files.createTempDirectory("graft-capped").toString
    StatsCatalog.save(spark, tmp, st)
    var fell = false
    StatsCatalog.tagValuesFast(spark, tmp, "host", RpcPredicate()) {
      fell = true; Seq("x").toDF("value")
    }
    assert(fell)
    // ...but still count as present for tag_keys
    assert(StatsCatalog.tagKeysFast(spark, tmp, RpcPredicate())(fail("no scan")) ==
      Seq("host"))
  }

  test("tags between cap and the HLL margin get an exact capped verdict") {
    // 15 distinct, cap=10: estimate <= 2*cap so collect_set runs (bounded
    // by cap+1 slice) and the verdict comes from the exact sliced set
    val df = (1 to 15).map(i => (f"t$i%02d", i.toLong, 1.0)).toDF("host", "time", "v")
    val st = StatsCatalog.compute(df, tagCols = Seq("host"), cap = 10)
    assert(st.cappedTags == Seq("host"))
    assert(st.tagValues("host").size == 10)
    // and just under the cap: not capped, full value set
    val st2 = StatsCatalog.compute(df, tagCols = Seq("host"), cap = 20)
    assert(st2.cappedTags.isEmpty)
    assert(st2.tagValues("host").size == 15)
  }
}
