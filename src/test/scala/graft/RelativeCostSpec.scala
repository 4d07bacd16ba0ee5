package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** The reference's relative-performance contracts as timed assertions.
  *
  * BASELINE.md's harness (server_benchmarks/benches/read_filter.rs:28-48,
  * read_group.rs:28-50) publishes no absolute numbers — it measures the
  * SAME query over different chunk placements and relies on the relative
  * costs: a compacted, dedup-free placement must scan at raw-union cost
  * (the dedup machinery must be free when statistics prove it
  * unnecessary), and overlap-dedup cost must be confined to the
  * overlapping groups. `UpsertSpec`/`PlanShapeSpec` pin the PLAN side of
  * this (clean chunks produce zero exchanges); this spec pins the TIMED
  * side with deliberately tolerant thresholds — wall-clock on a shared
  * box is one-sided noisy, so every sample is a min-of-N and every
  * threshold leaves a 3× cushion. What it must catch: a regression that
  * silently routes clean chunks through the groupBy dedup (a ~shuffle
  * per scan — far beyond any cushion at this row count).
  */
class RelativeCostSpec extends SparkSpec {

  /** min-of-n wall clock of a fully-materialized run (noop sink, same
    * materialization as Bench). One untimed warmup compiles codegen. */
  private def timedMin(df: => DataFrame, n: Int = 5): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup
    (1 to n).map(_ => once()).min
  }

  private lazy val chunkDirs: Seq[String] = {
    val ev = sources.Tables.events(spark, sf("sf0.1"))
      .select("user_id", "event_type", "ts_ns", "value")
    val tmp = Files.createTempDirectory("graft-relcost").toString
    val cuts = ev.stat.approxQuantile("ts_ns",
      Array(1.0 / 6, 2.0 / 6, 3.0 / 6, 4.0 / 6, 5.0 / 6), 0.001)
    val edges = Double.MinValue +: cuts.toSeq :+ Double.MaxValue
    edges.sliding(2).zipWithIndex.map { case (w, i) =>
      ev.filter(col("ts_ns") >= w(0) && col("ts_ns") < w(1))
        .coalesce(1).write.parquet(s"$tmp/c$i")
      s"$tmp/c$i"
    }.toSeq
  }
  private def chunk(i: Int): DataFrame = spark.read.parquet(chunkDirs(i))
  private val pk = Seq("user_id", "event_type", "ts_ns")

  test("dedup-free chunk scan costs like the raw union scan " +
      "(read_filter.rs compacted-placement contract)") {
    val n = chunkDirs.size
    // disjoint PK-range stats -> every chunk is its own overlap group
    val disjoint = (0 until n).map(i => (chunk(i), (i * 10L, i * 10L + 5L), true))
    val raw = timedMin((0 until n).map(chunk).reduce(_ union _))
    val clean = timedMin(Upsert.scanWithDedup(disjoint, pk))
    info(f"raw union $raw%.3f s, clean dedup-scan $clean%.3f s")
    assert(clean <= raw * 3 + 0.25,
      f"dedup-free scan ($clean%.3f s) should cost like a raw union " +
        f"scan ($raw%.3f s): the stats-proven-clean path must not pay " +
        "any dedup machinery")
  }

  test("overlap dedup cost is confined to the overlapping groups " +
      "(read_group.rs overlapped-placement contract)") {
    val n = chunkDirs.size
    // all ranges identical -> ONE dedup group over every chunk
    val allOverlap = (0 until n).map(i => (chunk(i), (0L, 5L), true))
    // only chunks 0 and 1 overlap; the rest scan clean
    val mixed = (0 until n).map { i =>
      if (i <= 1) (chunk(i), (0L, 5L), true)
      else (chunk(i), (i * 10L, i * 10L + 5L), true)
    }
    val tAll = timedMin(Upsert.scanWithDedup(allOverlap, pk))
    val tMixed = timedMin(Upsert.scanWithDedup(mixed, pk))
    info(f"all-overlap $tAll%.3f s, two-of-$n-overlap $tMixed%.3f s")
    // mixed dedups 2/6 of the rows; it must never cost MORE than
    // dedup-everything (cushioned: these runs are a few hundred ms)
    assert(tMixed <= tAll * 1.5 + 0.25,
      f"partial-overlap scan ($tMixed%.3f s) should not exceed the " +
        f"dedup-everything scan ($tAll%.3f s): dedup cost must be " +
        "confined to overlapping groups")
  }
}
