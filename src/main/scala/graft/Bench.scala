package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are fully materialized through a noop
  * sink (a bare .count() would let Catalyst prune the computed columns
  * and undercount the real work). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // The default codegen cache holds 100 generated classes; the ~75
      // bench queries generate more than that, so with the default size a
      // query's Janino-compiled classes are evicted before its next timed
      // pass and every pass re-pays compilation. A large cache makes one
      // untimed warmup pass keep ALL subsequent passes warm.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Timing methodology (shared-box noise): co-tenant CPU bursts run for
    // MINUTES, so iterating one query n times back-to-back lets a single
    // burst poison every sample of that query — min-of-n cannot shed it.
    // Instead run K interleaved FULL-SUITE passes (each query appears once
    // per pass, ~45 s apart), and report each query's MIN across passes: a
    // burst now costs at most one pass's sample of any given query, and
    // the cross-pass min sheds it. Noise is one-sided (a burst only ADDS
    // time), so the min is the max-likelihood estimate of true cost.
    // Per-pass totals go into the JSON artifact so contamination of any
    // single pass is visible in the record itself.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt.max(1)
    // Profiling filter: SPARK_GRAFT_ONLY=name1,name2 restricts the run to
    // the named queries (local iteration on a hot query without paying the
    // full suite). Absent in the driver's environment → full suite.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Locale.ROOT pins the decimal separator: String.format uses the JVM
    // default locale, which under e.g. de_DE would print commas and make
    // the JSON line unparseable.
    def d3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    // Untimed warmup pass at tiny SF: generated code is keyed by plan
    // source (data-independent), so this compiles every query's codegen
    // once; the enlarged cache above keeps it resident for all K passes.
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // samples(p) = Seq[(name, Option[sec])] for pass p, suite order.
    // A query that throws records None — NOT its failure latency — so a
    // broken query can never masquerade as a 0.05 s "result" (r6 lesson:
    // 47 plan-time failures benched as plausible speedups).
    def onePass(): Seq[(String, Option[Double])] =
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        (name, if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
      }
    var samples = (1 to passes).map(_ => onePass())
    // Adaptive top-up (co-tenant contamination guard): when the FIRST
    // pass's total exceeds the LAST's by >30%, something big was running
    // early in the bench — one extra pass gives every query another
    // chance at an uncontended sample. Bounded at +2 so a permanently
    // loaded box still terminates. Totals compare over the queries that
    // succeeded in BOTH passes: a query failing in just one pass would
    // otherwise skew the ratio (a last-pass-only failure drops 30 s from
    // that side and falsely fires; a first-pass-only failure hides real
    // contamination).
    def comparableTotals(a: Seq[(String, Option[Double])],
        b: Seq[(String, Option[Double])]): (Double, Double) = {
      val inB = b.collect { case (n, Some(_)) => n }.toSet
      val both = a.collect { case (n, Some(_)) if inB(n) => n }.toSet
      (a.collect { case (n, Some(t)) if both(n) => t }.sum,
        b.collect { case (n, Some(t)) if both(n) => t }.sum)
    }
    var extra = 0
    while (extra < 2 && samples.size >= 2 && {
      val (h, l) = comparableTotals(samples.head, samples.last)
      l > 0 && h > 1.3 * l
    }) {
      val (h, l) = comparableTotals(samples.head, samples.last)
      System.err.println(s"[bench] first pass ${d3(h)}s vs last ${d3(l)}s " +
        "(shared-success queries) — adding a top-up pass")
      samples = samples :+ onePass()
      extra += 1
    }
    val byQuery = queries.map { case (name, _) =>
      val ts = samples.flatMap(_.find(_._1 == name).get._2)
      (name, if (ts.isEmpty) None else Some((ts.min, ts.max - ts.min)))
    }
    val failed = byQuery.collect { case (n, None) => n }
    val qs = byQuery.collect { case (k, Some((min, _))) => "\"" + k + "\":" + d3(min) }
      .mkString("{", ",", "}")
    val spread = byQuery.collect { case (k, Some((_, s))) => "\"" + k + "\":" + d3(s) }
      .mkString("{", ",", "}")
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val passTotals = samples.map(p => d3(p.flatMap(_._2).sum)).mkString("[", ",", "]")
    // Contamination marker: relative spread of the pass totals. A clean run
    // has passes within a few percent of each other; a co-tenant burst
    // inflates one pass's total, so (max-min)/min > 0.3 flags the run as
    // burst-poisoned IN THE ARTIFACT ITSELF — a judge or later round
    // reading the sidecar need not reconstruct this from pass_totals.
    val rawTotals = samples.map(_.flatMap(_._2).sum).filter(_ > 0)
    val passSpread =
      if (rawTotals.size < 2) 0.0
      else (rawTotals.max - rawTotals.min) / rawTotals.min
    val contaminated = passSpread > 0.3
    val total = byQuery.flatMap(_._2.map(_._1)).sum
    // The driver captures only a bounded 2000-byte TAIL of the run's
    // MERGED stdout+stderr (with the sbt "[success]" line inside it) and
    // parses the last JSON line from that window; at ~190 queries the full
    // per-query map overflows it and the whole bench reads as unparseable
    // (r6-r8: "parsed": null — r8's tail held the 6 KB stderr detail line
    // truncated mid-map ABOVE the compact line). So: the full-fidelity
    // record goes ONLY to the sidecar file — never stdout, never stderr —
    // and stdout gets exactly one compact line whose "queries" map rolls
    // the minima up by family prefix (q/rpc/events/influxql/dedup/text/…
    // — ~35 entries, stable round-over-round for trend comparison).
    // A SPARK_GRAFT_ONLY run is a partial suite: mark it in BOTH emitted
    // JSON forms so no stdout-parsing harness can record a filtered
    // partial total as a round total (the sidecar routing below already
    // protects the files; this protects the stream).
    val filteredMark = if (only.isDefined)
      s""","filtered":true,"only":${only.get.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      else ""
    val detail = s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"failed":$failedArr,"passes":${samples.size},"pass_totals":$passTotals,"pass_spread":${d3(passSpread)},"contaminated":$contaminated$filteredMark,"sf":"$sfDir"}"""
    val famTotals = byQuery
      .collect { case (k, Some((min, _))) => (k.takeWhile(_ != '_'), min) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (fam, xs) => "\"" + fam + "\":" + d3(xs.map(_._2).sum) }
      .mkString("{", ",", "}")
    val failedCapped = // keep stdout bounded even if half the suite fails
      (failed.take(8).map("\"" + _ + "\"") ++
        (if (failed.size > 8) Seq("\"+" + (failed.size - 8) + " more\"") else Nil))
        .mkString("[", ",", "]")
    // Per-round sidecar name. An explicit tag wins (SPARK_GRAFT_ROUND env
    // or a `--round N` arg) — the directory scan below silently misfiles
    // the sidecar if the bench runs from a different cwd, or overwrites
    // it if the bench runs twice in one round. Fallback: the highest
    // BENCH_r{N}.json on disk names the PREVIOUS round (the driver writes
    // this round's after this main exits), so max+1 is the current round.
    // Keeping every round's per-query detail in git makes family drift
    // attributable to queries (r10 verdict: a 12% text-family question
    // was unprovable because bench_detail.json had been overwritten).
    val explicitRound = sys.env.get("SPARK_GRAFT_ROUND")
      .orElse(args.sliding(2).collectFirst {
        case Array("--round", n) => n })
      .flatMap(n => scala.util.Try(n.trim.toInt).toOption)
    val roundTag = explicitRound.map(n => f"_r$n%02d").getOrElse(try {
      val pat = "BENCH_r(\\d+)\\.json".r
      val ns = Option(new java.io.File(".").list()).toSeq.flatten
        .collect { case pat(n) => n.toInt }
      if (ns.isEmpty) "" else f"_r${ns.max + 1}%02d"
    } catch { case _: Throwable => "" })
    // A filtered profiling run must never clobber the round's full-suite
    // sidecars — route it to a scratch name instead.
    val detailName =
      if (only.isDefined) "bench_detail_filtered.json"
      else s"bench_detail$roundTag.json"
    val compact = s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$famTotals,"n_queries":${byQuery.size},"n_failed":${failed.size},"failed":$failedCapped,"passes":${samples.size},"pass_totals":$passTotals,"pass_spread":${d3(passSpread)},"contaminated":$contaminated$filteredMark,"sf":"$sfDir","detail":"$detailName"}"""
    // bench_detail.json stays as the stable latest-run pointer (not for
    // filtered profiling runs, which would replace it with a partial map)
    val sidecars =
      if (only.isDefined) Seq(detailName)
      else Seq(detailName, "bench_detail.json").distinct
    sidecars.foreach { f =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(f),
        (detail + "\n").getBytes("UTF-8"))
      catch { case e: Throwable =>
        System.err.println(s"[bench] sidecar write failed ($f): $e") }
    }
    println(compact)
    spark.stop()
  }
}
