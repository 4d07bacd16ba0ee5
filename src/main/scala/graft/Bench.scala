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
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Untimed warmup pass at tiny SF: generated code is keyed by plan
    // source (data-independent), so this compiles every query's codegen
    // once; the enlarged cache above keeps it resident for all K passes.
    queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val samples = // samples(p) = Seq[(name, sec)] for pass p, suite order
      (1 to passes).map { _ =>
        queries.map { case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          (name, (System.nanoTime() - t0) / 1e9)
        }
      }
    val byQuery = queries.map { case (name, _) =>
      val ts = samples.map(_.find(_._1 == name).get._2)
      (name, ts.min, ts.max - ts.min)
    }
    // The driver captures only a bounded tail of stdout and parses the last
    // JSON line from it; full-precision doubles plus a per-query spread map
    // overflow that window and the whole bench reads as unparseable. Keep
    // stdout to ONE compact line (3-decimal minima) and put the verbose
    // per-query spread on stderr for the record.
    // Locale.ROOT pins the decimal separator: the f"" interpolator uses
    // the JVM default locale, which under e.g. de_DE would print commas
    // and make the JSON line unparseable
    def d3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = byQuery.map { case (k, min, _) => "\"" + k + "\":" + d3(min) }
      .mkString("{", ",", "}")
    val spread = byQuery.map { case (k, _, s) => "\"" + k + "\":" + d3(s) }
      .mkString("{", ",", "}")
    val passTotals = samples.map(p => d3(p.map(_._2).sum)).mkString("[", ",", "]")
    val total = byQuery.map(_._2).sum
    System.err.println(s"""[bench-detail] {"passes":$passes,"spread":$spread}""")
    println(s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":$qs,"passes":$passes,"pass_totals":$passTotals,"sf":"$sfDir"}""")
    spark.stop()
  }
}
