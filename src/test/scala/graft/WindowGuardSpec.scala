package graft

import org.apache.spark.sql.catalyst.plans.logical.Window

/** Fleet-wide guard against the one plan shape that silently stops
  * scaling: a `Window` with NO partition spec is a single task ordering
  * its whole input (Spark itself warns "No Partition Defined ... may
  * cause serious performance degradation"). Every corpus-sized rank in
  * this repo is keyed (two-level rank, keyed prefix sums, per-stratum
  * shard dealing); the only unkeyed windows allowed are the documented
  * METADATA-sized frames below — bounded by bucket/tag/vocabulary
  * cardinality, never by corpus rows. This spec walks every registered
  * query's optimized plan at sf0.001 and fails if an unkeyed window
  * appears anywhere else, so a future query can't reintroduce the
  * anti-pattern unnoticed (and the bench-stderr WindowExec warnings are
  * pinned to exactly these sites).
  */
class WindowGuardSpec extends SparkSpec {

  /** Queries whose plans legitimately contain unpartitioned windows,
    * with the reason the frame stays small at any corpus size. */
  private val allowed: Map[String, String] = Map(
    // Sampling.budgetSelect: cumulative sum over ~20 quality-bucket
    // TOTALS to find the boundary bucket, plus the in-boundary-bucket
    // rank (one bucket's rows, df-capped)
    "corpus_budget_select" -> "quality-bucket totals (~20 rows)",
    // pipeline_end_to_end composes budgetSelect — same two frames
    "pipeline_end_to_end" -> "budgetSelect bucket totals (~20 rows)",
    // InfluxQL TOP(field, k) over a grouped-selector result: one row
    // per tag value, tag-cardinality-sized
    "influxql_top_tag" -> "per-tag-value selector rows",
    // Ranking.zipfFit: rank-frequency regression over the top-N
    // vocabulary slice (already limited before the window)
    "text_zipf" -> "top-N vocabulary slice",
    // Sampling.unimaxMix: water-filling rank/cumsum over the per-stratum
    // COUNTS frame (languages — tens of rows at any corpus size)
    "corpus_unimax_mix" -> "strata-count frame (languages)")

  test("no query plans an unpartitioned window outside the documented " +
      "metadata-sized sites") {
    val d = sf("sf0.001")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val unkeyed = fn(spark, d).queryExecution.optimizedPlan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (unkeyed.nonEmpty) Some(name) else None
    }
    val unexpected = offenders.filterNot(allowed.contains)
    assert(unexpected.isEmpty,
      s"unpartitioned Window in: ${unexpected.mkString(", ")} — key it " +
        "(partitionBy) or, if the frame is provably metadata-sized, add " +
        "it to the whitelist with a justification")
    val stale = allowed.keySet -- offenders.toSet
    assert(stale.isEmpty,
      s"whitelist entries no longer needed: ${stale.mkString(", ")}")
  }
}
