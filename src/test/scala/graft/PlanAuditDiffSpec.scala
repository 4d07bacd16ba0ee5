package graft

import graft.PlanAudit.Shape

/** Cross-round plan-shape regression gate: every `sbt test` re-plans the
  * full query fleet (static, AQE off — same conditions as the committed
  * artifact) and fails if any query's scale-gated counters (exchanges,
  * sort-merge joins, cartesians, unkeyed windows, global sorts) GREW vs
  * the last committed `plan_audit_r{N}.json`. This turns the per-round
  * audit artifact from a diffable record into an enforced contract: a
  * change that silently adds a shuffle or demotes a broadcast join to
  * sort-merge breaks the build, not a production profile.
  *
  * Intentional shape changes land by updating the whitelist below with a
  * reason (and regenerating the artifact at round close).
  */
class PlanAuditDiffSpec extends SparkSpec {
  /** query -> reason, for intentional regressions in the gated metrics */
  private val allowedGrowth: Map[String, String] = Map.empty

  test("regression detector flags a seeded unkeyed-window growth") {
    val base = Shape("q", exchanges = 3, broadcasts = 1, smj = 0, bhj = 1,
      bnlj = 0, cartesian = 0, globalSorts = 1, unkeyedWindows = 0,
      codegenSpans = 4, scans = 2, scansWithPushdown = 2, err = None)
    val cur = base.copy(unkeyedWindows = 1)
    assert(PlanAudit.regressions(base, cur) == Seq("unkeyed_windows grew 0 -> 1"))
    val worse = base.copy(exchanges = 5, smj = 1, cartesian = 1)
    assert(PlanAudit.regressions(base, worse).size == 3)
    // decreases and informational counters never gate
    val better = base.copy(exchanges = 2, codegenSpans = 9, scans = 3)
    assert(PlanAudit.regressions(base, better).isEmpty)
  }

  test("audit artifact round-trips through readAudit") {
    val baselinePath = PlanAudit.latestCommittedAudit()
    assume(baselinePath.isDefined, "no committed plan_audit_r*.json")
    val baseline = PlanAudit.readAudit(baselinePath.get)
    assert(baseline.size > 200, s"suspiciously small audit: ${baseline.size}")
    assert(baseline.contains("q01_agg") || baseline.nonEmpty)
  }

  test("no plan-shape regressions vs the last committed audit") {
    val baselinePath = PlanAudit.latestCommittedAudit()
    assume(baselinePath.isDefined, "no committed plan_audit_r*.json")
    val baseline = PlanAudit.readAudit(baselinePath.get)
    // match the audit main's session conditions on the shared session
    // (these confs are dynamic); restore afterwards so other suites see
    // their usual settings
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = conf.get("spark.sql.shuffle.partitions", "4")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val problems = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          baseline.get(name).toSeq.flatMap { base =>
            val cur =
              try PlanAudit.shapeOf(name,
                fn(spark, sf("sf0.001")).queryExecution.executedPlan)
              catch { case e: Throwable =>
                fail(s"$name fails to plan: ${e.getMessage}")
              }
            if (allowedGrowth.contains(name)) Nil
            else PlanAudit.regressions(base, cur).map(m => s"$name: $m")
          }
      }
      assert(problems.isEmpty,
        s"\nplan-shape regressions vs ${baselinePath.get}:\n  " +
          problems.mkString("\n  "))
    } finally {
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
