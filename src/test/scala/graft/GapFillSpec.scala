package graft

import org.apache.spark.sql.functions._
import graft.operators.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  // two series over a 10-bucket grid (every=10), with holes:
  //   a: observed at 0, 30, 40, 90       b: observed at 20 only
  private lazy val observed = Seq(
    ("a", 0L, 10.0), ("a", 30L, 40.0), ("a", 40L, 20.0), ("a", 90L, 90.0),
    ("b", 20L, 5.0)).toDF("k", "t", "v")

  private def filled(strategy: GapFill.Strategy): Map[(String, Long), Option[Double]] =
    GapFill.onGrid(observed, Seq("k"), "t", startNs = 0L, stopNs = 100L,
        everyNs = 10L, fills = Map("v" -> strategy))
      .as[(String, Long, Option[Double])].collect()
      .map { case (k, t, v) => (k, t) -> v }.toMap

  test("grid materializes every bucket for every key") {
    val m = filled(GapFill.KeepNull)
    assert(m.size == 20) // 2 keys x 10 buckets
    assert(m(("a", 0L)).contains(10.0) && m(("a", 50L)).isEmpty)
    assert(m(("b", 20L)).contains(5.0) && m(("b", 90L)).isEmpty)
  }

  test("fill(value) plugs holes with the constant, keeps observations") {
    val m = filled(GapFill.Value(lit(-1.0)))
    assert(m(("a", 10L)).contains(-1.0) && m(("a", 30L)).contains(40.0))
  }

  test("fill(previous) carries forward; leading holes stay null") {
    val m = filled(GapFill.Previous)
    assert(m(("a", 10L)).contains(10.0) && m(("a", 20L)).contains(10.0))
    assert(m(("a", 50L)).contains(20.0) && m(("a", 80L)).contains(20.0))
    assert(m(("b", 10L)).isEmpty, "no observation before t=20")
    assert(m(("b", 90L)).contains(5.0))
  }

  test("fill(linear) interpolates between neighbors; edges do not extrapolate") {
    val m = filled(GapFill.Linear)
    // between (0,10) and (30,40): slope 1/unit
    assert(m(("a", 10L)).contains(20.0) && m(("a", 20L)).contains(30.0))
    // between (40,20) and (90,90): 20 + 70*(t-40)/50
    assert(m(("a", 50L)).contains(34.0) && m(("a", 80L)).contains(76.0))
    // b has one observation: nothing to interpolate, edges stay null
    assert(m(("b", 10L)).isEmpty && m(("b", 30L)).isEmpty)
  }

  test("bucketAndFill buckets on start-aligned bounds and filters the range") {
    val raw = Seq(("a", 3L, 1.0), ("a", 7L, 3.0), ("a", 25L, 5.0),
      ("a", 999L, 9.0) /* outside [0,30) */).toDF("k", "tn", "v")
    val out = GapFill.bucketAndFill(raw, Seq("k"), "tn", 0L, 30L, 10L,
        aggs = Seq(avg($"v").as("m")), fills = Map("m" -> GapFill.Previous))
      .as[(String, Long, Option[Double])].collect()
      .map { case (k, t, v) => (k, t) -> v }.toMap
    assert(out.size == 3)
    assert(out(("a", 0L)).contains(2.0)) // avg(1,3)
    assert(out(("a", 10L)).contains(2.0)) // carried
    assert(out(("a", 20L)).contains(5.0))
  }

  test("one exchange + one sort per fill strategy (plan shape)") {
    val plan = GapFill.onGrid(observed, Seq("k"), "t", 0L, 100L, 10L,
        fills = Map("v" -> GapFill.Linear))
      .queryExecution.executedPlan.toString
    // prev+next windows ride ONE Window partitioning; no extra exchange
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size <= 2,
      s"unexpected exchanges:\n$plan")
  }
}
