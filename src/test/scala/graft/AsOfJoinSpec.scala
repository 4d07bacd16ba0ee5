package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq( // (sym, qt, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0)).toDF("sym", "qt", "px")
  private lazy val trades = Seq( // (sym, tt)
    ("A", 25L), ("A", 20L), ("A", 5L), ("B", 100L), ("C", 50L))
    .toDF("sym", "tt")

  test("backward as-of: latest right strictly before each left row") {
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("tt"),
        Option(r.getAs[Any]("px"))))
    assert(out.toSeq == Seq(
      ("A", 5L, None),          // nothing before t=5
      ("A", 20L, Some(1.0)),    // STRICT <: the t=20 quote does not match
      ("A", 25L, Some(2.0)),
      ("B", 100L, Some(9.0)),
      ("C", 50L, None)))        // key with no right rows at all
  }

  test("as-of plan has one shuffle and no join node") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("forward as-of: earliest right strictly after each left row") {
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("tt"),
        Option(r.getAs[Any]("px"))))
    assert(out.toSeq == Seq(
      ("A", 5L, Some(1.0)),
      ("A", 20L, Some(3.0)),    // STRICT >: the t=20 quote does not match
      ("A", 25L, Some(3.0)),
      ("B", 100L, None),        // nothing after t=100
      ("C", 50L, None)))
  }

  test("nearest as-of: min |Δt| with ties to the earlier match, strict " +
      "on equal timestamps; plan stays one shuffle, no join") {
    val out = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("tt"),
        Option(r.getAs[Any]("px"))))
    assert(out.toSeq == Seq(
      ("A", 5L, Some(1.0)),     // only forward exists
      ("A", 20L, Some(1.0)),    // equal-t quote excluded; 10 vs 30 tie -> earlier
      ("A", 25L, Some(2.0)),    // |25-20| = |25-30| tie -> earlier (20)
      ("B", 100L, Some(9.0)),   // only backward exists
      ("C", 50L, None)))
    val plan = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("tolerance: a beyond-tolerance match nulls out; nearest prunes " +
      "each direction before the pick") {
    // backward with tolerance 5: trade A@25 matched quote@20 (Δ=5 ok);
    // trade B@100 matched quote@15 (Δ=85) -> nulled
    val b = AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt",
        Seq("px"), toleranceNs = Some(5L))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("tt"),
        Option(r.getAs[Any]("px"))))
    assert(b.toSeq == Seq(
      ("A", 5L, None), ("A", 20L, None), // Δ=10 > 5
      ("A", 25L, Some(2.0)),
      ("B", 100L, None), ("C", 50L, None)))
    // nearest with tolerance 5: A@25 keeps both directions in range and
    // ties to earlier; A@5 keeps the forward quote@10 (Δ=5)
    val n = AsOfJoin.nearest(trades, quotes, Seq("sym"), "tt", "qt",
        Seq("px"), toleranceNs = Some(5L))
      .orderBy("sym", "tt")
      .collect().map(r => (r.getAs[String]("sym"), r.getAs[Long]("tt"),
        Option(r.getAs[Any]("px"))))
    assert(n.toSeq == Seq(
      ("A", 5L, Some(1.0)), ("A", 20L, None), // both directions Δ=10
      ("A", 25L, Some(2.0)),
      ("B", 100L, None), ("C", 50L, None)))
  }
}
