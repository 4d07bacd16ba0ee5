package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.core.NsTime
import graft.functions.WindowBounds

/** Property tests for window stop-bound labeling, pinned against the
  * reference's `Window::get_earliest_bounds` vectors
  * (query/src/func/window/internal.rs:387-578, itself ported from Flux's
  * TestWindow_GetEarliestBounds) and then generalized with scalacheck
  * invariants across negative offsets and pre-1970 timestamps.
  *
  * Only the `stop` member matters here: the reference's `window_bounds`
  * UDF emits bounds.stop as the bucket label (window.rs:44-57), and the
  * equal every/period ("tumbling") cases are the ones read_window_aggregate
  * can produce.
  */
class WindowBoundsPropSpec extends SparkSpec {

  private def check(name: String, prop: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def ns(iso: String): Long =
    java.time.Instant.parse(iso).getEpochSecond * 1000000000L
  private val MIN = 60L * 1000000000L // ns per minute
  private val SEC = 1000000000L

  // ------------------------------------------- reference golden vectors

  test("fixed windows: reference GetEarliestBounds stop vectors (internal.rs:387)") {
    // "simple": every=5m offset=0, t=6m -> stop=10m
    assert(NsTime.windowStopNs(6 * MIN, 5 * MIN, 0L) == 10 * MIN)
    // "simple with offset": every=5m offset=30s, t=5m -> stop=5m30s
    assert(NsTime.windowStopNs(5 * MIN, 5 * MIN, 30 * SEC) == 5 * MIN + 30 * SEC)
    // "truncate before offset": every=5s offset=2s, t=1s -> stop=2s
    assert(NsTime.windowStopNs(1 * SEC, 5 * SEC, 2 * SEC) == 2 * SEC)
    // "truncate after offset": every=5s offset=2s, t=3s -> stop=7s
    assert(NsTime.windowStopNs(3 * SEC, 5 * SEC, 2 * SEC) == 7 * SEC)
  }

  test("month windows: reference GetEarliestBounds calendar vectors (internal.rs:425,530-577)") {
    // "simple months": every=5 offset=0, t=1970-01-01 -> stop=1970-06-01
    assert(WindowBounds.monthWindowStop(ns("1970-01-01T00:00:00Z"), 5, 0) ==
      ns("1970-06-01T00:00:00Z"))
    // "truncate before calendar offset": every=5 offset=2, t=1970-02-01
    // -> window [1969-10-01, 1970-03-01): a pre-1970 start
    assert(WindowBounds.monthWindowStop(ns("1970-02-01T00:00:00Z"), 5, 2) ==
      ns("1970-03-01T00:00:00Z"))
    // "truncate after calendar offset": every=5 offset=2, t=1970-04-01
    assert(WindowBounds.monthWindowStop(ns("1970-04-01T00:00:00Z"), 5, 2) ==
      ns("1970-08-01T00:00:00Z"))
    // "negative calendar offset": every=5 offset=-2, t=1970-02-01
    assert(WindowBounds.monthWindowStop(ns("1970-02-01T00:00:00Z"), 5, -2) ==
      ns("1970-04-01T00:00:00Z"))
  }

  // ------------------------------------------------ generated invariants

  // ts range: ±10^18 ns ≈ ±31 years around the epoch at full ns precision
  // plus modern-era magnitudes; keeps (ts - offset) and stop far from Long
  // overflow while exercising pre-1970 floor-division behavior hard.
  private val tsGen: Gen[Long] = Gen.oneOf(
    Gen.choose(-1000000000000000000L, 1000000000000000000L),
    Gen.choose(ns("2020-01-01T00:00:00Z"), ns("2030-01-01T00:00:00Z")))
  private val everyGen: Gen[Long] = Gen.oneOf(
    Gen.choose(1L, 1000L),                      // degenerate tiny widths
    Gen.choose(1L * SEC, 366L * 86400L * SEC))  // 1s .. 1y
  private val fixedCase: Gen[(Long, Long, Long)] = for {
    ts <- tsGen
    every <- everyGen
    offset <- Gen.choose(-2 * every, 2 * every) // incl. negative, > every
  } yield (ts, every, offset)

  test("fixed windows: stop is the least grid point > ts; window contains ts") {
    // noShrink: scalacheck shrinking walks outside the generator's domain
    // (every -> 0, ts -> out-of-range), producing false counterexamples
    check("fixed-invariants", Prop.forAllNoShrink(fixedCase) { case (ts, every, off) =>
      val stop = NsTime.windowStopNs(ts, every, off)
      // half-open [start, stop) with start = stop - every contains ts
      val contains = stop > ts && stop - every <= ts
      // stop sits on the (every, offset) grid
      val onGrid = Math.floorMod(stop - off, every) == 0L
      // every ts' in [start, stop) labels to the same stop (spot the edges)
      val stable = NsTime.windowStopNs(stop - every, every, off) == stop &&
        NsTime.windowStopNs(stop - 1, every, off) == stop &&
        NsTime.windowStopNs(stop, every, off) == stop + every
      contains && onGrid && stable
    }, min = 500)
  }

  // month indices ±3400 from epoch = years ~1686..2253, inside the i64
  // nanosecond domain (±292 years — the engine's time axis, like the
  // reference's TimestampNanosecond); offsets well past ±every to
  // exercise floor behavior on both signs
  private val monthCase: Gen[(Long, Int, Int)] = for {
    mi <- Gen.choose(-3400L, 3400L)
    jitter <- Gen.choose(0L, 27L * 86400L * SEC) // anywhere inside the month
    every <- Gen.choose(1, 25)
    offset <- Gen.choose(-60, 60)
  } yield (WindowBounds.monthStartNs(mi) + jitter, every, offset)

  test("month windows: stop month is on the (every, offset) month grid and contains ts") {
    check("month-invariants", Prop.forAllNoShrink(monthCase) { case (ts, every, off) =>
      val stop = WindowBounds.monthWindowStop(ts, every, off)
      val stopIdx = WindowBounds.monthIndex(stop)
      // stop is exactly a month start on the offset grid
      val onGrid = WindowBounds.monthStartNs(stopIdx) == stop &&
        Math.floorMod(stopIdx - off, every.toLong) == 0L
      // the window [stop - every months, stop) contains ts
      val startNs = WindowBounds.monthStartNs(stopIdx - every)
      startNs <= ts && ts < stop && onGrid
    }, min = 500)
  }

  test("month windows: catalyst codegen agrees with the scala model on random vectors") {
    import spark.implicits._
    val cases = Gen.listOfN(400, monthCase).sample.get
    val byParams = cases.groupBy { case (_, e, o) => (e, o) }
    for (((every, off), group) <- byParams) {
      val tss = group.map(_._1)
      val got = tss.toDF("time")
        .select(WindowBounds.windowBoundsMonths(col("time"), every, off).as("b"))
        .as[Long].collect().toSeq
      val want = tss.map(WindowBounds.monthWindowStop(_, every, off))
      assert(got == want, s"every=$every offset=$off diverged")
    }
  }
}
