package graft

import org.apache.spark.sql.functions._
import graft.core.NsTime
import graft.functions.WindowBounds

class WindowBoundsSpec extends SparkSpec {

  test("fixed windows: reference golden vectors (window.rs:96-118)") {
    // every=200, offset=50: [100, 200, 300, 400] -> [250, 250, 450, 450]
    assert(NsTime.windowStopNs(100L, 200L, 50L) == 250L)
    assert(NsTime.windowStopNs(200L, 200L, 50L) == 250L)
    assert(NsTime.windowStopNs(300L, 200L, 50L) == 450L)
    assert(NsTime.windowStopNs(400L, 200L, 50L) == 450L)
    // boundary: ts exactly on a stop bound belongs to the NEXT window
    assert(NsTime.windowStopNs(250L, 200L, 50L) == 450L)
    // negative timestamps (pre-epoch) use floor division
    assert(NsTime.windowStopNs(-100L, 200L, 50L) == 50L)
  }

  test("fixed windows: column expression matches scala impl") {
    import spark.implicits._
    val ts = Seq(100L, 200L, 250L, 300L, 400L, -100L).toDF("time")
    val got = ts.select(WindowBounds.windowBoundsNs(col("time"), 200L, 50L).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(250L, 250L, 450L, 450L, 450L, 50L))
  }

  test("fixed windows: non-round width at ns-epoch magnitude is exact") {
    import spark.implicits._
    // every = 3599999999999 ns (1h minus 1ns): IEEE double division would
    // mislabel ~9% of 2024-era timestamps (dividend > 2^53); integral
    // division must agree with Math.floorDiv for every one of them.
    val every = 3599999999999L
    val base = 1704067200000000000L // 2024-01-01T00:00:00Z in ns
    val tss = (0 until 2000).map(i => base + i.toLong * 7919L * 1000003L)
    val got = tss.toDF("time")
      .select(WindowBounds.windowBoundsNs(col("time"), every, 0L).as("b"))
      .as[Long].collect().toSeq
    val want = tss.map(t => NsTime.windowStopNs(t, every, 0L))
    assert(got == want)
    // invariant: ts is inside (stop - every, stop]
    got.zip(tss).foreach { case (b, t) =>
      assert(b > t && b - every <= t, s"ts=$t got stop=$b")
    }
  }

  test("month windows: calendar arithmetic") {
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).getEpochSecond * 1000000000L

    // every=1 month: anything in March -> April 1st
    assert(WindowBounds.monthWindowStop(ns("2021-03-15T12:00:00Z"), 1, 0) ==
      ns("2021-04-01T00:00:00Z"))
    // exactly on boundary belongs to the window starting there
    assert(WindowBounds.monthWindowStop(ns("2021-03-01T00:00:00Z"), 1, 0) ==
      ns("2021-04-01T00:00:00Z"))
    // every=3 months, no offset: Feb 2021 -> Apr 1 2021 (quarters from epoch)
    assert(WindowBounds.monthWindowStop(ns("2021-02-10T00:00:00Z"), 3, 0) ==
      ns("2021-04-01T00:00:00Z"))
    // offset=1 month shifts the grid
    assert(WindowBounds.monthWindowStop(ns("2021-02-10T00:00:00Z"), 3, 1) ==
      ns("2021-05-01T00:00:00Z"))
    // year windows across leap year
    assert(WindowBounds.monthWindowStop(ns("2020-02-29T23:59:59Z"), 12, 0) ==
      ns("2021-01-01T00:00:00Z"))
    // pre-epoch
    assert(WindowBounds.monthWindowStop(ns("1969-06-15T00:00:00Z"), 1, 0) ==
      ns("1969-07-01T00:00:00Z"))
  }

  test("month windows: catalyst expression evaluates and codegens") {
    import spark.implicits._
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).getEpochSecond * 1000000000L
    val df = Seq(ns("2021-03-15T12:00:00Z"), ns("2021-01-02T00:00:00Z"))
      .toDF("time")
    val got = df.select(WindowBounds.windowBoundsMonths(col("time"), 1, 0).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(ns("2021-04-01T00:00:00Z"), ns("2021-02-01T00:00:00Z")))
  }
}
