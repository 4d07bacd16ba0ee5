package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.InfluxQl
import graft.core.InfluxQl._
import graft.operators.InfluxQlPlanner

/** The 1.x `CREATE CONTINUOUS QUERY` statement bound Spark-first: where
  * the reference family re-RUNS the embedded SELECT on a timer, the
  * natural Spark twin is a Structured Streaming job — the same windowed
  * aggregation the batch planner builds, expressed as `window()` +
  * watermark over the measurement's append stream, emitting each bucket
  * exactly once when the watermark passes it (no re-computation, no
  * timer races on late data; the watermark IS the 1.x RESAMPLE lag).
  *
  * The caller routes the bound frame to its sink (`sel.into` names the
  * target measurement) with `writeStream` — sink choice and checkpoint
  * placement are deployment decisions this binder stays out of.
  */
object ContinuousQuery {

  final case class Bound(name: String, db: String, into: Option[String],
      frame: DataFrame, triggerMs: Option[Long] = None)

  /** Parses a CREATE CONTINUOUS QUERY (or a bare SELECT with GROUP BY
    * time) and binds it onto `stream` — a STREAMING DataFrame whose
    * `timeCol` is epoch ns.
    *
    * `RESAMPLE` maps onto Spark's model directly: `EVERY <d>` is the
    * 1.x re-run timer — surfaced as `Bound.triggerMs` for the caller's
    * `Trigger.ProcessingTime` — and `FOR <d>` is how far back each run
    * would recompute, i.e. how long a bucket stays open to late data:
    * the watermark delay becomes `FOR − bucket width` (floored at 0),
    * overriding the `lateArrival` default. Same answers, no timer
    * re-computation races. */
  def bind(stream: DataFrame, timeCol: String, tagCols: Seq[String],
      q: String, lateArrival: String = "0 seconds"): Bound =
    InfluxQl.parseStmt(q) match {
      case cq: CreateCq =>
        val late = cq.resampleForNs match {
          case Some(forNs) =>
            val widthNs = cq.sel.groupTime.map(_.everyNs).getOrElse(0L)
            s"${math.max(0L, forNs - widthNs) / 1000000L} milliseconds"
          case None => lateArrival
        }
        Bound(cq.name, cq.db, cq.sel.into,
          bindSelect(stream, timeCol, tagCols, cq.sel, late),
          cq.resampleEveryNs.map(_ / 1000000L))
      case sel: Select =>
        Bound("", "", sel.into,
          bindSelect(stream, timeCol, tagCols, sel, lateArrival))
      case other =>
        throw ParseError(s"not a continuous query: $other")
    }

  /** The streaming twin of the batch planner's time-grouped aggregate
    * mode: built-in `window()` buckets (width/offset from GROUP BY
    * time), watermark = allowed late arrival, one hash aggregate. Output
    * labels buckets by START bound in epoch ns, exactly like the batch
    * path, so downstream consumers cannot tell which engine produced a
    * row. */
  def bindSelect(stream: DataFrame, timeCol: String, tagCols: Seq[String],
      sel: Select, lateArrival: String): DataFrame = {
    val gt = sel.groupTime.getOrElse(
      throw ParseError("a continuous query needs GROUP BY time(...)"))
    require(gt.everyNs % 1000000L == 0 && gt.offsetNs % 1000000L == 0,
      "streaming windows need whole-millisecond widths/offsets " +
        "(window() granularity)")
    if (sel.fromSub.isDefined)
      throw ParseError("continuous queries read a measurement, not a subquery")

    // WHERE: tag/field predicates only — an endless stream has no
    // static time range (the window + watermark ARE its time bounds)
    val (lo, hi, rest) = sel.where
      .map(InfluxQlPlanner.splitTime)
      .getOrElse((None, None, None))
    if (lo.isDefined || hi.isDefined)
      throw ParseError("continuous queries cannot carry WHERE time " +
        "bounds — the GROUP BY time() window defines the time axis")
    var df = stream
    rest.foreach(e => df = df.filter(InfluxQlPlanner.toColumn(e)))

    val keyCols = if (sel.groupStar) tagCols else sel.groupTags
    keyCols.foreach { t =>
      if (!df.columns.contains(t))
        throw ParseError(s"unknown GROUP BY column '$t'")
    }

    val calls = sel.projs.collect { case (c: Call, a) => (c, a) }
    if (calls.isEmpty || !calls.forall(c => InfluxQlPlanner.isAggFn(c._1.fn)))
      throw ParseError("continuous queries support plain aggregates/" +
        "selectors (count sum mean min max spread stddev first last)")
    val names = InfluxQlPlanner.nameCalls(calls)
    val aggs = calls.zip(names).map { case ((c, _), name) =>
      InfluxQlPlanner.aggColumn(c.fn,
        InfluxQlPlanner.fieldArg(c, df), timeCol).as(name)
    }

    // ns -> µs timestamp via integer division (a double µs axis would
    // still be exact here, but integer `div` keeps it obviously so)
    val ts = expr(s"timestamp_micros($timeCol div 1000)")
    val win = window(col("__ts"), s"${gt.everyNs / 1000000} milliseconds",
      s"${gt.everyNs / 1000000} milliseconds",
      s"${gt.offsetNs / 1000000} milliseconds")
    df.withColumn("__ts", ts)
      .withWatermark("__ts", lateArrival)
      .groupBy(win.as("__w") +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((unix_micros(col("__w.start")) * 1000L).as("time") +:
        (keyCols.map(col) ++ names.map(col)): _*)
  }
}
