package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.{GoRegex, InfluxQl, NsTime}
import graft.core.InfluxQl._
import graft.functions.{InfluxAggregates => IA, Selectors, SeriesFunctions => SF}

/** A queryable InfluxQL measurement: the backing DataFrame, its epoch-ns
  * time column, and which columns are tags (everything else is a field). */
final case class InfluxMeasurement(df: DataFrame, timeCol: String,
    tagCols: Seq[String])

/** Plans a parsed InfluxQL SELECT onto the engine's operator layer —
  * the language front door over the same operators the storage RPCs use
  * (aggregates/selectors → one hash aggregate; window transforms →
  * the shared per-series Window; recursive smoothers → the documented
  * mapPartitions scan; fill() → [[GapFill]]). Nothing here executes its
  * own loop: the planner only COMPOSES operators, so every query inherits
  * their 100 TB postures (map-side partial aggregation, single shuffle
  * per series pipeline, grid-side-only gap explosion).
  *
  * Planning rules (the InfluxQL spec spellings, influxdata/influxql):
  *  - `WHERE` time bounds become scan-range filters (pushed to parquet);
  *    tag/field predicates convert to Catalyst columns; `=~`/`!~` regexes
  *    translate through [[GoRegex]] (Go/RE2 dialect).
  *  - Aggregates/selectors (`count sum mean min max spread stddev first
  *    last`) may be combined in one SELECT: one aggregate per group.
  *  - `median mode percentile top bottom integral` execute alone (they
  *    are whole-operator shapes, not single agg columns).
  *  - Window transforms (`difference derivative moving_average
  *    cumulative_sum elapsed non_negative_* chande_momentum_oscillator
  *    kaufmans_efficiency_ratio`) may be combined; the recursive
  *    smoothers (`exponential_moving_average kaufmans_adaptive_moving_
  *    average triple_exponential_derivative relative_strength_index
  *    double/triple_exponential_moving_average`) execute alone.
  *  - `GROUP BY time(every[,offset])` buckets label by START bound;
  *    `fill()` defaults to null (all buckets in the WHERE range appear)
  *    and requires explicit time bounds, like upstream.
  *  - Raw selects return `time` + requested columns ordered by time.
  */
object InfluxQlPlanner {

  private val aggFns = Set("count", "sum", "mean", "min", "max", "spread",
    "stddev", "first", "last")
  private val aloneFns = Set("median", "mode", "percentile", "top", "bottom",
    "integral", "sample", "distinct")
  private val windowFns = Set("difference", "non_negative_difference",
    "derivative", "non_negative_derivative", "cumulative_sum",
    "moving_average", "elapsed", "chande_momentum_oscillator",
    "kaufmans_efficiency_ratio")
  private val scanFns = Set("exponential_moving_average",
    "kaufmans_adaptive_moving_average", "triple_exponential_derivative",
    "relative_strength_index", "double_exponential_moving_average",
    "triple_exponential_moving_average")
  private val scalarFns = Set("abs", "ceil", "floor", "round", "sqrt",
    "exp", "ln", "log", "log2", "log10", "sin", "cos", "tan", "asin",
    "acos", "atan", "atan2", "pow")
  // the single-argument scalar functions — the ones that may also wrap
  // an aggregate expression (round(mean(v)); log/atan2/pow carry extra
  // arguments and stay per-row-only)
  private val scalar1Fns = scalarFns -- Set("log", "atan2", "pow")
  private val holtFns = Set("holt_winters", "holt_winters_with_fit")

  def run(measurements: Map[String, InfluxMeasurement], q: String,
      nowNs: Option[Long] = None): DataFrame =
    plan(measurements, InfluxQl.parse(q), nowNs)

  /** Statement entry point: SELECT plans through [[plan]]; the SHOW
    * schema-exploration forms map onto the metadata operators' semantics.
    * (`SHOW DATABASES` is a server-level statement — the HTTP facade
    * answers it from its database registry before planning.) */
  def runStmt(measurements: Map[String, InfluxMeasurement], q: String,
      nowNs: Option[Long] = None): DataFrame =
    InfluxQl.parseStmt(q) match {
      case sel: Select => plan(measurements, sel, nowNs)
      case sh: Show => showPlan(measurements, sh)
      case _: CreateCq => throw ParseError("CREATE CONTINUOUS QUERY binds " +
        "to a stream — use graft.streaming.ContinuousQuery")
      case _: Delete => throw ParseError("DELETE mutates a store — route " +
        "it through the HTTP facade")
    }

  /** SHOW MEASUREMENTS / TAG KEYS / TAG VALUES / FIELD KEYS.
    *
    * Tag keys follow the reference's tag_keys semantics: a tag column
    * lists only if it carries at least one non-null value — decided by
    * ONE aggregate row per measurement (the same one-row-collect shape as
    * the metadata RPC fast paths; never a per-tag scan). Tag values are
    * pure DataFrame distincts. Field keys come from the schema alone. */
  def showPlan(ms: Map[String, InfluxMeasurement], sh: Show): DataFrame = {
    if (ms.isEmpty) throw ParseError("no measurements to inspect")
    val spark = ms.values.head.df.sparkSession
    import spark.implicits._
    def targets: Seq[(String, InfluxMeasurement)] = sh.from match {
      case Some(f) => Seq(f -> ms.getOrElse(f,
        throw ParseError(s"unknown measurement '$f'")))
      case None => ms.toSeq.sortBy(_._1)
    }
    val out = sh.what match {
      case "measurements" =>
        // WITH MEASUREMENT filters: exact name rides sh.from, the regex
        // form (Go dialect) rides sh.withKeyRegex
        val names = ms.keys.toSeq.sorted
          .filter(n => sh.from.forall(_ == n))
          .filter(n => sh.withKeyRegex.forall(re =>
            java.util.regex.Pattern.compile(graft.core.GoRegex.toJava(re))
              .matcher(n).find()))
        names.toDF("name")
      case "databases" =>
        throw ParseError("SHOW DATABASES is a server-level statement")
      case "tag keys" =>
        // the reference's SchemaPivot shape (schema_pivot.rs): ONE
        // aggregate row per measurement (count per tag), melted to
        // (measurement, tagKey) rows inside the engine — a single job
        // over the union, no per-measurement driver round-trips
        val parts = targets.collect { case (name, m) if m.tagCols.nonEmpty =>
          m.df.agg(count(col(m.tagCols.head)).as(m.tagCols.head),
              m.tagCols.tail.map(t => count(col(t)).as(t)): _*)
            .select(explode(array(m.tagCols.sorted.map(t =>
              struct(lit(t).as("tagKey"), col(t).as("cnt"))): _*)).as("kv"))
            .select(lit(name).as("measurement"),
              col("kv.tagKey").as("tagKey"), col("kv.cnt").as("cnt"))
        }
        if (parts.isEmpty) Seq.empty[(String, String)].toDF("measurement", "tagKey")
        else parts.reduce(_ unionByName _).filter(col("cnt") > 0)
          .select("measurement", "tagKey").orderBy("measurement", "tagKey")
      case "tag values" =>
        // the 1.x key-selection forms resolve to a concrete key list:
        // = k, IN (k1, k2, …), or =~ /re/ over each target's tag keys
        def keysFor(m: InfluxMeasurement): Seq[String] = sh.withKeyRegex match {
          case Some(re) =>
            val p = java.util.regex.Pattern.compile(GoRegex.toJava(re))
            m.tagCols.filter(k => p.matcher(k).find()).sorted
          case None =>
            val wanted = if (sh.withKeys.nonEmpty) sh.withKeys
              else sh.withKey.toList
            wanted.filter(m.tagCols.contains)
        }
        val parts = targets.flatMap { case (name, m) =>
          keysFor(m).map { k =>
            m.df.filter(col(k).isNotNull)
              .select(lit(name).as("measurement"), lit(k).as("key"),
                col(k).cast("string").as("value"))
              .distinct()
          }
        }
        if (parts.isEmpty)
          throw ParseError("no selected tag key appears in any measurement")
        parts.reduce(_ unionByName _).orderBy("measurement", "key", "value")
      case "series" =>
        // the 1.x series-key spelling: "m,tag1=v1,tag2=v2" with tags
        // name-sorted and null tags omitted (concat_ws skips nulls);
        // distinct per measurement — the series set, not the row count
        val parts = targets.map { case (name, m) =>
          val tagParts = m.tagCols.sorted.map { t =>
            when(col(t).isNotNull,
              concat(lit(t + "="), col(t).cast("string")))
          }
          m.df.select(concat_ws(",",
            lit(name) +: tagParts: _*).as("key")).distinct()
        }
        parts.reduce(_ unionByName _).orderBy("key")
      case "retention policies" =>
        throw ParseError("SHOW RETENTION POLICIES is a server-level statement")
      // ---- 1.x CARDINALITY forms: the same plans reduced to counts ----
      case "measurement cardinality" =>
        Seq(ms.size.toLong).toDF("count")
      case "series cardinality" =>
        // exact distinct series keys per measurement (the 1.x exact form;
        // the estimated form maps to approx_count_distinct if ever needed)
        val parts = targets.map { case (name, m) =>
          val tagParts = m.tagCols.sorted.map { t =>
            when(col(t).isNotNull,
              concat(lit(t + "="), col(t).cast("string")))
          }
          m.df.select(concat_ws(",", lit(name) +: tagParts: _*).as("key"))
            .agg(count_distinct(col("key")).as("count"))
            .select(lit(name).as("measurement"), col("count"))
        }
        parts.reduce(_ unionByName _).orderBy("measurement")
      case "tag keys cardinality" =>
        showPlan(ms, sh.copy(what = "tag keys"))
          .groupBy("measurement")
          .agg(count(lit(1)).as("count"))
          .orderBy("measurement")
      case "tag values cardinality" =>
        showPlan(ms, sh.copy(what = "tag values"))
          .groupBy("measurement")
          .agg(count(lit(1)).as("count"))
          .orderBy("measurement")
      case "field keys cardinality" =>
        showPlan(ms, sh.copy(what = "field keys"))
          .groupBy("measurement")
          .agg(count(lit(1)).as("count"))
          .orderBy("measurement")
      case "field keys" =>
        targets.flatMap { case (name, m) =>
          m.df.schema.fields
            .filter(f => f.name != m.timeCol && !m.tagCols.contains(f.name))
            .map { f =>
              val t = f.dataType.typeName match {
                case "double" | "float" => "float"
                case "long" | "integer" | "short" | "byte" => "integer"
                case "string" => "string"
                case "boolean" => "boolean"
                case other => other
              }
              (name, f.name, t)
            }.sortBy(_._2)
        }.toDF("measurement", "fieldKey", "fieldType")
    }
    // 1.x LIMIT/OFFSET pagination on the (already-ordered) metadata frame
    val off = sh.offset.fold(out)(out.offset)
    sh.limit.fold(off)(off.limit)
  }

  /** Fold `now()` and timestamp±duration arithmetic in WHERE conditions
    * to literal epoch-ns (upstream evaluates ONE now() per statement
    * before planning; the transport supplies the clock). A statement
    * using now() without a clock rejects rather than silently reading
    * the wall clock — determinism is the caller's choice. */
  private[graft] def resolveNow(e: Expr, nowNs: Option[Long]): Expr = e match {
    case Call("now", Nil) => nowNs match {
      case Some(n) => IntLit(n)
      case None => throw ParseError(
        "now() needs a server clock; this entry point has none")
    }
    case Bin(op, l, r) if op == "+" || op == "-" =>
      (resolveNow(l, nowNs), resolveNow(r, nowNs)) match {
        case (IntLit(a), IntLit(b)) =>
          IntLit(if (op == "+") Math.addExact(a, b)
          else Math.subtractExact(a, b))
        case (IntLit(a), DurLit(b)) =>
          IntLit(if (op == "+") Math.addExact(a, b)
          else Math.subtractExact(a, b))
        case (DurLit(a), IntLit(b)) if op == "+" =>
          IntLit(Math.addExact(a, b))
        case (DurLit(a), DurLit(b)) =>
          DurLit(if (op == "+") Math.addExact(a, b)
          else Math.subtractExact(a, b))
        case (a, b) => Bin(op, a, b)
      }
    case Bin(op, l, r) => Bin(op, resolveNow(l, nowNs), resolveNow(r, nowNs))
    case other => other
  }

  /** [[resolveNow]] over a statement tree, subqueries included. */
  private def resolveNowSel(sel: Select, nowNs: Option[Long]): Select =
    sel.copy(
      where = sel.where.map(resolveNow(_, nowNs)),
      fromSub = sel.fromSub.map(resolveNowSel(_, nowNs)))

  def plan(ms: Map[String, InfluxMeasurement], sel0: Select,
      nowNs: Option[Long] = None): DataFrame = {
    val sel = resolveNowSel(sel0, nowNs)
    // FROM /re/ or FROM m1, m2, …: plan each matched measurement with the
    // single-measurement pipeline and union the labeled results — each
    // part keeps its own pagination/ordering semantics, and (per 1.x) a
    // measurement whose schema cannot satisfy the projection contributes
    // nothing rather than failing the statement. Regex results always
    // carry the `name` column, like the 1.x per-measurement series.
    val multiNames: Option[Seq[String]] = sel.fromRegex match {
      case Some(re) =>
        val p = java.util.regex.Pattern.compile(GoRegex.toJava(re))
        val hits = ms.keys.toSeq.sorted.filter(n => p.matcher(n).find())
        if (hits.isEmpty) throw ParseError(s"no measurement matches /$re/")
        Some(hits)
      case None if sel.fromMore.nonEmpty => Some(sel.from :: sel.fromMore)
      case None => None
    }
    multiNames match {
      case Some(names) =>
        val one = sel.copy(fromMore = Nil, fromRegex = None)
        val parts = names.flatMap { n =>
          ms.get(n).orElse(if (sel.fromRegex.isEmpty)
            throw ParseError(s"unknown measurement '$n'") else None)
            .flatMap { _ =>
              try Some(plan(ms, one.copy(from = n)).withColumn("name", lit(n)))
              catch { case _: ParseError => None } // schema mismatch: skip
            }
        }
        if (parts.isEmpty)
          throw ParseError("no matched measurement supports the projection")
        val out = parts.reduce(_.unionByName(_, allowMissingColumns = true))
        val rest = out.columns.filterNot(_ == "name").map(col).toSeq
        val ordered =
          if (out.columns.contains("time"))
            out.orderBy(col("name"), col("time"))
          else out.orderBy(col("name"))
        return ordered.select(col("name") +: rest: _*)
      case None => ()
    }
    val m = sel.fromSub match {
      case Some(inner) =>
        // FROM (subquery): the inner result IS the measurement. Its
        // series keys are the inner GROUP BY dimensions that survive into
        // the output; an aggregate inner select without time() grouping
        // has no time axis — it gets the 1.x epoch-0 convention so the
        // outer statement's time handling stays well-defined.
        val innerDf = plan(ms, inner)
        val tags = subTags(ms, inner).filter(innerDf.columns.contains)
        val withTime =
          if (innerDf.columns.contains("time")) innerDf
          else innerDf.withColumn("time", lit(0L))
        InfluxMeasurement(withTime, "time", tags)
      case None => ms.getOrElse(sel.from,
        throw ParseError(s"unknown measurement '${sel.from}'"))
    }
    val tcol = m.timeCol

    // WHERE → time range + residual predicate
    val (lo, hi, rest) = sel.where
      .map(splitTime)
      .getOrElse((None, None, None))
    var df = m.df
    lo.foreach(v => df = df.filter(col(tcol) >= v))
    hi.foreach(v => df = df.filter(col(tcol) < v))
    rest.foreach(e => df = df.filter(toColumn(e)))

    val keyCols: Seq[String] =
      if (sel.groupStar) m.tagCols
      else {
        sel.groupTags.foreach { t =>
          if (!df.columns.contains(t))
            throw ParseError(s"unknown GROUP BY column '$t'")
        }
        sel.groupTags
      }

    val calls = sel.projs.collect { case (c: Call, a) => (c, a) }
    val refs = sel.projs.collect { case (Ref(n), a) => (n, a) }
    val hasStar = sel.projs.exists(_._1 == Star)

    val result =
      if (sel.projs.exists(_._1.isInstanceOf[Bin]) ||
          // scalar-over-aggregate (round(mean(v))): the aggregate-
          // arithmetic path, unless plain aggregates handle it
          (calls.nonEmpty && sel.projs.forall(p => isAggArith(p._1)) &&
            sel.projs.exists(p => aggSubCalls(p._1).nonEmpty) &&
            !calls.forall(c => aggFns(c._1.fn) || isNestedAgg(c._1))))
        binSelect(df, m, sel, keyCols, lo, hi)
      else if (calls.isEmpty) rawSelect(df, m, sel, refs, hasStar, keyCols)
      else if (calls.forall(c => scalarFns(c._1.fn)) && !hasStar)
        scalarSelect(df, m, sel, keyCols)
      else if (refs.nonEmpty || hasStar)
        throw ParseError("mixing function calls and raw columns in one " +
          "SELECT is not supported")
      else if (calls.forall(c => aggFns(c._1.fn) || isNestedAgg(c._1)))
        aggSelect(df, m, sel, keyCols, calls, lo, hi)
      else if (calls.size == 1 && aloneFns(calls.head._1.fn))
        aloneSelect(df, m, sel, keyCols, calls.head._1, calls.head._2, lo, hi)
      else if (calls.forall(c => windowFns(c._1.fn)))
        transformSelect(df, m, sel, keyCols, calls)
      else if (calls.size == 1 && scanFns(calls.head._1.fn))
        scanSelect(df, m, sel, keyCols, calls.head._1, calls.head._2)
      else if (calls.size == 1 && holtFns(calls.head._1.fn))
        holtSelect(df, m, sel, keyCols, calls.head._1, calls.head._2, lo, hi)
      else
        throw ParseError("unsupported projection mix: " +
          calls.map(_._1.fn).mkString(", "))

    paginate(result, sel, keyCols)
  }

  /** The 1.x pagination rules: with GROUP BY dimensions, LIMIT/OFFSET
    * paginate POINTS PER SERIES (row_number over each tag set's time
    * order) and SLIMIT/SOFFSET page the SERIES themselves (the distinct
    * key list — small by definition — sorts, pages, and semi-joins back,
    * keeping the probe side streaming). Without dimensions they fall
    * back to plain global row pagination. */
  /** One aggregate column per 1.x aggregate/selector name (shared with
    * the streaming continuous-query binder — every one is a plain hash
    * aggregate with map-side partial aggregation, batch or streaming). */
  private[graft] def aggColumn(fn: String, field: String, tcol: String): Column =
    fn match {
      case "count" => count(col(field))
      case "count_distinct" => countDistinct(col(field))
      case "sum" => sum(col(field))
      case "mean" => avg(col(field))
      case "min" => min(col(field))
      case "max" => max(col(field))
      case "spread" => IA.spread(col(field))
      case "stddev" => IA.stddev(col(field))
      case "first" => Selectors.firstValue(col(field), col(tcol))
      case "last" => Selectors.lastValue(col(field), col(tcol))
      case other => throw ParseError(s"unsupported aggregate '$other'")
    }

  private[graft] def isAggFn(fn: String): Boolean = aggFns(fn)

  private def paginate(result: DataFrame, sel: Select,
      keyCols: Seq[String]): DataFrame = {
    val hasTime = result.columns.contains("time")
    val seriesScoped = keyCols.nonEmpty && hasTime
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    val afterSeries = (sel.slimit, sel.soffset) match {
      case (None, None) => result
      case (sl, so) =>
        if (keyCols.isEmpty)
          throw ParseError("SLIMIT/SOFFSET need GROUP BY dimensions")
        val keys = result.select(keyCols.map(col): _*).distinct()
          .orderBy(keyCols.map(col): _*)
        val paged = sl.fold(so.fold(keys)(keys.offset)) { n =>
          so.fold(keys)(keys.offset).limit(n)
        }
        // a using-columns join fronts the key columns; restore the
        // statement's output order
        result.join(broadcast(paged), keyCols, "left_semi")
          .select(result.columns.map(col): _*)
          .orderBy(keyCols.map(col) ++
            (if (hasTime) Seq(timeOrd) else Seq.empty): _*)
    }
    val paginated = (sel.limit, sel.offset) match {
      case (None, None) => afterSeries
      case (l, o) if seriesScoped =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(timeOrd)
        val lo = o.getOrElse(0)
        val hi = l.map(n => lo.toLong + n).getOrElse(Long.MaxValue)
        afterSeries.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") > lo && col("__rn") <= hi).drop("__rn")
      case (l, o) =>
        val off = o.fold(afterSeries)(afterSeries.offset)
        l.fold(off)(off.limit)
    }
    // the joins/windows above drop the modes' output ordering
    if (paginated eq result) result
    else if (seriesScoped || keyCols.nonEmpty)
      paginated.orderBy(keyCols.map(col) ++
        (if (hasTime) Seq(timeOrd) else Seq.empty): _*)
    else paginated
  }

  // ------------------------------------------------------------ raw mode
  private def rawSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      refs: List[(String, Option[String])], hasStar: Boolean,
      keyCols: Seq[String]): DataFrame = {
    val fields = m.df.columns.filterNot(c => c == m.timeCol)
    // GROUP BY dimensions surface as columns (they are the 1.x series
    // keys the facade splits on, and the per-series pagination axis)
    val dims = keyCols.filterNot(k => refs.exists(_._1 == k))
      .map(k => col(k))
    val picked: Seq[Column] =
      if (hasStar) fields.map(col).toSeq
      else dims ++ refs.map { case (n, a) =>
        if (!df.columns.contains(n)) throw ParseError(s"unknown column '$n'")
        col(n).as(a.getOrElse(n))
      }
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    df.select(col(m.timeCol).as("time") +: picked: _*)
      .orderBy(keyCols.map(col) :+ timeOrd: _*)
  }

  // -------------------------------------------------- scalar projections
  /** Per-row math over fields (`SELECT abs(value), field2 ...`): plain
    * codegen'd projections, mixable with raw column references. `ceil`
    * and `floor` cast back to double — the 1.x scalar functions return
    * floats. */
  private def scalarSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String]): DataFrame = {
    val names = nameCalls(sel.projs.collect { case (c: Call, a) => (c, a) })
    var ni = -1
    val picked = sel.projs.map {
      case (Ref(n), a) =>
        if (!df.columns.contains(n)) throw ParseError(s"unknown column '$n'")
        col(n).as(a.getOrElse(n))
      case (c: Call, _) =>
        ni += 1
        scalarCol(c, df).as(names(ni))
      case (e, _) => throw ParseError(s"bad scalar projection: $e")
    }
    val dims = keyCols.filterNot(k => sel.projs.exists {
      case (Ref(n), _) => n == k
      case _ => false
    }).map(col)
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    df.select((col(m.timeCol).as("time") +: dims) ++ picked: _*)
      .orderBy(keyCols.map(col) :+ timeOrd: _*)
  }

  // ------------------------------------------- arithmetic projections
  private val arithOps = Set("+", "-", "*", "/", "%")

  private def isScalarExpr(e: Expr): Boolean = e match {
    case Ref(_) | IntLit(_) | NumLit(_) => true
    // scalar CALLS are per-row only over bare field/literal arguments
    // (what scalarCol supports) — nested calls/arithmetic route to the
    // aggregate path
    case c: Call => scalarFns(c.fn) && c.args.forall {
      case _: Call | _: Bin => false
      case _ => true
    }
    case Bin(op, l, r) => arithOps(op) && isScalarExpr(l) && isScalarExpr(r)
    case _ => false
  }

  private def isAggArith(e: Expr): Boolean = e match {
    case c: Call if scalar1Fns(c.fn) && c.args.size == 1 =>
      isAggArith(c.args.head) // round(mean(v)) and friends
    case c: Call => aggFns(c.fn)
    case IntLit(_) | NumLit(_) => true
    case Bin(op, l, r) => arithOps(op) && isAggArith(l) && isAggArith(r)
    case _ => false
  }

  private def aggSubCalls(e: Expr): Seq[Call] = e match {
    case c: Call if scalar1Fns(c.fn) => c.args.flatMap(aggSubCalls)
    case c: Call => Seq(c)
    case Bin(_, l, r) => aggSubCalls(l) ++ aggSubCalls(r)
    case _ => Seq.empty
  }

  /** Apply a single-argument scalar function to an arbitrary column
    * (per-row or post-aggregate). */
  private def applyScalar1(fn: String, a: Column): Column = fn match {
    case "abs" => abs(a)
    case "ceil" => ceil(a).cast("double")
    case "floor" => floor(a).cast("double")
    case "round" => round(a, 0)
    case "sqrt" => sqrt(a)
    case "exp" => exp(a)
    case "ln" => log(a)
    case "log2" => log2(a)
    case "log10" => log10(a)
    case "sin" => sin(a)
    case "cos" => cos(a)
    case "tan" => tan(a)
    case "asin" => asin(a)
    case "acos" => acos(a)
    case "atan" => atan(a)
    case other => throw ParseError(s"$other() cannot wrap an aggregate")
  }

  private def arith(op: String, a: Column, b: Column): Column = op match {
    case "+" => a + b
    case "-" => a - b
    case "*" => a * b
    case "/" => a / b
    case "%" => a % b
    case other => throw ParseError(s"unsupported operator '$other'")
  }

  private def scalarColumn(e: Expr, df: DataFrame): Column = e match {
    case Ref(n) =>
      if (!df.columns.contains(n)) throw ParseError(s"unknown column '$n'")
      col(n)
    case IntLit(v) => lit(v)
    case NumLit(v) => lit(v)
    case c: Call => scalarCol(c, df)
    case Bin(op, l, r) if arithOps(op) =>
      arith(op, scalarColumn(l, df), scalarColumn(r, df))
    case other => throw ParseError(s"bad scalar expression: $other")
  }

  /** SELECTs containing binary arithmetic: either per-row (all leaves
    * raw fields / literals / scalar fns — `value * 2 + 1`) or
    * aggregate-level (all calls are 1.x aggregates — the
    * `sum(err) / count(value)` ratio idiom, with or without
    * GROUP BY time). Mixing the two levels is rejected like upstream. */
  private def binSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String], lo: Option[Long], hi: Option[Long]): DataFrame = {
    if (sel.projs.exists(_._1 == Star))
      throw ParseError("* cannot mix with arithmetic projections")
    sel.projs.foreach {
      case (_: Bin, None) =>
        throw ParseError("arithmetic projections need AS <name>")
      case _ => ()
    }
    def name(e: Expr, a: Option[String]): String = a.getOrElse(e match {
      case Ref(n) => n
      case c: Call => c.fn
      case _ => "expr"
    })
    if (sel.projs.forall(p => isScalarExpr(p._1))) {
      if (sel.groupTime.isDefined)
        throw ParseError("per-row arithmetic does not support GROUP BY time()")
      val picked = sel.projs.map { case (e, a) =>
        scalarColumn(e, df).as(name(e, a)) }
      val dims = keyCols.filterNot(k => sel.projs.exists {
        case (Ref(n), _) => n == k
        case _ => false
      }).map(col)
      val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
      df.select((col(m.timeCol).as("time") +: dims) ++ picked: _*)
        .orderBy(keyCols.map(col) :+ timeOrd: _*)
    } else if (sel.projs.forall(p =>
        isAggArith(p._1) && aggSubCalls(p._1).nonEmpty))
      aggArithSelect(df, m, sel, keyCols, lo, hi)
    else
      throw ParseError("arithmetic must be all per-row (fields/scalar " +
        "functions) or all over aggregates")
  }

  private def aggArithSelect(df: DataFrame, m: InfluxMeasurement,
      sel: Select, keyCols: Seq[String], lo: Option[Long],
      hi: Option[Long]): DataFrame = {
    val tcol = m.timeCol
    val subs = sel.projs.flatMap(p => aggSubCalls(p._1)).distinct
    val hidden = subs.zipWithIndex.map { case (c, i) => c -> s"__ag$i" }.toMap
    val aggs = subs.map { c =>
      val n = hidden(c)
      (c.fn, c.args.headOption) match {
        case ("count", Some(Call("distinct", List(Ref(f))))) =>
          countDistinct(col(f)).as(n)
        case _ => aggColumn(c.fn, fieldArg(c, df), tcol).as(n)
      }
    }
    def rewrite(e: Expr): Column = e match {
      case c: Call if scalar1Fns(c.fn) && c.args.size == 1 =>
        applyScalar1(c.fn, rewrite(c.args.head))
      case c: Call => col(hidden(c))
      case IntLit(v) => lit(v)
      case NumLit(v) => lit(v)
      case Bin(op, l, r) if arithOps(op) => arith(op, rewrite(l), rewrite(r))
      case other => throw ParseError(s"bad aggregate expression: $other")
    }
    // one name derivation for both the aliases and the by-name fill/
    // reprojection below; colliding derived names (two unaliased `abs(…)`
    // projections, 1.x allows them) disambiguate with _1/_2 suffixes so
    // the later col(name) references stay unambiguous
    val outNames = {
      val base = sel.projs.map { case (e, a) =>
        a.getOrElse(e match { case c: Call => c.fn; case _ => "expr" })
      }
      val seen = scala.collection.mutable.Map.empty[String, Int]
      base.map { n =>
        val k = seen.getOrElse(n, 0)
        seen(n) = k + 1
        if (k == 0) n else s"${n}_$k"
      }
    }
    val outCols = sel.projs.zip(outNames).map { case ((e, _), n) =>
      rewrite(e).as(n)
    }
    val keys = keyCols.map(col)
    sel.groupTime match {
      case None =>
        val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys: _*)
        ordered(g.agg(aggs.head, aggs.tail: _*)
          .select(keys ++ outCols: _*), keys)
      case Some(gt) =>
        val bucket = (NsTime.windowStopNs(toLocalNs(col(tcol), sel.tz),
          gt.everyNs, gt.offsetNs) - gt.everyNs).as("time")
        val grouped = df.groupBy(keys :+ bucket: _*).agg(aggs.head, aggs.tail: _*)
        // fill applies to the COMPUTED projections (1.x: an empty bucket
        // shows the fill value for the whole expression, not for each
        // hidden sub-aggregate), so evaluate the arithmetic first and
        // run the grid over the output columns — same local-ns grid +
        // UTC relabel discipline as the transform-over-aggregate path
        val computed = grouped.select((col("time") +: keys) ++ outCols: _*)
        val filled = fillStrategy(sel.fill, lo, hi) match {
          case None => computed
          case Some(strat) =>
            val (l, h) = (toLocalNs(lo.get, sel.tz), toLocalNs(hi.get, sel.tz))
            val start = NsTime.windowStopNs(l, gt.everyNs, gt.offsetNs) -
              gt.everyNs
            GapFill.onGrid(computed, keyCols, "time", start, h, gt.everyNs,
              outNames.map(_ -> strat).toMap)
        }
        val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
        filled.select((toUtcNs(col("time"), sel.tz).as("time") +: keys)
            ++ outNames.map(col): _*)
          .orderBy(keys :+ timeOrd: _*)
    }
  }

  // ------------------------------------------------------------- tz()
  /** `TZ('<zone>')` support: with a zone, `GROUP BY time()` buckets align
    * to LOCAL wall time (each instant shifted by its own zone offset, so
    * DST is honored), the fill grid enumerates in local ns — where the
    * bucket step genuinely is fixed-width — and the emitted `time` label
    * converts back to the UTC instant of the local bucket start, exactly
    * the 1.x behavior. Without a zone all three helpers are the
    * identity. Conversions ride Spark's µs timestamp functions (the
    * engine's ns columns are µs-truncated by discipline). */
  private def toLocalNs(t: Column, tz: Option[String]): Column = tz match {
    case None => t
    case Some(z) =>
      NsTime.timestampToNs(from_utc_timestamp(NsTime.nsToTimestamp(t), z))
  }

  private def toUtcNs(t: Column, tz: Option[String]): Column = tz match {
    case None => t
    case Some(z) =>
      NsTime.timestampToNs(to_utc_timestamp(NsTime.nsToTimestamp(t), z))
  }

  /** Scala-side twin of [[toLocalNs]] for the driver-computed grid bounds. */
  private def toLocalNs(ns: Long, tz: Option[String]): Long = tz match {
    case None => ns
    case Some(z) =>
      val inst = java.time.Instant.ofEpochSecond(
        Math.floorDiv(ns, 1000000000L), Math.floorMod(ns, 1000000000L))
      ns + java.time.ZoneId.of(z).getRules.getOffset(inst)
        .getTotalSeconds.toLong * 1000000000L
  }

  private def scalarCol(c: Call, df: DataFrame): Column = {
    val f = col(fieldArg(c, df))
    c.fn match {
      case "abs" => abs(f)
      case "ceil" => ceil(f).cast("double")
      case "floor" => floor(f).cast("double")
      case "round" => round(f, 0)
      case "sqrt" => sqrt(f)
      case "exp" => exp(f)
      case "ln" => log(f)
      case "log" => // InfluxQL log(field, base); Spark spells log(base, col)
        log(numArg(c, 1, "log(field, base)"), f)
      case "log2" => log2(f)
      case "log10" => log10(f)
      case "sin" => sin(f)
      case "cos" => cos(f)
      case "tan" => tan(f)
      case "asin" => asin(f)
      case "acos" => acos(f)
      case "atan" => atan(f)
      case "atan2" => c.args.lift(1) match {
        case Some(Ref(o)) if df.columns.contains(o) => atan2(f, col(o))
        case Some(IntLit(v)) => atan2(f, lit(v.toDouble))
        case Some(NumLit(v)) => atan2(f, lit(v))
        case _ => throw ParseError("atan2(field, field-or-number)")
      }
      case "pow" => pow(f, numArg(c, 1, "pow(field, exponent)"))
    }
  }

  // ------------------------------------------------- aggregate/selector
  /** A window transform wrapped around an aggregate — the InfluxQL
    * downsample-then-transform idiom `derivative(mean(value), 1h)` with
    * `GROUP BY time(...)`. */
  private def isNestedAgg(c: Call): Boolean =
    Set("difference", "non_negative_difference", "derivative",
      "non_negative_derivative", "cumulative_sum", "moving_average")(c.fn) &&
      (c.args.headOption match {
        case Some(inner: Call) => aggFns(inner.fn)
        case _ => false
      })

  private def aggSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String], calls: List[(Call, Option[String])],
      lo: Option[Long], hi: Option[Long]): DataFrame = {
    val tcol = m.timeCol
    val names = nameCalls(calls)
    // per projection: (agg column, its column name, output name, outer
    // transform call if this is the nested downsample-then-transform form)
    val entries = calls.zip(names).map { case ((c, _), name) =>
      val (aggC, field, outer) =
        if (isNestedAgg(c)) {
          val inner = c.args.head.asInstanceOf[Call]
          (inner, fieldArg(inner, df), Some(c))
        } else (c, c.args.headOption, c.fn) match {
          // COUNT(DISTINCT(field)) — the 1.x cardinality aggregate
          case (_, Some(Call("distinct", List(Ref(n)))), "count") =>
            (Call("count_distinct", List(Ref(n))), n, None)
          case _ => (c, fieldArg(c, df), None)
        }
      val aggName = if (outer.isDefined) s"__in_$name" else name
      (aggColumn(aggC.fn, field, tcol).as(aggName), aggName, name, outer)
    }
    val aggs = entries.map(_._1)
    val keys = keyCols.map(col)
    sel.groupTime match {
      case None =>
        if (entries.exists(_._4.isDefined))
          throw ParseError("a transform over an aggregate requires " +
            "GROUP BY time(...)")
        val g = if (keys.isEmpty) df.groupBy() else df.groupBy(keys: _*)
        ordered(g.agg(aggs.head, aggs.tail: _*), keys)
      case Some(gt) =>
        val bucket =
          (NsTime.windowStopNs(toLocalNs(col(tcol), sel.tz), gt.everyNs,
            gt.offsetNs) - gt.everyNs).as("time")
        val grouped = df.groupBy(keys :+ bucket: _*).agg(aggs.head, aggs.tail: _*)
        // fill the GRID first, then transform over the filled series —
        // the upstream order: fill() supplies the buckets the transform
        // then differences/averages over. Under tz() the grid lives in
        // local ns, where the step truly is fixed-width.
        val filled = fillStrategy(sel.fill, lo, hi) match {
          case None => grouped
          case Some(strat) =>
            val (l, h) = (toLocalNs(lo.get, sel.tz), toLocalNs(hi.get, sel.tz))
            val start = NsTime.windowStopNs(l, gt.everyNs, gt.offsetNs) -
              gt.everyNs
            GapFill.onGrid(grouped, keyCols, "time", start, h, gt.everyNs,
              entries.map(_._2 -> strat).toMap)
        }
        // transforms run on the (small) bucketed frame; keyless grouping
        // gets a constant series key — rows ∝ buckets, so the single
        // task the series functions guard against cannot occur here
        val (kdf0, tKeys) =
          if (keyCols.isEmpty) (filled.withColumn("__gk", lit(1)), Seq("__gk"))
          else (filled, keyCols)
        var outDf = kdf0
        entries.foreach {
          case (_, aggName, name, Some(c)) =>
            outDf = c.fn match {
              case "difference" =>
                SF.difference(outDf, tKeys, "time", aggName, name)
              case "non_negative_difference" =>
                SF.nonNegativeDifference(outDf, tKeys, "time", aggName, name)
              case "derivative" =>
                // with GROUP BY time the default rate unit is the interval
                SF.derivative(outDf, tKeys, "time", aggName,
                  durOr(c, 1, gt.everyNs), name)
              case "non_negative_derivative" =>
                SF.nonNegativeDerivative(outDf, tKeys, "time", aggName,
                  durOr(c, 1, gt.everyNs), name)
              case "cumulative_sum" =>
                SF.cumulativeSum(outDf, tKeys, "time", aggName, name)
              case "moving_average" =>
                SF.movingAverage(outDf, tKeys, "time", aggName,
                  numArg(c, 1, "moving_average(agg, n)").toInt, name)
            }
          case _ => ()
        }
        val hidden = entries.collect { case (_, a, _, Some(_)) => a } ++
          (if (keyCols.isEmpty && entries.exists(_._4.isDefined)) Seq("__gk")
           else Seq.empty)
        val dropped = outDf.drop(hidden: _*)
        // a pure transform select omits its all-null warm-up buckets,
        // like the raw-series transforms; mixed selects keep every bucket
        val pruned =
          if (entries.forall(_._4.isDefined))
            dropped.filter(names.map(col(_).isNotNull).reduce(_ || _))
          else dropped
        val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
        pruned.select((toUtcNs(col("time"), sel.tz).as("time") +: keys)
            ++ names.map(col): _*)
          .orderBy(keys :+ timeOrd: _*)
    }
  }

  /** InfluxQL's default fill for time-grouped aggregates is null (every
    * bucket in the range appears); fill is only possible with explicit
    * bounds — an unbounded range has no grid to enumerate. */
  private def fillStrategy(fill: Fill, lo: Option[Long],
      hi: Option[Long]): Option[GapFill.Strategy] = fill match {
    case FillNone => None
    // the default fill(null) degrades to observed-buckets-only when the
    // range is unbounded (no grid to enumerate); an EXPLICIT carry/value
    // fill without bounds is a user error and says so
    case FillNull if lo.isEmpty || hi.isEmpty => None
    case _ if lo.isEmpty || hi.isEmpty =>
      throw ParseError("fill() needs explicit time bounds in WHERE " +
        "(both a lower and an upper time condition)")
    case FillNull => Some(GapFill.KeepNull)
    case FillPrevious => Some(GapFill.Previous)
    case FillLinear => Some(GapFill.Linear)
    case FillValue(v) => Some(GapFill.Value(lit(v)))
  }

  // ------------------------------------------- single-operator aggregates
  private def aloneSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String], c: Call, alias: Option[String],
      lo: Option[Long] = None, hi: Option[Long] = None): DataFrame = {
    if (sel.groupTime.isDefined) {
      if (Set("median", "mode", "percentile")(c.fn))
        return aloneBucketed(df, m, sel, keyCols, c, alias, lo, hi)
      if (Set("top", "bottom", "distinct")(c.fn))
        return aloneBucketedPoints(df, m, sel, keyCols, c, alias)
      throw ParseError(s"${c.fn}() does not support GROUP BY time()")
    }
    val tcol = m.timeCol
    val name = alias.getOrElse(c.fn)
    val f = fieldArg(c, df)
    val keys = keyCols.map(col)
    c.fn match {
      case "median" => ordered(IA.median(df, keyCols, f, name), keys)
      case "mode" => ordered(IA.mode(df, keyCols, f, name), keys)
      case "percentile" =>
        ordered(IA.percentile(df, keyCols, f,
          numArg(c, 1, "percentile(field, p)"), name), keys)
      case "integral" =>
        val unit = c.args.lift(1) match {
          case Some(DurLit(ns)) => ns
          case None => 1000000000L
          case _ => throw ParseError("integral unit must be a duration")
        }
        ordered(IA.integral(df, keyCols, tcol, f, unit, name), keys)
      case "top" | "bottom" =>
        val bottom = c.fn == "bottom"
        // 1.x grammar: TOP(field, n) — the n extreme points — or
        // TOP(field, tag_key, n) — the n tag VALUES whose best point
        // ranks highest, one (best) point each, tag emitted as a column
        val tagArgs = c.args.drop(1).dropRight(1)
        if (tagArgs.isEmpty) {
          val n = numArg(c, 1, s"${c.fn}(field, n)").toInt
          IA.topN(df, keyCols, tcol, f, n, bottom)
            .select((col(tcol).as("time") +: keys) :+ col(f).as(name): _*)
            .orderBy(keys :+ col("time").asc: _*)
        } else {
          val tagKey = tagArgs match {
            case List(Ref(t)) =>
              if (!df.columns.contains(t))
                throw ParseError(s"unknown tag '$t' in ${c.fn}()")
              t
            case _ =>
              throw ParseError(s"${c.fn}(field, tag_key, n) takes one tag key")
          }
          val n = numArg(c, c.args.length - 1,
            s"${c.fn}(field, tag_key, n)").toInt
          if (n < 1) throw ParseError(s"${c.fn}(field, tag_key, n) needs n >= 1")
          // best point per tag value first (extreme value, earlier time on
          // ties), THEN rank tag values by their best point: the second
          // window runs over a tag-cardinality-sized frame, never raw rows
          val best = IA.topN(df, keyCols :+ tagKey, tcol, f, 1, bottom)
          val ord = (if (bottom) col(f).asc else col(f).desc) +:
            Seq(col(tcol).asc, col(tagKey).asc)
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(keys: _*).orderBy(ord: _*)
          best.withColumn("__rk", row_number().over(w))
            .filter(col("__rk") <= n)
            .select((col(tcol).as("time") +: keys) :+ col(tagKey) :+
              col(f).as(name): _*)
            .orderBy(keys :+ col("time").asc: _*)
        }
      case "distinct" =>
        // InfluxQL DISTINCT(field): the distinct field values per series
        ordered(df.filter(col(f).isNotNull)
          .select(keys :+ col(f).as(name): _*).distinct(),
          keys :+ col(name))
      case "sample" =>
        // upstream SAMPLE draws by reservoir RNG; this engine draws the
        // same SIZE-n subset by content hash — deterministic across runs,
        // partitionings, and engines (the same stand-in discipline as
        // the deterministic samplers in graft.pipeline.Sampling)
        val n = numArg(c, 1, "sample(field, n)").toInt
        if (n < 1) throw ParseError("sample(field, n) needs n >= 1")
        val hcol = graft.functions.TextFunctions.hash60(concat_ws(",",
          keyCols.map(col(_).cast("string")) :+ col(tcol).cast("string"): _*))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys: _*).orderBy(hcol.asc, col(tcol).asc)
        df.filter(col(f).isNotNull)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= n)
          .select((col(tcol).as("time") +: keys) :+ col(f).as(name): _*)
          .orderBy(keys :+ col("time").asc: _*)
    }
  }

  /** median/mode/percentile under `GROUP BY time(...)`: the exact
    * whole-operator aggregates run per (series, bucket), then fill()
    * applies on the bucket grid exactly as for ordinary aggregates —
    * upstream supports fill() here, and a percentile whose rank falls
    * out of range leaves its bucket to the fill strategy. */
  private def aloneBucketed(df: DataFrame, m: InfluxMeasurement,
      sel: Select, keyCols: Seq[String], c: Call, alias: Option[String],
      lo: Option[Long], hi: Option[Long]): DataFrame = {
    val tcol = m.timeCol
    val gt = sel.groupTime.get
    val name = alias.getOrElse(c.fn)
    val f = fieldArg(c, df)
    val keys = keyCols.map(col)
    val bucketed = df.withColumn("time",
      NsTime.windowStopNs(toLocalNs(col(tcol), sel.tz), gt.everyNs,
        gt.offsetNs) - gt.everyNs)
    val bKeys = keyCols :+ "time"
    val agg = c.fn match {
      case "median" => IA.median(bucketed, bKeys, f, name)
      case "mode" => IA.mode(bucketed, bKeys, f, name)
      case "percentile" => IA.percentile(bucketed, bKeys, f,
        numArg(c, 1, "percentile(field, p)"), name)
    }
    val filled = fillStrategy(sel.fill, lo, hi) match {
      case None => agg
      case Some(strat) =>
        val (l, h) = (toLocalNs(lo.get, sel.tz), toLocalNs(hi.get, sel.tz))
        val start = NsTime.windowStopNs(l, gt.everyNs, gt.offsetNs) -
          gt.everyNs
        GapFill.onGrid(agg, keyCols, "time", start, h, gt.everyNs,
          Map(name -> strat))
    }
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    filled.select((toUtcNs(col("time"), sel.tz).as("time") +: keys) :+
        col(name): _*)
      .orderBy(keys :+ timeOrd: _*)
  }

  /** top/bottom/distinct under `GROUP BY time(...)`: per-bucket point
    * selection — TOP/BOTTOM keep the selected points' own timestamps
    * (the 1.x shape), DISTINCT labels rows with the bucket start.
    * fill() does not apply to point selections, like upstream. */
  private def aloneBucketedPoints(df: DataFrame, m: InfluxMeasurement,
      sel: Select, keyCols: Seq[String], c: Call,
      alias: Option[String]): DataFrame = {
    val tcol = m.timeCol
    val gt = sel.groupTime.get
    if (sel.fill != FillNull && sel.fill != FillNone)
      throw ParseError(s"fill() does not apply to ${c.fn}() selections")
    val name = alias.getOrElse(c.fn)
    val f = fieldArg(c, df)
    val keys = keyCols.map(col)
    val bucketed = df.withColumn("__bk",
      NsTime.windowStopNs(toLocalNs(col(tcol), sel.tz), gt.everyNs,
        gt.offsetNs) - gt.everyNs)
    val bKeys = keyCols :+ "__bk"
    c.fn match {
      case "top" | "bottom" =>
        if (c.args.size > 2)
          throw ParseError(
            s"${c.fn}(field, tag, n) does not support GROUP BY time()")
        val n = numArg(c, 1, s"${c.fn}(field, n)").toInt
        IA.topN(bucketed, bKeys, tcol, f, n, c.fn == "bottom")
          .select((col(tcol).as("time") +: keys) :+ col(f).as(name): _*)
          .orderBy(keys :+ col("time").asc: _*)
      case "distinct" =>
        bucketed.filter(col(f).isNotNull)
          .select((col("__bk").as("__t") +: keys) :+ col(f).as(name): _*)
          .distinct()
          .select((toUtcNs(col("__t"), sel.tz).as("time") +: keys) :+
            col(name): _*)
          .orderBy(keys ++ Seq(col("time").asc, col(name).asc): _*)
    }
  }

  // ------------------------------------------------- window transforms
  private def transformSelect(df: DataFrame, m: InfluxMeasurement,
      sel: Select, keyCols: Seq[String],
      calls: List[(Call, Option[String])]): DataFrame = {
    val tcol = m.timeCol
    val keys = seriesKeys(m, keyCols)
    val names = nameCalls(calls)
    var out = df
    calls.zip(names).foreach { case ((c, _), name) =>
      val f = fieldArg(c, out)
      out = c.fn match {
        case "difference" => SF.difference(out, keys, tcol, f, name)
        case "non_negative_difference" =>
          SF.nonNegativeDifference(out, keys, tcol, f, name)
        case "derivative" =>
          SF.derivative(out, keys, tcol, f, durOr(c, 1, 1000000000L), name)
        case "non_negative_derivative" =>
          SF.nonNegativeDerivative(out, keys, tcol, f, durOr(c, 1, 1000000000L), name)
        case "cumulative_sum" => SF.cumulativeSum(out, keys, tcol, f, name)
        case "moving_average" =>
          SF.movingAverage(out, keys, tcol, f, numArg(c, 1, "moving_average(field, n)").toInt, name)
        case "elapsed" =>
          val e = SF.elapsed(out, keys, tcol, name)
          c.args.lift(1) match {
            case Some(DurLit(ns)) => e.withColumn(name, expr(s"`$name` div $ns"))
            case None => e
            case _ => throw ParseError("elapsed unit must be a duration")
          }
        case "chande_momentum_oscillator" =>
          SF.chandeMomentumOscillator(out, keys, tcol, f,
            numArg(c, 1, "chande_momentum_oscillator(field, n)").toInt, name)
        case "kaufmans_efficiency_ratio" =>
          SF.kaufmanEfficiencyRatio(out, keys, tcol, f,
            numArg(c, 1, "kaufmans_efficiency_ratio(field, n)").toInt, name)
      }
    }
    finishSeries(out, sel, keys, tcol, names)
  }

  // -------------------------------------------- recursive (scan) smoothers
  private def scanSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String], c: Call, alias: Option[String]): DataFrame = {
    val tcol = m.timeCol
    val keys = seriesKeys(m, keyCols)
    val name = alias.getOrElse(c.fn)
    val f = fieldArg(c, df)
    val n = numArg(c, 1, s"${c.fn}(field, n)").toInt
    val alpha = 2.0 / (n + 1)
    val out = c.fn match {
      case "exponential_moving_average" =>
        SF.exponentialMovingAverage(df, keys, tcol, f, alpha, name)
      case "kaufmans_adaptive_moving_average" =>
        SF.kaufmanAdaptiveMovingAverage(df, keys, tcol, f, n, name)
      case "triple_exponential_derivative" =>
        SF.tripleExponentialDerivative(df, keys, tcol, f, n, name)
      case "relative_strength_index" =>
        SF.relativeStrengthIndex(df, keys, tcol, f, n, name)
      case "double_exponential_moving_average" =>
        SF.demaTema(df, keys, tcol, f, alpha, name, "__tema").drop("__tema")
      case "triple_exponential_moving_average" =>
        SF.demaTema(df, keys, tcol, f, alpha, "__dema", name).drop("__dema")
    }
    finishSeries(out, sel, keys, tcol, Seq(name))
  }

  // ------------------------------------------------------- holt_winters
  /** `HOLT_WINTERS(agg(field), N, S)` / `HOLT_WINTERS_WITH_FIT(…)` — the
    * 1.x downsample-then-forecast form: the aggregate buckets by
    * `GROUP BY time(...)`, a Holt linear-trend recursion runs over the
    * buckets, and N points extrapolate past each series' end at the
    * bucket interval. Upstream fits α/β (and a seasonal component when
    * S > 0) by Nelder–Mead — a nondeterministic optimizer; this engine
    * implements the deterministic seasonless core (S must be 0) with
    * explicit smoothing constants via optional args 4/5 (defaults
    * α = 0.5, β = 0.25). `WITH_FIT` unions the in-sample one-step fits
    * with the forecast rows, like upstream. */
  private def holtSelect(df: DataFrame, m: InfluxMeasurement, sel: Select,
      keyCols: Seq[String], c: Call, alias: Option[String],
      lo: Option[Long], hi: Option[Long]): DataFrame = {
    val gt = sel.groupTime.getOrElse(
      throw ParseError(s"${c.fn}() requires GROUP BY time(...)"))
    val inner = c.args.headOption match {
      case Some(in: Call) if aggFns(in.fn) => in
      case _ => throw ParseError(s"${c.fn}() expects an aggregate " +
        "argument, e.g. holt_winters(mean(value), 10, 0)")
    }
    val n = numArg(c, 1, s"${c.fn}(agg, N, S)").toInt
    if (n < 1) throw ParseError(s"${c.fn}() forecast count must be >= 1")
    val season = numArg(c, 2, s"${c.fn}(agg, N, S)").toInt
    if (season < 0) throw ParseError(s"${c.fn}() seasonal period must be >= 0")
    if (season == 1)
      throw ParseError("a seasonal period of 1 bucket has no seasonality; " +
        "pass S = 0 for the linear-trend form or S >= 2")
    def optNum(i: Int, dflt: Double): Double = c.args.lift(i) match {
      case Some(IntLit(v)) => v.toDouble
      case Some(NumLit(v)) => v
      case None => dflt
      case _ => throw ParseError(s"${c.fn}() argument $i must be numeric")
    }
    val alpha = optNum(3, 0.5)
    val beta = optNum(4, 0.25)
    val gamma = optNum(5, 0.25)
    val tcol = m.timeCol
    val name = alias.getOrElse(c.fn)
    val keys = keyCols.map(col)
    val bucket = (NsTime.windowStopNs(toLocalNs(col(tcol), sel.tz),
      gt.everyNs, gt.offsetNs) - gt.everyNs).as("time")
    val grouped = df.groupBy(keys :+ bucket: _*)
      .agg(aggColumn(inner.fn, fieldArg(inner, df), tcol).as("__hw"))
    val filled = fillStrategy(sel.fill, lo, hi) match {
      case None => grouped
      case Some(strat) =>
        val l = toLocalNs(lo.get, sel.tz)
        val start = NsTime.windowStopNs(l, gt.everyNs, gt.offsetNs) -
          gt.everyNs
        GapFill.onGrid(grouped, keyCols, "time", start,
          toLocalNs(hi.get, sel.tz), gt.everyNs, Map("__hw" -> strat))
    }
    // keyless grouping gets a constant series key like the nested
    // transforms — rows ∝ buckets, so no single-task trap
    val (kdf, tKeys) =
      if (keyCols.isEmpty) (filled.withColumn("__gk", lit(1)), Seq("__gk"))
      else (filled, keyCols)
    val out =
      if (season >= 2) {
        // deterministic seasonal form (SeriesFunctions.holtSeasonal docs
        // the contract vs the reference's per-call Nelder-Mead fit)
        val (fit, fc) = SF.holtSeasonal(kdf, tKeys, "time", "__hw",
          alpha, beta, gamma, n, season, gt.everyNs, name)
        if (c.fn == "holt_winters_with_fit")
          fit.select(tKeys.map(col) ++ Seq(col("time"), col(name)): _*)
            .unionByName(fc.select(tKeys.map(col) ++
              Seq(col("time"), col(name)): _*))
        else fc
      } else {
        val fc = SF.holtForecast(kdf, tKeys, "time", "__hw", alpha, beta, n,
          gt.everyNs, name)
        if (c.fn == "holt_winters_with_fit") {
          val fit = SF.holtLinear(kdf, tKeys, "time", "__hw", alpha, beta, name)
            .filter(col(name).isNotNull)
            .select(tKeys.map(col) ++ Seq(col("time"), col(name)): _*)
          fit.unionByName(fc.select(tKeys.map(col) ++
            Seq(col("time"), col(name)): _*))
        } else fc
      }
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    out.select((toUtcNs(col("time"), sel.tz).as("time") +: keyCols.map(col))
        :+ col(name): _*)
      .orderBy(keyCols.map(col) :+ timeOrd: _*)
  }

  /** Shared transform epilogue: InfluxQL omits points where every output
    * is null (warm-up rows), renames the time column, and orders per
    * series then time. */
  private def finishSeries(out: DataFrame, sel: Select, keys: Seq[String],
      tcol: String, names: Seq[String]): DataFrame = {
    val keep = names.map(col(_).isNotNull).reduce(_ || _)
    val timeOrd = if (sel.timeDesc) col("time").desc else col("time").asc
    out.filter(keep)
      .select((col(tcol).as("time") +: keys.map(col)) ++ names.map(col): _*)
      .orderBy(keys.map(col) :+ timeOrd: _*)
  }

  private def ordered(df: DataFrame, keys: Seq[Column]): DataFrame =
    if (keys.isEmpty) df else df.orderBy(keys: _*)

  /** The tag columns a subquery's output carries: its GROUP BY
    * dimensions (resolving `*` against the measurement it reads, through
    * further nesting). */
  private def subTags(ms: Map[String, InfluxMeasurement], sel: Select): Seq[String] =
    if (sel.groupStar) sel.fromSub match {
      case Some(inner) => subTags(ms, inner)
      case None => ms.get(sel.from).map(_.tagCols).getOrElse(Nil)
    }
    else sel.groupTags

  private def seriesKeys(m: InfluxMeasurement, keyCols: Seq[String]): Seq[String] = {
    val keys = if (keyCols.isEmpty) m.tagCols else keyCols
    if (keys.isEmpty)
      throw ParseError("series transforms need a GROUP BY key or tag " +
        "columns (a keyless series scan is a single task)")
    keys
  }

  // --------------------------------------------------------- arguments
  private[graft] def fieldArg(c: Call, df: DataFrame): String = c.args.headOption match {
    case Some(Ref(n)) =>
      if (!df.columns.contains(n))
        throw ParseError(s"unknown field '$n' in ${c.fn}()")
      n
    case Some(nested: Call) =>
      throw ParseError(s"nested call ${nested.fn}() inside ${c.fn}() " +
        "is not supported")
    case _ => throw ParseError(s"${c.fn}() expects a field argument")
  }

  private def numArg(c: Call, i: Int, sig: String): Double = c.args.lift(i) match {
    case Some(IntLit(v)) => v.toDouble
    case Some(NumLit(v)) => v
    case _ => throw ParseError(s"$sig expects a numeric argument $i")
  }

  private def durOr(c: Call, i: Int, default: Long): Long = c.args.lift(i) match {
    case Some(DurLit(ns)) => ns
    case None => default
    case _ => throw ParseError(s"${c.fn}() argument $i must be a duration")
  }

  /** Default result column names follow InfluxQL: the function name, with
    * `_1`, `_2`… suffixes on repeats; AS aliases override. */
  private[graft] def nameCalls(calls: List[(Call, Option[String])]): List[String] = {
    val used = scala.collection.mutable.Set.empty[String]
    calls.map { case (c, alias) =>
      val base = alias.getOrElse(c.fn)
      var name = base
      var i = 0
      while (used(name)) { i += 1; name = s"${base}_$i" }
      used += name
      name
    }
  }

  // ------------------------------------------------------ WHERE handling
  /** Splits a WHERE tree into (inclusive lo, exclusive hi, residual).
    * Time conditions must sit on the AND spine — `time` inside OR has no
    * single-range meaning and is rejected (upstream rejects it too). */
  private[graft] def splitTime(e: Expr): (Option[Long], Option[Long], Option[Expr]) =
    e match {
      case Bin("and", l, r) =>
        val (l1, h1, r1) = splitTime(l)
        val (l2, h2, r2) = splitTime(r)
        val lo = (l1.toSeq ++ l2.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
        val hi = (h1.toSeq ++ h2.toSeq).reduceOption((a: Long, b: Long) => math.min(a, b))
        val rest = (r1, r2) match {
          case (Some(a), Some(b)) => Some(Bin("and", a, b))
          case (a, b) => a.orElse(b)
        }
        (lo, hi, rest)
      case Bin(op, Ref(t), v) if t.equalsIgnoreCase("time") =>
        timeBound(op, tsNs(v))
      case Bin(op, v, Ref(t)) if t.equalsIgnoreCase("time") =>
        timeBound(flip(op), tsNs(v))
      case other =>
        if (mentionsTime(other))
          throw ParseError("time conditions must be top-level AND terms")
        (None, None, Some(other))
    }

  private def timeBound(op: String, v: Long): (Option[Long], Option[Long], Option[Expr]) =
    op match {
      case ">=" => (Some(v), None, None)
      case ">" => (Some(v + 1), None, None)
      case "<" => (None, Some(v), None)
      case "<=" => (None, Some(v + 1), None)
      case "=" => (Some(v), Some(v + 1), None)
      case other => throw ParseError(s"unsupported time operator '$other'")
    }

  private def flip(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
    case other => other
  }

  private def mentionsTime(e: Expr): Boolean = e match {
    case Ref(n) => n.equalsIgnoreCase("time")
    case Bin(_, l, r) => mentionsTime(l) || mentionsTime(r)
    case _ => false
  }

  /** Timestamp literal: epoch-ns integer or RFC3339 string. */
  private def tsNs(e: Expr): Long = e match {
    case IntLit(v) => v
    case StrLit(s) =>
      val inst = java.time.Instant.parse(s)
      Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000000L),
        inst.getNano.toLong)
    case DurLit(_) =>
      throw ParseError("bare durations in time conditions need now(), " +
        "which is not supported — use literal timestamps")
    case other => throw ParseError(s"bad timestamp literal: $other")
  }

  // ------------------------------------------------- predicate columns
  private[graft] def toColumn(e: Expr): Column = e match {
    case Bin("and", l, r) => toColumn(l) && toColumn(r)
    case Bin("or", l, r) => toColumn(l) || toColumn(r)
    case Bin("=~", Ref(n), ReLit(p)) => col(n).rlike(GoRegex.toJava(p))
    case Bin("!~", Ref(n), ReLit(p)) => !col(n).rlike(GoRegex.toJava(p))
    case Bin(op, Ref(n), v) => cmp(op, col(n), litOf(v))
    case Bin(op, v, Ref(n)) => cmp(flip(op), col(n), litOf(v))
    case other => throw ParseError(s"unsupported WHERE term: $other")
  }

  private def cmp(op: String, l: Column, r: Column): Column = op match {
    case "=" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
    case other => throw ParseError(s"unsupported operator '$other'")
  }

  private def litOf(e: Expr): Column = e match {
    case IntLit(v) => lit(v)
    case NumLit(v) => lit(v)
    case StrLit(s) => lit(s)
    case other => throw ParseError(s"bad literal: $other")
  }
}
