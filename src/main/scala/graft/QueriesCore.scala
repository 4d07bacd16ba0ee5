package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{IoxSchema, NsTime, RpcPredicate}
import graft.operators.{AsOfJoin, InfluxRpc, Sessionize, Upsert}
import graft.operators.InfluxRpc.AggKind
import graft.functions.Selectors
import graft.sources.{LineProtocol, SqlFrontend, Tables}

/** Core-engine correctness-gate queries: each entry has a Spark builder
  * and a DuckDB oracle with IDENTICAL output column names, types (modulo
  * engine-native widths) and a total ORDER BY, so the driver's
  * sort-columns-then-hash compare is deterministic.
  *
  * Conventions shared with the oracle:
  *  - time values surface as ns-epoch BIGINTs (`epoch_ns` in DuckDB)
  *  - double aggregates of non-integral values are round(x, 4..6)
  *  - DuckDB HUGEINT sums cast back to BIGINT
  *  - every ORDER BY is total (unique key suffix)
  */
object QueriesCore {
  type Builder = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** events with the graft tag/field/time category metadata: event_type and
    * user_tag (stringified user_id) are tags; value and user_id fields;
    * time = ns long. */
  def eventsTagged(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val tagMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Tag).build()
    val fieldMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Field).build()
    val timeMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Time).build()
    ev.select(
      col("event_type").as("event_type", tagMeta),
      col("user_id").cast("string").as("user_tag", tagMeta),
      col("user_id").as("user_id", fieldMeta),
      col("value").as("value", fieldMeta),
      col("ts_ns").as(NsTime.TimeColumn, timeMeta),
      col("event_id"))
  }

  // ns bounds for the shared RPC predicate: [2024-01-02, 2024-01-06) UTC
  private val T0 = 1704153600000000000L
  private val T1 = 1704499200000000000L
  private val SIXH = 21600000000000L // 6h in ns

  // DuckDB twin of TextFunctions.hash60 (same as QueriesPipeline's)
  private def dHash60Core(x: String) =
    s"CAST(('0x' || substring(md5($x), 1, 15)) AS BIGINT)"

  /** events exposed as an InfluxQL measurement: event_type and user_id
    * address series (tags), value is the field, ts_ns the time axis. */
  private def influxMs(s: SparkSession, dir: String) =
    Map("events" -> graft.operators.InfluxMeasurement(
      Tables.events(s, dir), "ts_ns", Seq("event_type", "user_id")))

  /** orders with graft category metadata — a multi-year time axis for
    * calendar (month-granularity) window aggregates, which the one-month
    * events table cannot exercise. */
  def ordersTagged(s: SparkSession, dir: String): DataFrame = {
    val tagMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Tag).build()
    val fieldMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Field).build()
    val timeMeta = new MetadataBuilder().putString(IoxSchema.CategoryKey, IoxSchema.Time).build()
    t(s, dir, "orders").select(
      col("o_orderpriority").as("prio", tagMeta),
      col("o_totalprice").as("price", fieldMeta),
      (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L)
        .as(NsTime.TimeColumn, timeMeta))
  }

  val entries: Seq[(String, Builder, Option[String])] = Seq(

    // ----------------------------------------------------------- core SQL

    ("q01_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(avg(l_quantity), 6) AS avg_qty,
        round(avg(l_discount), 6) AS avg_disc,
        CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("q02_filter_pushdown",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-07-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        CAST(l_shipdate AS DATE) AS ship_date
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1995-07-01'
          AND l_discount > 0.05
        ORDER BY l_orderkey, l_linenumber""")),

    ("q03_join_agg",
      (s, d) => t(s, d, "orders").join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1""")),

    ("q04_multi_join",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("q05_topk",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"), col("o_orderpriority")),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
        o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""")),

    ("q06_union",
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_orderstatus") === "F")
          .unionAll(o.filter(col("o_totalprice") > 100000))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        round(sum(o_totalprice), 2) AS total
        FROM (SELECT * FROM orders WHERE o_orderstatus = 'F'
              UNION ALL SELECT * FROM orders WHERE o_totalprice > 100000)
        GROUP BY 1 ORDER BY 1""")),

    ("q07_distinct",
      (s, d) => t(s, d, "customer").select("c_mktsegment").distinct()
        .orderBy("c_mktsegment"),
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1")),

    ("q08_window_rank",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders").filter(col("o_custkey") < 100)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("total"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, total FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
          CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
        FROM orders WHERE o_custkey < 100)
        WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    ("q09_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey""")),

    ("q10_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_without
        FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY 1 ORDER BY 1""")),

    ("q11_having",
      (s, d) => t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .filter(col("n") >= 8)
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1 HAVING count(*) >= 8 ORDER BY 1""")),

    ("q12_case_agg",
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("n_high"),
          sum(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L)).as("n_low"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY 1""")),

    ("q13_rollup",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        sum(l_quantity) AS sum_qty,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    ("q14_scalar_funcs",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          pmod(col("p_partkey"), lit(7)).as("key_mod"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        upper(substring(p_name, 1, 8)) AS name_prefix,
        CAST(length(p_name) AS INT) AS name_len,
        p_partkey % 7 AS key_mod,
        round(p_retailprice * 1.1, 2) AS marked_up,
        concat(p_brand, '-', p_type) AS brand_type
        FROM part ORDER BY p_partkey""")),

    ("q15_count_distinct",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_suppkey").as("n_supp"),
          countDistinct("l_partkey").as("n_part"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part
        FROM lineitem GROUP BY 1 ORDER BY 1""")),

    // SQL frontend (M4): the engine registered in the catalog, query
    // arrives as SQL TEXT and Catalyst plans it — near-identical text runs
    // on the oracle, demonstrating full SQL-surface parity
    ("q16_sql_frontend",
      (s, d) => {
        SqlFrontend.register(s, Map(
          "orders" -> t(s, d, "orders"), "customer" -> t(s, d, "customer"),
          "nation" -> t(s, d, "nation")))
        s.sql("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
          round(sum(o_totalprice), 2) AS revenue
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderpriority = '1-URGENT'
          GROUP BY n_name ORDER BY n_name""")
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
        round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY n_name ORDER BY n_name""")),

    // correlated SCALAR subquery (TPC-H Q17 shape): Catalyst must
    // decorrelate the per-part average into an aggregate + join — the
    // rewrite that decides whether this runs as one pass or a
    // per-row re-scan. Determinism: quantities are integers carried in
    // doubles (avg = exact-sum / count, one divide), prices aggregate as
    // exact integer cents
    ("q17_correlated_subquery",
      (s, d) => {
        SqlFrontend.register(s, Map(
          "lineitem" -> t(s, d, "lineitem"), "part" -> t(s, d, "part")))
        s.sql("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
          CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
            AS cents
          FROM lineitem l1 JOIN part ON p_partkey = l_partkey
          WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)
          GROUP BY p_brand ORDER BY p_brand""")
      },
      Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          AS cents
        FROM lineitem l1 JOIN part ON p_partkey = l_partkey
        WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY p_brand ORDER BY p_brand""")),

    // correlated EXISTS + NOT EXISTS (TPC-H Q21 shape, shipdate standing
    // in for receipt/commit dates): both rewrite to semi / anti joins —
    // the multi-correlation case q09/q10's single joins don't cover
    ("q18_exists_chain",
      (s, d) => {
        SqlFrontend.register(s, Map(
          "supplier" -> t(s, d, "supplier"),
          "lineitem" -> t(s, d, "lineitem"), "orders" -> t(s, d, "orders")))
        s.sql("""SELECT s_name, CAST(count(*) AS BIGINT) AS waiting
          FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
          WHERE o_orderstatus = 'F'
            AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > l1.l_shipdate)
          GROUP BY s_name ORDER BY waiting DESC, s_name LIMIT 20""")
      },
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS waiting
        FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name ORDER BY waiting DESC, s_name LIMIT 20""")),

    // disjunctive multi-band predicate (TPC-H Q19 shape): an OR of
    // per-brand (size band AND quantity band) conjuncts — the filter
    // class that cannot be split into one residual per column, testing
    // that the join still prunes (brand/size push to the part scan,
    // quantity to lineitem, the OR evaluated post-join). Revenue in
    // exact cents: round(price·(1−disc)·100) is single IEEE ops on
    // identical operands, the sum is exact integers
    ("q19_disjunctive",
      (s, d) => {
        SqlFrontend.register(s, Map(
          "lineitem" -> t(s, d, "lineitem"), "part" -> t(s, d, "part")))
        s.sql("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
            AS BIGINT)) AS BIGINT) AS revenue_cents
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 20)
             OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                 AND l_quantity BETWEEN 10 AND 40)
             OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                 AND l_quantity BETWEEN 20 AND 60)
          GROUP BY p_brand ORDER BY p_brand""")
      },
      Some("""SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
          AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 60)
        GROUP BY p_brand ORDER BY p_brand""")),

    // uncorrelated scalar subquery + anti join in one query (TPC-H Q22
    // shape): customers above the positive-balance average with no
    // URGENT order (bare no-orders is vacuous in this data: referential
    // integrity leaves <=1 such customer at any SF). The threshold
    // compares exact integer cents against
    // an average whose partial sums stay under 2^53 (exact in double
    // under ANY accumulation order), so the filter boundary cannot
    // wobble across engines
    ("q20_above_avg_anti",
      (s, d) => {
        SqlFrontend.register(s, Map(
          "customer" -> t(s, d, "customer"), "orders" -> t(s, d, "orders")))
        s.sql("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
          CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
            AS bal_cents
          FROM customer
          WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
              (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
               FROM customer WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderpriority = '1-URGENT')
          GROUP BY c_nationkey ORDER BY c_nationkey""")
      },
      Some("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
        CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS bal_cents
        FROM customer
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
            (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ------------------------------------------- InfluxRPC operator suite

    ("rpc_read_filter",
      (s, d) => InfluxRpc.readFilter(
          eventsTagged(s, d).drop("event_id", "user_tag"),
          RpcPredicate().withRange(T0, T1)
            .withExpr(col("event_type").isin("click", "error")))
        .select("event_type", "user_id", "value", "time"),
      Some(s"""SELECT event_type, user_id, value, epoch_ns(ts) AS time
        FROM events
        WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
          AND event_type IN ('click', 'error')
        ORDER BY event_type, time""")),

    ("rpc_read_group_sum",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Sum)
        .select(col("event_type"), round(col("value"), 4).as("value"), col("time")),
      Some(s"""SELECT event_type, round(sum(value), 4) AS value,
        max(epoch_ns(ts)) AS time
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        GROUP BY 1 ORDER BY 1""")),

    ("rpc_read_group_mean",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Mean)
        .select(col("event_type"), round(col("value"), 6).as("value"), col("time")),
      Some(s"""SELECT event_type, round(avg(value), 6) AS value,
        max(epoch_ns(ts)) AS time
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        GROUP BY 1 ORDER BY 1""")),

    ("rpc_selector_last",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate(), AggKind.Last)
        .select(col("event_type"), col("value"), col("time_value").as("time")),
      Some("""SELECT event_type, arg_max(value, epoch_ns(ts)) AS value,
        max(epoch_ns(ts)) AS time
        FROM events GROUP BY 1 ORDER BY 1""")),

    ("rpc_selector_first",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate(), AggKind.First)
        .select(col("event_type"), col("value"), col("time_value").as("time")),
      Some("""SELECT event_type, arg_min(value, epoch_ns(ts)) AS value,
        min(epoch_ns(ts)) AS time
        FROM events GROUP BY 1 ORDER BY 1""")),

    // readGroup Min/Max use SELECTOR time semantics: per-field
    // time_<field> is the timestamp OF the row that field's selector
    // picked (earliest on value ties), the reference's exact output shape
    // (influxrpc.rs:1336-1403, selectors.rs)
    ("rpc_read_group_min",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Min)
        .select(col("event_type"), col("value"), col("time_value").as("time")),
      Some(s"""SELECT event_type, value, t AS time FROM (
          SELECT event_type, value, epoch_ns(ts) AS t, row_number() OVER (
            PARTITION BY event_type ORDER BY value ASC, epoch_ns(ts) ASC) AS rn
          FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1)
        WHERE rn = 1 ORDER BY event_type""")),

    ("rpc_read_group_max",
      (s, d) => InfluxRpc.readGroup(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Max)
        .select(col("event_type"), col("value"), col("time_value").as("time")),
      Some(s"""SELECT event_type, value, t AS time FROM (
          SELECT event_type, value, epoch_ns(ts) AS t, row_number() OVER (
            PARTITION BY event_type ORDER BY value DESC, epoch_ns(ts) ASC) AS rn
          FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1)
        WHERE rn = 1 ORDER BY event_type""")),

    ("rpc_selector_minmax",
      (s, d) => eventsTagged(s, d)
        .groupBy("event_type")
        .agg(
          Selectors.minValue(col("value"), col("time")).as("min_value"),
          Selectors.minTime(col("value"), col("time")).as("min_time"),
          Selectors.maxValue(col("value"), col("time")).as("max_value"),
          Selectors.maxTime(col("value"), col("time")).as("max_time"))
        .orderBy("event_type"),
      Some("""WITH e AS (SELECT event_type, value, epoch_ns(ts) AS t FROM events),
        mn AS (SELECT event_type, value AS min_value, t AS min_time FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value ASC, t ASC) rn
          FROM e) WHERE rn = 1),
        mx AS (SELECT event_type, value AS max_value, t AS max_time FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY value DESC, t ASC) rn
          FROM e) WHERE rn = 1)
        SELECT mn.event_type, min_value, min_time, max_value, max_time
        FROM mn JOIN mx ON mn.event_type = mx.event_type
        ORDER BY mn.event_type""")),

    ("rpc_window_agg",
      (s, d) => InfluxRpc.readWindowAggregate(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Count, everyNs = SIXH)
        .select(col("event_type"), col("time"), col("value").as("n")),
      Some(s"""SELECT event_type,
        (epoch_ns(ts) // $SIXH + 1) * $SIXH AS time,
        CAST(count(value) AS BIGINT) AS n
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("rpc_window_agg_sum",
      (s, d) => InfluxRpc.readWindowAggregate(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Sum, everyNs = SIXH)
        .select(col("event_type"), col("time"), round(col("value"), 4).as("value")),
      Some(s"""SELECT event_type,
        (epoch_ns(ts) // $SIXH + 1) * $SIXH AS time,
        round(sum(value), 4) AS value
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // InfluxRPC `=~` regex predicate (reference query/src/func/regex.rs)
    ("rpc_read_filter_regex",
      (s, d) => InfluxRpc.readFilter(
          eventsTagged(s, d).drop("event_id", "user_tag"),
          RpcPredicate().withRange(T0, T1)
            .withRegexMatch("event_type", "^(cl|er)"))
        .select("event_type", "user_id", "value", "time"),
      Some(s"""SELECT event_type, user_id, value, epoch_ns(ts) AS time
        FROM events
        WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
          AND regexp_matches(event_type, '^(cl|er)')
        ORDER BY event_type, time""")),

    // month-granularity windows (reference WindowDuration::Variable,
    // group_by.rs:70-76): quarterly buckets over a multi-year time axis,
    // labeled with the window STOP bound like fixed windows
    ("rpc_window_agg_quarters",
      (s, d) => InfluxRpc.readWindowAggregateMonths(ordersTagged(s, d),
          RpcPredicate(), AggKind.Sum, everyMonths = 3)
        .select(col("prio"), col("time"), round(col("price"), 2).as("price")),
      Some("""SELECT o_orderpriority AS prio,
        epoch_ns(date_trunc('quarter', CAST(o_orderdate AS TIMESTAMP))
          + INTERVAL 3 MONTH) AS time,
        round(sum(o_totalprice), 2) AS price
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // selector aggregate INSIDE time windows (reference supports selector
    // kinds in read_window_aggregate, influxrpc.rs:1336-1403)
    ("rpc_window_agg_last",
      (s, d) => InfluxRpc.readWindowAggregate(
          eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
          RpcPredicate().withRange(T0, T1), AggKind.Last, everyNs = SIXH)
        .select(col("event_type"), col("time"), col("value")),
      Some(s"""SELECT event_type,
        (epoch_ns(ts) // $SIXH + 1) * $SIXH AS time,
        arg_max(value, epoch_ns(ts)) AS value
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // offset month-grid: the oracle re-derives months-since-epoch floor
    // arithmetic independently, a true differential test of the
    // MonthWindowStop Catalyst expression (offset shifts the grid)
    ("rpc_window_agg_quarters_offset",
      (s, d) => InfluxRpc.readWindowAggregateMonths(ordersTagged(s, d),
          RpcPredicate(), AggKind.Count, everyMonths = 3, offsetMonths = 1)
        .select(col("prio"), col("time"), col("price").as("n")),
      Some("""WITH m AS (SELECT o_orderpriority AS prio, o_totalprice,
          (date_part('year', o_orderdate) - 1970) * 12
            + date_part('month', o_orderdate) - 1 AS mi
          FROM orders),
        b AS (SELECT prio, o_totalprice,
          ((mi - 1 - (CASE WHEN (mi - 1) % 3 < 0 THEN (mi - 1) % 3 + 3
                           ELSE (mi - 1) % 3 END)) // 3 + 1) * 3 + 1 AS stop_mi
          FROM m)
        SELECT prio, epoch_ns(make_timestamp(
            CAST(stop_mi // 12 + 1970 AS BIGINT), CAST(stop_mi % 12 + 1 AS BIGINT),
            1, 0, 0, 0.0)) AS time,
          CAST(count(o_totalprice) AS BIGINT) AS n
        FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("rpc_tag_values",
      (s, d) => InfluxRpc.tagValues(eventsTagged(s, d), "event_type",
        RpcPredicate().withRange(T0, T1)),
      Some(s"""SELECT DISTINCT event_type AS value FROM events
        WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
          AND event_type IS NOT NULL
        ORDER BY 1""")),

    ("rpc_tag_keys",
      (s, d) => {
        import s.implicits._
        InfluxRpc.tagKeys(eventsTagged(s, d), RpcPredicate().withRange(T0, T1))
          .toDF("tag_key")
      },
      Some(s"""SELECT tag_key FROM (
        SELECT 'event_type' AS tag_key, count(event_type) AS c FROM events
          WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        UNION ALL
        SELECT 'user_tag' AS tag_key, count(user_id) AS c FROM events
          WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1)
        WHERE c > 0 ORDER BY tag_key""")),

    ("rpc_field_columns",
      (s, d) => InfluxRpc.fieldColumns(
        eventsTagged(s, d).drop("event_id", "user_tag", "user_id"),
        RpcPredicate().withRange(T0, T1)),
      Some(s"""SELECT 'value' AS field, 'double' AS field_type,
        max(epoch_ns(ts)) AS last_time
        FROM events WHERE value IS NOT NULL
          AND epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1
        ORDER BY field""")),

    ("rpc_series_cardinality",
      (s, d) => {
        import s.implicits._
        Seq(InfluxRpc.seriesCardinality(eventsTagged(s, d),
          RpcPredicate().withRange(T0, T1))).toDF("n_series")
      },
      Some(s"""SELECT count(DISTINCT (event_type, CAST(user_id AS VARCHAR))) AS n_series
        FROM events WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1""")),

    ("rpc_table_names",
      (s, d) => {
        import s.implicits._
        InfluxRpc.tableNames(
          Map("events" -> eventsTagged(s, d)),
          RpcPredicate().withRange(T0, T1)).toDF("table_name")
      },
      Some(s"""SELECT DISTINCT 'events' AS table_name FROM events
        WHERE epoch_ns(ts) >= $T0 AND epoch_ns(ts) < $T1""")),

    // -------------------------------------------- dedup / ingest / stream

    ("dedup_upsert",
      (s, d) => {
        val ev = eventsTagged(s, d).select("user_id", "event_type", "time", "value")
        // chunk 2 re-writes every 7th event with doubled value (upsert)
        val chunk1 = ev.withColumn("seq", lit(1L))
        val chunk2 = ev.filter(pmod(col("user_id") + col("time"), lit(7)) === 0)
          .withColumn("value", col("value") * 2)
          .withColumn("seq", lit(2L))
        Upsert.dedup(chunk1.unionAll(chunk2),
            pkCols = Seq("user_id", "event_type", "time"), seqCol = "seq")
          .orderBy("user_id", "event_type", "time")
      },
      Some("""WITH chunks AS (
          SELECT user_id, event_type, epoch_ns(ts) AS time, value, 1 AS seq FROM events
          UNION ALL
          SELECT user_id, event_type, epoch_ns(ts) AS time, value * 2 AS value, 2 AS seq
          FROM events WHERE (user_id + epoch_ns(ts)) % 7 = 0)
        SELECT user_id, event_type, time, arg_max(value, seq) AS value
        FROM chunks GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    ("lp_roundtrip",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        // format rows as line protocol (tag + float/int/string fields + ns
        // timestamp), then parse back with the engine's LP parser in
        // executors, then aggregate the parsed stream
        val lines = ev.select(concat(
          lit("events,event_type="), col("event_type"),
          lit(" value="), col("value").cast("string"),
          lit(",user_id="), col("user_id").cast("string"), lit("i"),
          lit(",props=\""), regexp_replace(col("props"), "\"", "\\\\\""), lit("\""),
          lit(" "), col("ts_ns").cast("string"))).as[String]
        val schema = StructType(Seq(
          IoxSchema.tagged("event_type", StringType, IoxSchema.Tag),
          IoxSchema.tagged("value", DoubleType, IoxSchema.Field),
          IoxSchema.tagged("user_id", LongType, IoxSchema.Field),
          IoxSchema.tagged("props", StringType, IoxSchema.Field),
          IoxSchema.tagged(NsTime.TimeColumn, LongType, IoxSchema.Time)))
        LineProtocol.ingestAs(lines, "events", schema)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("value_sum"),
            sum(length(col("props"))).as("props_chars"),
            max("time").as("max_time"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        round(sum(value), 4) AS value_sum,
        CAST(sum(length(props)) AS BIGINT) AS props_chars,
        max(epoch_ns(ts)) AS max_time
        FROM events GROUP BY 1 ORDER BY 1""")),

    ("events_sessionize",
      (s, d) => Sessionize.aggregate(
          Tables.events(s, d).select(col("user_id"), col("ts_ns").as("t")),
          keyCols = Seq("user_id"), timeCol = "t", gapNs = 1800000000000L)
        .orderBy("user_id", "session_id"),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t FROM events),
        m AS (SELECT user_id, t,
          CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800000000000
               OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
          THEN 1 ELSE 0 END AS brk FROM e),
        s AS (SELECT user_id, t, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM m)
        SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
          min(t) AS start_t, max(t) AS end_t
        FROM s GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("events_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_ns").as("error_time"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns").as("click_time"),
            col("value").as("click_value"))
        AsOfJoin.backward(err, clk, Seq("user_id"),
            "error_time", "click_time", Seq("click_value"))
          .filter(col("click_time").isNotNull) // inner: drop error w/o prior click
          .select("event_id", "error_time", "click_time", "click_value")
          .orderBy("event_id")
      },
      Some("""WITH err AS (SELECT event_id, user_id, epoch_ns(ts) AS error_time
          FROM events WHERE event_type = 'error'),
        clk AS (SELECT user_id, epoch_ns(ts) AS click_time, value AS click_value
          FROM events WHERE event_type = 'click')
        SELECT event_id, error_time, click_time, click_value FROM (
          SELECT e.event_id, e.error_time, c.click_time, c.click_value,
            row_number() OVER (PARTITION BY e.event_id ORDER BY c.click_time DESC) AS rn
          FROM err e JOIN clk c ON c.user_id = e.user_id
            AND c.click_time < e.error_time) WHERE rn = 1
        ORDER BY event_id""")),

    // nearest as-of (kdb aj-family): each error attaches the click
    // MINIMIZING |Δt| (strict on both sides, ties to the earlier click);
    // one union + one key exchange + two window sorts — never the
    // quadratic join+rank expansion the oracle spells
    ("events_asof_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_ns").as("error_time"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns").as("click_time"),
            col("value").as("click_value"))
        AsOfJoin.nearest(err, clk, Seq("user_id"),
            "error_time", "click_time", Seq("click_value"))
          .filter(col("click_time").isNotNull) // inner: users with no click
          .select("event_id", "error_time", "click_time", "click_value")
          .orderBy("event_id")
      },
      Some("""WITH err AS (SELECT event_id, user_id, epoch_ns(ts) AS error_time
          FROM events WHERE event_type = 'error'),
        clk AS (SELECT user_id, epoch_ns(ts) AS click_time, value AS click_value
          FROM events WHERE event_type = 'click')
        SELECT event_id, error_time, click_time, click_value FROM (
          SELECT e.event_id, e.error_time, c.click_time, c.click_value,
            row_number() OVER (PARTITION BY e.event_id
              ORDER BY abs(c.click_time - e.error_time) ASC,
                c.click_time ASC) AS rn
          FROM err e JOIN clk c ON c.user_id = e.user_id
            AND c.click_time != e.error_time) WHERE rn = 1
        ORDER BY event_id""")),

    // toleranced as-of (pandas merge_asof's tolerance knob): a prior
    // click older than 1 hour is NO match — stale context must not
    // attach to an error; same union+window shape, the tolerance is one
    // projection over the carried match
    ("events_asof_tolerance",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_ns").as("error_time"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ns").as("click_time"),
            col("value").as("click_value"))
        AsOfJoin.backward(err, clk, Seq("user_id"),
            "error_time", "click_time", Seq("click_value"),
            toleranceNs = Some(3600L * 1000000000L))
          .select(col("event_id"), col("error_time"),
            col("click_time"), col("click_value"),
            col("click_time").isNotNull.as("matched"))
          .orderBy("event_id")
      },
      Some("""WITH err AS (SELECT event_id, user_id, epoch_ns(ts) AS error_time
          FROM events WHERE event_type = 'error'),
        clk AS (SELECT user_id, epoch_ns(ts) AS click_time, value AS click_value
          FROM events WHERE event_type = 'click'),
        m AS (SELECT event_id, error_time, click_time, click_value FROM (
          SELECT e.event_id, e.error_time, c.click_time, c.click_value,
            row_number() OVER (PARTITION BY e.event_id
              ORDER BY c.click_time DESC) AS rn
          FROM err e JOIN clk c ON c.user_id = e.user_id
            AND c.click_time < e.error_time
            AND e.error_time - c.click_time <= 3600000000000) WHERE rn = 1)
        SELECT e.event_id, e.error_time, m.click_time, m.click_value,
          m.click_time IS NOT NULL AS matched
        FROM err e LEFT JOIN m ON m.event_id = e.event_id
        ORDER BY e.event_id""")),

    // ordered funnel (view -> click -> purchase, strictly increasing time
    // per user): each stage is "earliest qualifying event AFTER the
    // previous stage's time" — min-aggregate per user, then a keyed join
    // onto the next stage's candidates. Three keyed user_id aggregations,
    // no window, no self-join explosion: at 100 TB each stage is one
    // shuffle on the user key and the stage frames shrink monotonically.
    // Conversion is one division of two exact counts
    ("events_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_ns"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_ns").as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts_ns") > col("t1"))
          .groupBy("user_id").agg(min("ts_ns").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts_ns") > col("t2"))
          .groupBy("user_id").agg(min("ts_ns").as("t3"))
        val stages = Seq((1, "view", v), (2, "click", c), (3, "purchase", p))
          .map { case (i, nm, df) =>
            df.agg(count(lit(1)).as("n_users"))
              .select(lit(i).as("stage"), lit(nm).as("stage_name"),
                col("n_users"))
          }.reduce(_ unionByName _)
        val first = stages.filter(col("stage") === 1)
          .select(col("n_users").as("__n1"))
        stages.crossJoin(broadcast(first))
          .select(col("stage"), col("stage_name"), col("n_users"),
            round(col("n_users").cast("double") / col("__n1").cast("double"),
              6).as("pct"))
          .orderBy("stage")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t
          FROM events),
        v AS (SELECT user_id, min(t) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND t > t1 GROUP BY 1),
        p AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND t > t2 GROUP BY 1),
        n AS (SELECT 1 AS stage, 'view' AS stage_name,
            CAST(count(*) AS BIGINT) AS n_users FROM v
          UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
          UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
        SELECT stage, stage_name, n_users,
          round(CAST(n_users AS DOUBLE) /
            (SELECT CAST(n_users AS DOUBLE) FROM n WHERE stage = 1), 6) AS pct
        FROM n ORDER BY stage""")),

    // attribution-window funnel: same ordered stages, but each conversion
    // must land within 72h of the PREVIOUS stage's time — the variant
    // real funnel analytics default to (an unbounded funnel credits a
    // purchase months after the view). Same keyed-aggregation shapes;
    // the window is pure integer ns arithmetic
    ("events_funnel_windowed",
      (s, d) => {
        val win = 259200000000000L // 72h in ns
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_ns"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_ns").as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts_ns") > col("t1") && col("ts_ns") <= col("t1") + win)
          .groupBy("user_id").agg(min("ts_ns").as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("ts_ns") > col("t2") && col("ts_ns") <= col("t2") + win)
          .groupBy("user_id").agg(min("ts_ns").as("t3"))
        val stages = Seq((1, "view", v), (2, "click", c), (3, "purchase", p))
          .map { case (i, nm, df) =>
            df.agg(count(lit(1)).as("n_users"))
              .select(lit(i).as("stage"), lit(nm).as("stage_name"),
                col("n_users"))
          }.reduce(_ unionByName _)
        val first = stages.filter(col("stage") === 1)
          .select(col("n_users").as("__n1"))
        stages.crossJoin(broadcast(first))
          .select(col("stage"), col("stage_name"), col("n_users"),
            round(col("n_users").cast("double") / col("__n1").cast("double"),
              6).as("pct"))
          .orderBy("stage")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t
          FROM events),
        v AS (SELECT user_id, min(t) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND t > t1
            AND t <= t1 + 259200000000000 GROUP BY 1),
        p AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND t > t2
            AND t <= t2 + 259200000000000 GROUP BY 1),
        n AS (SELECT 1 AS stage, 'view' AS stage_name,
            CAST(count(*) AS BIGINT) AS n_users FROM v
          UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
          UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
        SELECT stage, stage_name, n_users,
          round(CAST(n_users AS DOUBLE) /
            (SELECT CAST(n_users AS DOUBLE) FROM n WHERE stage = 1), 6) AS pct
        FROM n ORDER BY stage""")),

    // volume-weighted average value (VWAP shape) per (event_type, day):
    // the weight rides the props JSON payload — extracted with the same
    // anchored regex on both engines (no JSON-library dependence), value
    // in exact integer cents, so the exposed vwap is one division of two
    // exact integer sums. One scan, one keyed aggregate
    ("events_vwap",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dayNs = 86400000000000L
        ev.select(col("event_type"),
            expr(s"ts_ns div ${dayNs}L").as("day"),
            regexp_extract(col("props"), "\"k\": (\\d+)", 1)
              .cast("long").as("w"),
            (col("value") * 100).as("v100"))
          .select(col("event_type"), col("day"), col("w"),
            floor(col("v100") + lit(0.5)).cast("long").as("cents"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"),
            sum(col("w")).as("w_sum"),
            sum(col("w") * col("cents")).as("wv_sum"))
          .select(col("event_type"), col("day"), col("n"),
            col("w_sum"),
            round(col("wv_sum") / col("w_sum") / lit(100.0), 6).as("vwap"))
          .orderBy("event_type", "day")
      },
      Some("""WITH e AS (SELECT event_type,
          epoch_ns(ts) // 86400000000000 AS day,
          CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS w,
          CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          FROM events)
        SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(w) AS BIGINT) AS w_sum,
          round(CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0, 6) AS vwap
        FROM e GROUP BY 1, 2 ORDER BY 1, 2""")),

    // weekly retention cohorts: users grouped by the epoch-week of their
    // first event, counted distinct in every later week they reappear —
    // the (cohort, weeks-since) retention matrix. Week ids are INTEGER
    // floor-division of the ns timestamp (`div` / `//`): the float path
    // (ts/604800e12 then cast) is NOT engine-proof at ns magnitudes
    // (~2^60.5 > 2^53 doubles round before truncation). Shapes: one
    // distinct on (user, week), one min-per-user, one keyed join back,
    // one counted group — every step keyed, no window
    ("events_retention",
      (s, d) => {
        val wk = 604800000000000L
        val weeks = Tables.events(s, d)
          .select(col("user_id"), expr(s"ts_ns div ${wk}L").as("w"))
          .distinct()
        val first = weeks.groupBy("user_id").agg(min("w").as("cohort_w"))
        weeks.join(first, "user_id")
          .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort_w", "week_offset")
      },
      Some("""WITH weeks AS (SELECT DISTINCT user_id,
          epoch_ns(ts) // 604800000000000 AS w FROM events),
        f AS (SELECT user_id, min(w) AS cohort_w FROM weeks GROUP BY 1)
        SELECT cohort_w, w - cohort_w AS week_offset,
          CAST(count(*) AS BIGINT) AS n_users
        FROM weeks JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("lifecycle_scan",
      (s, d) => {
        // the lifecycle loop end-to-end (policy.rs): two overlapping write
        // batches land as open chunks, a policy round compacts them (idle
        // past the late-arrive window), another persists with a mid-data
        // split; the scan over the resulting cold+hot chunk directory must
        // equal plain last-write-wins upsert semantics
        val ev = Tables.events(s, d).select(
          col("user_id").cast("string").as("user_tag"), col("event_type"),
          col("ts_ns").as("time"), col("value"))
        val dir = java.nio.file.Files.createTempDirectory("graft-lifecycle-q").toString
        val table = new graft.streaming.Lifecycle.ChunkedTable(
          s, dir, pkCols = Seq("user_tag", "event_type", "time"))
        val rules = graft.streaming.Lifecycle.Rules(
          lateArriveWindowMs = 10000L, persistRowThreshold = Long.MaxValue,
          persistAgeThresholdMs = 60000L)
        table.writeChunk(ev, nowMs = 0L)
        table.writeChunk( // re-write every 7th event with doubled value
          ev.filter(pmod(col("user_tag").cast("long") + col("time"), lit(7)) === 0)
            .withColumn("value", col("value") * 2), nowMs = 5000L)
        // the split-point percentile is independent of the compact round —
        // overlap the two Spark jobs (guide §2.6), result unchanged
        import scala.concurrent.{Await, ExecutionContext, Future, blocking}
        import scala.concurrent.duration.DurationInt
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fMid = Future(blocking(
          ev.agg(percentile_approx(col("time"), lit(0.5), lit(100)))
            .head().getLong(0)))
        // join the overlapped job BEFORE the require (r16 advice): a
        // failed require must not leave an orphaned Spark job running,
        // and the bounded timeout fails fast instead of masking a hang
        // far past the bench budget
        val compactActs = table.runOnce(rules, nowMs = 16000L)
        val midNs = Await.result(fMid, 5.minutes)
        require(compactActs
          .exists(_.isInstanceOf[graft.streaming.Lifecycle.Compact]), "no compact")
        require(table.runOnce(rules, nowMs = 80000L, splitNsOf = _ => midNs)
          .exists(_.isInstanceOf[graft.streaming.Lifecycle.Persist]), "no persist")
        table.scan()
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("value_sum"),
            max("time").as("max_time"))
          .orderBy("event_type")
      },
      Some("""WITH chunks AS (
          SELECT CAST(user_id AS VARCHAR) AS user_tag, event_type,
            epoch_ns(ts) AS time, value, 1 AS seq FROM events
          UNION ALL
          SELECT CAST(user_id AS VARCHAR) AS user_tag, event_type,
            epoch_ns(ts) AS time, value * 2 AS value, 2 AS seq
          FROM events WHERE (user_id + epoch_ns(ts)) % 7 = 0),
        up AS (SELECT user_tag, event_type, time, arg_max(value, seq) AS value
          FROM chunks GROUP BY 1, 2, 3)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          round(sum(value), 4) AS value_sum, max(time) AS max_time
        FROM up GROUP BY 1 ORDER BY 1""")),

    ("system_chunk_columns",
      (s, d) => {
        // the same lifecycle timeline as lifecycle_scan but with a
        // DETERMINISTIC persist split at (tmin+tmax)/2 so the oracle can
        // reproduce each resulting chunk's per-column stats; the query
        // itself is served purely from sidecar metadata via the SQL
        // frontend's system_chunk_columns view (docs/sql.md:234,
        // system_tables.rs:373-461). `value` (double) is excluded from
        // the comparison: min/max render via each engine's float
        // formatter, whose shortest-roundtrip spellings can differ.
        val ev = Tables.events(s, d).select(
          col("user_id").cast("string").as("user_tag"), col("event_type"),
          col("ts_ns").as("time"), col("value"))
        val dir = java.nio.file.Files.createTempDirectory("graft-syscc-q").toString
        val table = new graft.streaming.Lifecycle.ChunkedTable(
          s, dir, pkCols = Seq("user_tag", "event_type", "time"))
        val rules = graft.streaming.Lifecycle.Rules(
          lateArriveWindowMs = 10000L, persistRowThreshold = Long.MaxValue,
          persistAgeThresholdMs = 60000L)
        table.writeChunk(ev, nowMs = 0L)
        table.writeChunk(
          ev.filter(pmod(col("user_tag").cast("long") + col("time"), lit(7)) === 0)
            .withColumn("value", col("value") * 2), nowMs = 5000L)
        // min/max bounds are independent of the compact round — overlap
        // the two Spark jobs (guide §2.6), result unchanged
        import scala.concurrent.{Await, ExecutionContext, Future, blocking}
        import scala.concurrent.duration.DurationInt
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fBounds = Future(blocking(ev.agg(min("time"), max("time")).head()))
        // join-before-require + bounded timeout: see lifecycle_scan above
        val compactActs = table.runOnce(rules, nowMs = 16000L)
        val bounds = Await.result(fBounds, 5.minutes)
        require(compactActs
          .exists(_.isInstanceOf[graft.streaming.Lifecycle.Compact]), "no compact")
        val midNs = (bounds.getLong(0) + bounds.getLong(1)) / 2L
        require(table.runOnce(rules, nowMs = 80000L, splitNsOf = _ => midNs)
          .exists(_.isInstanceOf[graft.streaming.Lifecycle.Persist]), "no persist")
        graft.sources.SqlFrontend.registerChunked(s, Map("events_lc" -> table))
        s.sql("""SELECT storage, column_name, row_count, min_value, max_value
          FROM system_chunk_columns
          WHERE column_name IN ('user_tag', 'event_type', 'time')
          ORDER BY storage, column_name""")
      },
      Some("""WITH chunks AS (
          SELECT CAST(user_id AS VARCHAR) AS user_tag, event_type,
            epoch_ns(ts) AS time, value, 1 AS seq FROM events
          UNION ALL
          SELECT CAST(user_id AS VARCHAR) AS user_tag, event_type,
            epoch_ns(ts) AS time, value * 2 AS value, 2 AS seq
          FROM events WHERE (user_id + epoch_ns(ts)) % 7 = 0),
        up AS (SELECT user_tag, event_type, time, arg_max(value, seq) AS value
          FROM chunks GROUP BY 1, 2, 3),
        mid AS (SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS midns
          FROM events),
        parts AS (SELECT up.*, CASE WHEN time <= (SELECT midns FROM mid)
            THEN 'ObjectStoreOnly' ELSE 'OpenMutableBuffer' END AS storage
          FROM up),
        stats AS (
          SELECT storage, 'user_tag' AS column_name,
            CAST(count(user_tag) AS BIGINT) AS row_count,
            min(user_tag) AS min_value, max(user_tag) AS max_value
          FROM parts GROUP BY 1
          UNION ALL
          SELECT storage, 'event_type', CAST(count(event_type) AS BIGINT),
            min(event_type), max(event_type) FROM parts GROUP BY 1
          UNION ALL
          SELECT storage, 'time', CAST(count(time) AS BIGINT),
            CAST(min(time) AS VARCHAR), CAST(max(time) AS VARCHAR)
          FROM parts GROUP BY 1)
        SELECT storage, column_name, row_count, min_value, max_value
        FROM stats ORDER BY storage, column_name""")),

    ("partition_keys",
      (s, d) => {
        // partition-key template assignment (database_rules.rs:205-233
        // PartitionTemplate: Table + Column + TimeFormat parts, joined by
        // `-`) computed as a Catalyst expression over the events stream —
        // the key every write is bucketed by before it lands in a chunk
        // directory. The DuckDB twin recomputes the same keys with
        // strftime, proving the strftime->java.time mapping exact.
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("ts_ns").as(NsTime.TimeColumn))
        val tpl = graft.core.PartitionTemplate(Seq(
          graft.core.TemplatePart.Table,
          graft.core.TemplatePart.ColumnValue("event_type"),
          graft.core.TemplatePart.TimeFormat("%Y-%m-%d")))
        ev.select(tpl.keyColumn("events", ev.schema).as("partition_key"))
          .groupBy("partition_key").agg(count(lit(1)).as("n"))
          .orderBy("partition_key")
      },
      Some("""SELECT 'events-event_type_' || event_type || '-' ||
          strftime(ts, '%Y-%m-%d') AS partition_key,
          CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY 1""")),

    ("http_roundtrip",
      (s, d) => {
        import s.implicits._
        // the full wire path (http.rs:364,462,595): customer rows formatted
        // as line protocol, POSTed over HTTP in three batches (first batch
        // twice -> multi-chunk upsert dedup on the server), aggregated via
        // the SQL query endpoint, CSV response parsed back into a frame
        val lines = t(s, d, "customer").select(concat(
          lit("customer,c_mktsegment="), col("c_mktsegment"),
          lit(" c_acctbal="), col("c_acctbal").cast("string"),
          lit(",c_nationkey="), col("c_nationkey").cast("string"), lit("i"),
          lit(" "), col("c_custkey").cast("string"))).as[String].collect()
        val facade = new graft.server.HttpFacade(s, port = 0)
        try {
          val (b1, b2) = lines.splitAt(lines.length / 2)
          require(graft.server.HttpFacade.postWrite(
            facade.boundPort, "acme", "prod", b1.mkString("\n")) == 204)
          require(graft.server.HttpFacade.postWrite(
            facade.boundPort, "acme", "prod", b2.mkString("\n")) == 204)
          require(graft.server.HttpFacade.postWrite( // duplicate chunk
            facade.boundPort, "acme", "prod", b1.mkString("\n")) == 204)
          val (status, csv) = graft.server.HttpFacade.getQuery(
            facade.boundPort, "acme_prod",
            """SELECT c_mktsegment, count(*) AS n,
              sum(c_nationkey) AS sum_nk, min(c_acctbal) AS min_bal,
              max(c_acctbal) AS max_bal
              FROM customer GROUP BY c_mktsegment""")
          require(status == 200, s"query endpoint returned $status: $csv")
          val body = s.createDataset(csv.trim.split("\n").toSeq.drop(1))
          s.read.schema(
              "c_mktsegment STRING, n BIGINT, sum_nk BIGINT, min_bal DOUBLE, max_bal DOUBLE")
            .csv(body)
            .orderBy("c_mktsegment")
        } finally facade.stop()
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c_nationkey) AS BIGINT) AS sum_nk,
        min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        FROM customer GROUP BY 1 ORDER BY 1""")),

    ("write_pb_roundtrip",
      (s, d) => {
        import s.implicits._
        // the protobuf write path (write_pb.rs; entry.rs:306 pb_to_entry):
        // the same customer rows http_roundtrip ships as line protocol go
        // in as ONE columnar DatabaseBatch (packed values, tag/field/time
        // semantics), then aggregate back over the SQL query endpoint —
        // the oracle is IDENTICAL to http_roundtrip's, which is the
        // indistinguishability contract of the write_pb service
        import graft.server.StorageProto
        def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
          val w = new StorageProto.Writer; f(w); w.result()
        }
        val rows = t(s, d, "customer")
          .select(col("c_mktsegment"), col("c_acctbal"),
            col("c_nationkey").cast("long"), col("c_custkey").cast("long"))
          .collect()
        val table = msg { tb =>
          tb.string(1, "customer")
          tb.bytes(2, msg { c =>
            c.string(1, "c_mktsegment").varintField(2, 2) // TAG
            c.bytes(3, msg(v => rows.foreach(r => v.string(4, r.getString(0)))))
          })
          tb.bytes(2, msg { c =>
            c.string(1, "c_acctbal").varintField(2, 3) // FIELD f64
            c.bytes(3, msg(_.packedDouble(2, rows.map(_.getDouble(1)).toSeq)))
          })
          tb.bytes(2, msg { c =>
            c.string(1, "c_nationkey").varintField(2, 3) // FIELD i64
            c.bytes(3, msg(_.packedVarint(1, rows.map(_.getLong(2)).toSeq)))
          })
          tb.bytes(2, msg { c =>
            c.string(1, "time").varintField(2, 4) // TIME (custkey ns, unique)
            c.bytes(3, msg(_.packedVarint(1, rows.map(_.getLong(3)).toSeq)))
          })
          tb.varintField(3, rows.length.toLong)
        }
        val req = msg(w => w.bytes(1,
          msg(b => { b.string(1, "acme_pb"); b.bytes(2, table); () })))
        val facade = new graft.server.HttpFacade(s, port = 0)
        try {
          require(graft.server.HttpFacade.postWritePb(
            facade.boundPort, req) == 200)
          val (status, csv) = graft.server.HttpFacade.getQuery(
            facade.boundPort, "acme_pb",
            """SELECT c_mktsegment, count(*) AS n,
              sum(c_nationkey) AS sum_nk, min(c_acctbal) AS min_bal,
              max(c_acctbal) AS max_bal
              FROM customer GROUP BY c_mktsegment""")
          require(status == 200, s"query endpoint returned $status: $csv")
          val body = s.createDataset(csv.trim.split("\n").toSeq.drop(1))
          s.read.schema(
              "c_mktsegment STRING, n BIGINT, sum_nk BIGINT, min_bal DOUBLE, max_bal DOUBLE")
            .csv(body)
            .orderBy("c_mktsegment")
        } finally facade.stop()
      },
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c_nationkey) AS BIGINT) AS sum_nk,
        min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        FROM customer GROUP BY 1 ORDER BY 1""")),

    ("grpc_management_roundtrip",
      (s, d) => {
        import s.implicits._
        // the management-plane gRPC services end-to-end over real HTTP/2
        // (management.rs:114-137 create_database with rules,
        // rpc/write.rs:23-54 write, management.rs:342-363
        // close_partition_chunk + operations get, management.rs:157-186
        // list_chunks): create a database whose rules partition by
        // c_mktsegment, write the customer rows as LP through the gRPC
        // write service, close the write's chunk, and read the chunk
        // inventory back — per-partition row counts with the post-close
        // storage stage, all four hops on the gRPC wire
        import graft.server.{GrpcClient, ManagementProto, StorageProto, StorageProtoReader => R}
        def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
          val w = new StorageProto.Writer; f(w); w.result()
        }
        val lines = t(s, d, "customer").select(concat(
          lit("customer,c_mktsegment="), col("c_mktsegment"),
          lit(" c_acctbal="), col("c_acctbal").cast("string"),
          lit(",c_nationkey="), col("c_nationkey").cast("string"), lit("i"),
          lit(" "), col("c_custkey").cast("string"))).as[String].collect()
        val facade = new graft.server.HttpFacade(s, port = 0)
        val grpc = graft.server.IoxGrpc.start(facade)
        try {
          val p = grpc.boundPort
          val M = graft.server.ManagementGrpc.ManagementPrefix
          val rules = msg { r =>
            r.string(1, "mgmtdb")
            r.bytes(2, msg(_.bytes(1, msg(_.string(2, "c_mktsegment")))))
          }
          require(GrpcClient.call(p, M + "CreateDatabase",
            msg(_.bytes(1, rules)))._1 == 0, "create_database failed")
          val (ws, wr) = GrpcClient.call(p,
            graft.server.ManagementGrpc.WritePrefix + "Write",
            msg { w => w.string(1, "mgmtdb")
              w.string(2, lines.mkString("\n")) })
          require(ws == 0, s"grpc write returned status $ws")
          require(ManagementProto.readVarint(wr.head, 1) == lines.length.toLong,
            "lines_written mismatch")
          val (cs, _) = GrpcClient.call(p, M + "ClosePartitionChunk",
            msg { w => w.string(1, "mgmtdb")
              w.string(2, "c_mktsegment_BUILDING")
              w.varintField(3, 0); w.string(4, "customer") })
          require(cs == 0, s"close_partition_chunk returned status $cs")
          val (os, ops) = GrpcClient.call(p,
            graft.server.ManagementGrpc.OperationsPrefix + "GetOperation",
            msg(_.string(1, "0")))
          require(os == 0 && ManagementProto.readVarint(ops.head, 3) == 1,
            "operation not done")
          val (ls, chunks) = GrpcClient.call(p, M + "ListChunks",
            msg(_.string(1, "mgmtdb")))
          require(ls == 0, s"list_chunks returned status $ls")
          val stageNames = Map(1 -> "OpenMutableBuffer",
            2 -> "ClosedMutableBuffer", 3 -> "ReadBuffer",
            4 -> "ReadBufferAndObjectStore", 5 -> "ObjectStoreOnly")
          val rows = Seq.newBuilder[(String, String, String, Long)]
          val rr = new R.Reader(chunks.head)
          while (rr.hasMore) rr.key() match {
            case (1, 2) =>
              val c = rr.sub()
              var key = ""; var table = ""; var storage = 0; var n = 0L
              while (c.hasMore) c.key() match {
                case (1, 2) => key = c.stringField()
                case (3, 0) => storage = c.varint().toInt
                case (8, 2) => table = c.stringField()
                case (9, 0) => n = c.varint()
                case (_, wt) => c.skip(wt)
              }
              rows += ((key, table, stageNames(storage), n))
            case (_, wt) => rr.skip(wt)
          }
          rows.result()
            .toDF("partition_key", "table_name", "storage", "row_count")
            .orderBy("partition_key")
        } finally { grpc.stop(); facade.stop() }
      },
      Some("""SELECT 'c_mktsegment_' || c_mktsegment AS partition_key,
        'customer' AS table_name, 'ReadBuffer' AS storage,
        CAST(count(*) AS BIGINT) AS row_count
        FROM customer GROUP BY 1 ORDER BY 1""")),

    ("flight_do_get",
      (s, d) => {
        import s.implicits._
        // Arrow Flight do_get data plane (flight.rs:158): nation rows as
        // line protocol over HTTP write, then a Flight ticket whose SQL
        // aggregates them; the Arrow IPC stream decodes back into a frame
        val lines = t(s, d, "nation").select(concat(
          lit("nation,n_name="), col("n_name"),
          lit(" n_regionkey="), col("n_regionkey").cast("string"), lit("i"),
          lit(" "), col("n_nationkey").cast("string"))).as[String].collect()
        val facade = new graft.server.HttpFacade(s, port = 0)
        try {
          require(graft.server.HttpFacade.postWrite(
            facade.boundPort, "acme", "prod", lines.mkString("\n")) == 204)
          val (cols, rows) = graft.server.HttpFacade.doGet(
            facade.boundPort, "acme_prod",
            """SELECT n_regionkey, count(*) AS n, min(n_name) AS first_name
              FROM nation GROUP BY n_regionkey""")
          require(cols == Seq("n_regionkey", "n", "first_name"))
          rows.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
              r(2).asInstanceOf[String]))
            .toDF("n_regionkey", "n", "first_name")
            .orderBy("n_regionkey")
        } finally facade.stop()
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        CAST(count(*) AS BIGINT) AS n, min(n_name) AS first_name
        FROM nation GROUP BY 1 ORDER BY 1""")),

    ("events_series_funcs",
      (s, d) => {
        // the InfluxQL-layer per-series transforms (difference, derivative,
        // moving_average, cumulative_sum) over raw event series — one
        // exchange by series key, one sort, all four functions in a single
        // Window operator (equal specs collapse)
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        val out = Seq[DataFrame => DataFrame](
          SF.difference(_, Seq("user_id"), "t", "value", "diff"),
          SF.derivative(_, Seq("user_id"), "t", "value", 1000000000L, "deriv_s"),
          SF.movingAverage(_, Seq("user_id"), "t", "value", 3, "mavg3"),
          SF.cumulativeSum(_, Seq("user_id"), "t", "value", "csum"),
          SF.elapsed(_, Seq("user_id"), "t", "elapsed_ns"))
          .foldLeft(ev)((df, f) => f(df))
        out.select(col("user_id"), col("t"), round(col("value"), 6).as("value"),
            round(col("diff"), 6).as("diff"), round(col("deriv_s"), 6).as("deriv_s"),
            round(col("mavg3"), 6).as("mavg3"), round(col("csum"), 6).as("csum"),
            col("elapsed_ns"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE user_id < 5)
        SELECT user_id, t, round(value, 6) AS value,
          round(value - lag(value) OVER win, 6) AS diff,
          round(CASE WHEN CAST(t - lag(t) OVER win AS DOUBLE) > 0
            THEN (value - lag(value) OVER win)
              / (CAST(t - lag(t) OVER win AS DOUBLE) / 1000000000.0) END, 6)
            AS deriv_s,
          round(CASE WHEN count(value) OVER (PARTITION BY user_id ORDER BY t
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 3
            THEN avg(value) OVER (PARTITION BY user_id ORDER BY t
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) END, 6) AS mavg3,
          round(sum(value) OVER (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS csum,
          t - lag(t) OVER win AS elapsed_ns
        FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t)
        ORDER BY user_id, t""")),

    ("events_gapfill_prev",
      (s, d) => {
        // fill(previous) over an hourly per-type count grid: every bucket
        // of January 2024 appears, holes carry the last observed count
        val ev = Tables.events(s, d)
        graft.operators.GapFill.bucketAndFill(ev, Seq("event_type"), "ts_ns",
            startNs = 1704067200000000000L, stopNs = 1706659200000000000L,
            everyNs = 3600000000000L,
            aggs = Seq(count(lit(1)).as("cnt")),
            fills = Map("cnt" -> graft.operators.GapFill.Previous))
          .orderBy("event_type", "ts_ns")
      },
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn FROM events
          WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1706659200000000000),
        agg AS (SELECT event_type,
            tn - ((tn - 1704067200000000000) % 3600000000000) AS ts_ns,
            CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
        grid AS (SELECT event_type, unnest(range(1704067200000000000,
            1706659200000000000, 3600000000000)) AS ts_ns
          FROM (SELECT DISTINCT event_type FROM agg)),
        j AS (SELECT g.event_type, g.ts_ns, a.c
          FROM grid g LEFT JOIN agg a USING (event_type, ts_ns))
        SELECT event_type, ts_ns, last_value(c IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY ts_ns
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
        FROM j ORDER BY 1, 2""")),

    ("events_gapfill_linear",
      (s, d) => {
        // fill(linear) over an hourly per-type mean grid: holes interpolate
        // between the neighboring observed buckets, edges stay NULL
        val ev = Tables.events(s, d)
        // bucket mean via an EXACT decimal sum, then one double division:
        // a plain avg() accumulates in engine-specific order, and at 10x
        // data a bucket's mean can land within float error of the
        // 6-decimal rounding boundary (observed at sf0.1)
        graft.operators.GapFill.bucketAndFill(ev, Seq("event_type"), "ts_ns",
            startNs = 1704067200000000000L, stopNs = 1706659200000000000L,
            everyNs = 3600000000000L,
            aggs = Seq(round(
              sum(col("value").cast("decimal(28,10)")).cast("double")
                / count(lit(1)), 6).as("v")),
            fills = Map("v" -> graft.operators.GapFill.Linear))
          .withColumn("v", round(col("v"), 6))
          .orderBy("event_type", "ts_ns")
      },
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1706659200000000000),
        agg AS (SELECT event_type,
            tn - ((tn - 1704067200000000000) % 3600000000000) AS ts_ns,
            round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE)
              / count(*), 6) AS v FROM e GROUP BY 1, 2),
        grid AS (SELECT event_type, unnest(range(1704067200000000000,
            1706659200000000000, 3600000000000)) AS ts_ns
          FROM (SELECT DISTINCT event_type FROM agg)),
        j AS (SELECT g.event_type, g.ts_ns, a.v
          FROM grid g LEFT JOIN agg a USING (event_type, ts_ns)),
        f AS (SELECT event_type, ts_ns, v,
          last_value(CASE WHEN v IS NOT NULL
              THEN struct_pack(t := ts_ns, v := v) END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY ts_ns
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
          first_value(CASE WHEN v IS NOT NULL
              THEN struct_pack(t := ts_ns, v := v) END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY ts_ns
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
          FROM j)
        SELECT event_type, ts_ns, round(CASE WHEN v IS NOT NULL THEN v
          WHEN p IS NOT NULL AND n IS NOT NULL THEN
            p.v + (n.v - p.v) * CAST(ts_ns - p.t AS DOUBLE)
              / CAST(n.t - p.t AS DOUBLE) END, 6) AS v
        FROM f ORDER BY 1, 2""")),

    ("events_influx_aggs",
      (s, d) => {
        // the InfluxQL aggregate surface over per-user event series:
        // spread/stddev (plain hash aggs), mode with the smallest-value
        // tie-break, nearest-rank percentile(90), trapezoid integral per
        // second. Four small aggregated frames joined on the key — AQE
        // broadcasts every join side
        import graft.functions.{InfluxAggregates => IA}
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"),
            col("event_type"))
        val base = ev.groupBy("user_id").agg(
          round(IA.spread(col("value")), 6).as("spread"),
          round(IA.stddev(col("value")), 6).as("sdev"))
        val md = IA.mode(ev, Seq("user_id"), "event_type", "mode_type")
        val p90 = IA.percentile(ev, Seq("user_id"), "value", 90, "p90")
          .withColumn("p90", round(col("p90"), 6))
        val med = IA.median(ev, Seq("user_id"), "value", "med")
          .withColumn("med", round(col("med"), 6))
        // per-HOUR integral, rounded to 4 decimals: the trapezoid sum's
        // accumulation order differs between engines, so the float error
        // (~1e-10 relative) must sit far below the rounding step
        val ig = IA.integral(ev, Seq("user_id"), "t", "value",
            3600000000000L, "integ")
          .withColumn("integ", round(col("integ"), 4))
        base.join(md, "user_id").join(p90, "user_id").join(med, "user_id")
          .join(ig, "user_id")
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value, event_type
          FROM events),
        base AS (SELECT user_id, round(max(value) - min(value), 6) AS spread,
            round(stddev_samp(value), 6) AS sdev FROM e GROUP BY 1),
        mc AS (SELECT user_id, event_type, count(*) AS n FROM e GROUP BY 1, 2),
        md AS (SELECT user_id, event_type AS mode_type FROM (
          SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id
            ORDER BY n DESC, event_type ASC) AS rk FROM mc) WHERE rk = 1),
        pr AS (SELECT user_id, value,
            row_number() OVER (PARTITION BY user_id ORDER BY value) AS rk,
            count(*) OVER (PARTITION BY user_id) AS n
          FROM e WHERE value IS NOT NULL),
        p90 AS (SELECT user_id, round(value, 6) AS p90 FROM pr
          WHERE rk = CAST(floor(0.9 * n + 0.5) AS BIGINT)),
        med AS (SELECT user_id, round(avg(value), 6) AS med FROM pr
          WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2 GROUP BY user_id),
        ig AS (SELECT user_id, round(coalesce(
            sum((value + pv) / 2 * (t - pt) / 3600000000000.0), 0), 4) AS integ
          FROM (SELECT user_id, t, value, lag(value) OVER w AS pv,
              lag(t) OVER w AS pt FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY t)) GROUP BY user_id)
        SELECT user_id, spread, sdev, mode_type, p90, med, integ
        FROM base JOIN md USING (user_id) JOIN p90 USING (user_id)
          JOIN med USING (user_id) JOIN ig USING (user_id)
        ORDER BY user_id""")),

    ("events_top_points",
      (s, d) => {
        // InfluxQL top(value, 3) per series: the 3 largest points per
        // user WITH timestamps, ties to the earlier point — one window
        // rank over the series partitioning (no global sort of raw data)
        import graft.functions.{InfluxAggregates => IA}
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value"), 6).as("value"))
        IA.topN(ev, Seq("user_id"), "t", "value", 3)
          .orderBy(col("user_id"), col("value").desc, col("t"))
      },
      Some("""SELECT user_id, t, value FROM (
          SELECT user_id, epoch_ns(ts) AS t, round(value, 6) AS value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY round(value, 6) DESC, epoch_ns(ts) ASC) AS rk
          FROM events WHERE value IS NOT NULL) x
        WHERE rk <= 3 ORDER BY user_id, value DESC, t""")),

    ("events_ema",
      (s, d) => {
        // the sequential-recursion series transform: mapPartitions linear
        // scan per series; the oracle replays the same recursion with a
        // recursive CTE stepping one row-number rank at a time. Identical
        // per-step IEEE arithmetic on both engines -> bit-equal results
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.exponentialMovingAverage(ev, Seq("user_id"), "t", "value",
            alpha = 0.25, "ema")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("ema"), 6).as("ema"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS ema FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn, 0.25 * e.value + 0.75 * r.ema
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t, round(ema, 6) AS ema FROM r
        ORDER BY user_id, t""")),

    ("events_dema_tema",
      (s, d) => {
        // DEMA + TEMA from ONE scan: the three chained EMA recursions all
        // carry O(1) state, so they share a single shuffle + sort + pass.
        // The oracle inlines the identical update chain into one recursive
        // CTE -> identical per-step IEEE arithmetic, bit-equal results
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.demaTema(ev, Seq("user_id"), "t", "value", alpha = 0.25,
            "dema", "tema")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("dema"), 6).as("dema"), round(col("tema"), 6).as("tema"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS e1, value AS e2, value AS e3
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            0.25 * e.value + 0.75 * r.e1,
            0.25 * (0.25 * e.value + 0.75 * r.e1) + 0.75 * r.e2,
            0.25 * (0.25 * (0.25 * e.value + 0.75 * r.e1) + 0.75 * r.e2)
              + 0.75 * r.e3
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t, round(2 * e1 - e2, 6) AS dema,
          round(3 * e1 - 3 * e2 + e3, 6) AS tema
        FROM r ORDER BY user_id, t""")),

    ("events_cmo_ker",
      (s, d) => {
        // window-frame pair: Chande momentum + Kaufman efficiency ratio
        // over the last 7 changes — both ride the one shared Window spec
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        val c = SF.chandeMomentumOscillator(ev, Seq("user_id"), "t", "value",
          n = 7, "cmo")
        SF.kaufmanEfficiencyRatio(c, Seq("user_id"), "t", "value", n = 7, "ker")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("cmo"), 6).as("cmo"), round(col("ker"), 6).as("ker"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE user_id < 5),
        d AS (SELECT user_id, t, value,
            value - lag(value) OVER (PARTITION BY user_id ORDER BY t) AS ch,
            lag(value, 7) OVER (PARTITION BY user_id ORDER BY t) AS v7
          FROM e),
        w AS (SELECT user_id, t, ch, value, v7,
            sum(greatest(ch, 0)) OVER fr AS up,
            sum(greatest(-ch, 0)) OVER fr AS dn,
            sum(abs(ch)) OVER fr AS vol,
            count(ch) OVER fr AS nch
          FROM d WINDOW fr AS (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT user_id, t,
          round(CASE WHEN nch = 7 THEN CASE WHEN up + dn = 0 THEN 0.0
            ELSE 100.0 * (up - dn) / (up + dn) END END, 6) AS cmo,
          round(CASE WHEN nch = 7 THEN CASE WHEN vol = 0 THEN 0.0
            ELSE abs(value - v7) / vol END END, 6) AS ker
        FROM w ORDER BY user_id, t""")),

    ("events_rsi",
      (s, d) => {
        // Wilder RSI: mean of the first 7 changes seeds the smoothing
        // recursion; the oracle carries the same running seed sums and
        // smoothed averages through one recursive CTE, step for step
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.relativeStrengthIndex(ev, Seq("user_id"), "t", "value", n = 7, "rsi")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("rsi"), 6).as("rsi"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS prev,
            CAST(0 AS DOUBLE) AS sg, CAST(0 AS DOUBLE) AS sl,
            CAST(0 AS DOUBLE) AS ag, CAST(0 AS DOUBLE) AS al
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn, e.value,
            r.sg + greatest(e.value - r.prev, 0),
            r.sl + greatest(-(e.value - r.prev), 0),
            CASE WHEN e.rn < 8 THEN 0.0
              WHEN e.rn = 8 THEN (r.sg + greatest(e.value - r.prev, 0)) / 7
              ELSE (r.ag * 6 + greatest(e.value - r.prev, 0)) / 7 END,
            CASE WHEN e.rn < 8 THEN 0.0
              WHEN e.rn = 8 THEN (r.sl + greatest(-(e.value - r.prev), 0)) / 7
              ELSE (r.al * 6 + greatest(-(e.value - r.prev), 0)) / 7 END
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t, round(CASE WHEN rn >= 8 THEN
            CASE WHEN al = 0 THEN 100.0 ELSE 100 - 100 / (1 + ag / al) END
          END, 6) AS rsi
        FROM r ORDER BY user_id, t""")),

    ("events_kama",
      (s, d) => {
        // Kaufman adaptive MA: the efficiency ratio modulates the
        // smoothing constant per point. The oracle precomputes er/sc with
        // window functions (they depend only on the trailing 7 changes)
        // and carries ONLY the kama recursion through the recursive CTE
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.kaufmanAdaptiveMovingAverage(ev, Seq("user_id"), "t", "value",
            n = 7, "kama")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("kama"), 6).as("kama"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        d AS (SELECT user_id, t, value, rn,
            value - lag(value) OVER (PARTITION BY user_id ORDER BY rn) AS ch,
            lag(value, 7) OVER (PARTITION BY user_id ORDER BY rn) AS v7
          FROM e),
        w AS (SELECT user_id, t, value, rn, v7,
            sum(abs(ch)) OVER (PARTITION BY user_id ORDER BY rn
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS vol
          FROM d),
        s AS (SELECT user_id, t, value, rn,
            CASE WHEN vol = 0 THEN 0.0 ELSE abs(value - v7) / vol END
              * (2.0 / 3.0 - 2.0 / 31.0) + 2.0 / 31.0 AS sc
          FROM w),
        r AS (SELECT user_id, t, rn, value AS kama FROM s WHERE rn = 8
          UNION ALL
          SELECT s.user_id, s.t, s.rn,
            r.kama + s.sc * s.sc * (s.value - r.kama)
          FROM s JOIN r ON s.user_id = r.user_id AND s.rn = r.rn + 1)
        SELECT e.user_id, e.t, round(r.kama, 6) AS kama
        FROM e LEFT JOIN r ON e.user_id = r.user_id AND e.rn = r.rn
        ORDER BY e.user_id, e.t""")),

    ("events_trix",
      (s, d) => {
        // TRIX: percent change of a triple-smoothed EMA (alpha = 0.25 for
        // n=7 — exactly representable, so the recursions are bit-stable).
        // The oracle chains the same three EMA updates through one
        // recursive CTE and lags e3 for the percent step
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.tripleExponentialDerivative(ev, Seq("user_id"), "t", "value",
            n = 7, "trix")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("trix"), 6).as("trix"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS e1, value AS e2, value AS e3
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            0.25 * e.value + 0.75 * r.e1,
            0.25 * (0.25 * e.value + 0.75 * r.e1) + 0.75 * r.e2,
            0.25 * (0.25 * (0.25 * e.value + 0.75 * r.e1) + 0.75 * r.e2)
              + 0.75 * r.e3
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t, round(CASE WHEN lag_e3 <> 0
            THEN 100.0 * (e3 - lag_e3) / lag_e3 END, 6) AS trix
        FROM (SELECT user_id, t, e3,
            lag(e3) OVER (PARTITION BY user_id ORDER BY t) AS lag_e3 FROM r)
        ORDER BY user_id, t""")),

    ("events_anomaly",
      (s, d) => {
        // rolling z-score anomaly flags: |v − mean₁₂| > 3σ over the 12
        // TRAILING points (current excluded); the whole test is integer
        // cents — (v·n − s)² > 9·(n·ss − s²) — no float compare at all
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        SF.anomalyFlags(ev, Seq("user_id"), "t", "cents",
            n = 12, sigmas = 3, "anom")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("cents"), col("anom"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 5),
        w AS (SELECT user_id, t, cents,
            sum(cents) OVER fr AS s, sum(cents * cents) OVER fr AS ss,
            count(cents) OVER fr AS n
          FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING))
        SELECT user_id, t, cents,
          CASE WHEN n = 12 THEN
            (cents * n - s) * (cents * n - s) > 9 * (n * ss - s * s)
          END AS anom
        FROM w ORDER BY user_id, t""")),

    ("events_timed_mavg",
      (s, d) => {
        // Flux timedMovingAverage: trailing-6h RANGE window (irregular
        // sampling makes row windows lie). value quantizes to integer
        // cents so the window mean is one exact division per point
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        SF.timedMovingAverage(ev, Seq("user_id"), "t", "cents",
            windowNs = 21600000000000L, "tm")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("tm") / 100.0, 6).as("tmavg"))
          .orderBy("user_id", "t")
      },
      Some("""SELECT user_id, epoch_ns(ts) AS t,
          round(avg(CAST(round(value * 100) AS BIGINT)) OVER
            (PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 21599999999999 PRECEDING AND CURRENT ROW)
            / 100.0, 6) AS tmavg
        FROM events WHERE user_id < 5
        ORDER BY user_id, t""")),

    ("events_seasonal",
      (s, d) => {
        // classical additive decomposition at daily period over the 6h
        // downsample: trend = centered 2xMA-4, seasonal = phase mean of
        // the micro-quantized detrended points, remainder = the rest.
        // All float expressions are fixed-arity per-row formulas; every
        // accumulation is an exact integer sum
        import graft.functions.{SeriesFunctions => SF}
        val bucket = 21600000000000L
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"),
            (col("ts_ns") - pmod(col("ts_ns"), lit(bucket))).as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        val series = ev.groupBy("user_id", "t")
          .agg((sum("cents").cast("double") / count(lit(1))).as("v"))
        SF.seasonalDecompose(series, Seq("user_id"), "t", "v", period = 4,
            phase = pmod(expr(s"t div $bucket"), lit(4L)))
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("v") / 100.0, 6).as("mean"),
            round(col("trend") / 100.0, 6).as("trend"),
            round(col("seasonal") / 100.0, 6).as("seasonal"),
            round(col("remainder") / 100.0, 6).as("remainder"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_ns(ts) - epoch_ns(ts) % 21600000000000 AS t,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 5),
        b AS (SELECT user_id, t, CAST(sum(cents) AS DOUBLE) / count(*) AS v
          FROM e GROUP BY 1, 2),
        w AS (SELECT user_id, t, v,
            (0.5 * lag(v, 2) OVER s + lag(v, 1) OVER s + v
              + lead(v, 1) OVER s + 0.5 * lead(v, 2) OVER s) / 4 AS trend,
            (t // 21600000000000) % 4 AS ph
          FROM b WINDOW s AS (PARTITION BY user_id ORDER BY t)),
        d AS (SELECT *, CAST(round((v - trend) * 1000000) AS BIGINT) AS dq
          FROM w),
        sz AS (SELECT user_id, ph, CAST(sum(dq) AS DOUBLE) / count(dq) AS sq
          FROM d GROUP BY 1, 2),
        j AS (SELECT d.user_id, d.t, d.v, d.trend,
            sz.sq / 1000000.0 AS seasonal
          FROM d LEFT JOIN sz ON sz.user_id = d.user_id AND sz.ph = d.ph)
        SELECT user_id, t, round(v / 100.0, 6) + 0 AS mean,
          round(trend / 100.0, 6) + 0 AS trend,
          round(seasonal / 100.0, 6) + 0 AS seasonal,
          round((v - trend - seasonal) / 100.0, 6) + 0 AS remainder
        FROM j ORDER BY user_id, t""")),

    ("events_seasonal_anomaly",
      (s, d) => {
        // seasonality-aware anomaly flags: a point is anomalous when its
        // DECOMPOSITION REMAINDER deviates > 3σ from the series' mean
        // remainder — catches "unusual for this phase" where a raw
        // z-score sees a normal absolute level. Remainders micro-quantize
        // to integers, so the test is the exact integer
        // cross-multiplication (r·n − s)² > 9·(n·ss − s²) — no float
        // compare; window-edge rows (no trend) flag NULL
        import graft.functions.{SeriesFunctions => SF}
        val bucket = 21600000000000L
        val dec = "decimal(38,0)"
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"),
            (col("ts_ns") - pmod(col("ts_ns"), lit(bucket))).as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        val series = ev.groupBy("user_id", "t")
          .agg((sum("cents").cast("double") / count(lit(1))).as("v"))
        // milli-cent quantization: remainders reach ~1.4e4 cents (rq
        // ~1.4e7); the squares are summed in decimal(38,0) — NOT long —
        // so neither the window sums (rq² ~2e14 would overflow a long
        // sum at ~46k buckets/series) nor the final cross-multiplied
        // squares can wrap at any per-series bucket count
        val rem = SF.seasonalDecompose(series, Seq("user_id"), "t", "v",
            period = 4, phase = pmod(expr(s"t div $bucket"), lit(4L)))
          .withColumn("rq",
            floor(col("remainder") * lit(1e3) + lit(0.5)).cast("long"))
        val byU = Window.partitionBy(col("user_id"))
        val flagged = rem
          .withColumn("n", count(col("rq")).over(byU))
          .withColumn("sS", sum(col("rq").cast(dec)).over(byU))
          .withColumn("ss", sum(col("rq").cast(dec) * col("rq").cast(dec)).over(byU))
          .withColumn("diff",
            col("rq").cast(dec) * col("n").cast(dec) - col("sS"))
          .withColumn("anom", when(col("rq").isNotNull && col("n") >= 8,
            col("diff") * col("diff") >
            lit(9) * (col("n").cast(dec) * col("ss") -
              col("sS") * col("sS"))))
        flagged.select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("remainder") / 100.0, 6).as("remainder"),
            col("anom"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_ns(ts) - epoch_ns(ts) % 21600000000000 AS t,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 5),
        b AS (SELECT user_id, t, CAST(sum(cents) AS DOUBLE) / count(*) AS v
          FROM e GROUP BY 1, 2),
        w AS (SELECT user_id, t, v,
            (0.5 * lag(v, 2) OVER s + lag(v, 1) OVER s + v
              + lead(v, 1) OVER s + 0.5 * lead(v, 2) OVER s) / 4 AS trend,
            (t // 21600000000000) % 4 AS ph
          FROM b WINDOW s AS (PARTITION BY user_id ORDER BY t)),
        dd AS (SELECT *, CAST(round((v - trend) * 1000000) AS BIGINT) AS dq
          FROM w),
        sz AS (SELECT user_id, ph, CAST(sum(dq) AS DOUBLE) / count(dq) AS sq
          FROM dd GROUP BY 1, 2),
        j AS (SELECT dd.user_id, dd.t,
            dd.v - dd.trend - sz.sq / 1000000.0 AS remainder
          FROM dd LEFT JOIN sz ON sz.user_id = dd.user_id AND sz.ph = dd.ph),
        q AS (SELECT user_id, t, remainder,
            CAST(floor(remainder * 1000.0 + 0.5) AS BIGINT) AS rq
          FROM j),
        g AS (SELECT user_id, t, remainder, rq,
            CAST(count(rq) OVER u AS HUGEINT) AS n,
            CAST(sum(rq) OVER u AS HUGEINT) AS sS,
            CAST(sum(rq * rq) OVER u AS HUGEINT) AS ss
          FROM q WINDOW u AS (PARTITION BY user_id))
        SELECT user_id, t,
          round(remainder / 100.0, 6) + 0 AS remainder,
          CASE WHEN rq IS NOT NULL AND n >= 8 THEN
            (rq * n - sS) * (rq * n - sS) > 9 * (n * ss - sS * sS)
          END AS anom
        FROM g ORDER BY user_id, t""")),

    ("events_lttb",
      (s, d) => {
        // true LTTB (Steinarsson 2013): sequential per-series recursion —
        // each 2-day bucket keeps the point forming the largest triangle
        // with the PREVIOUS selection and the next bucket's average;
        // first/last always survive. Values pre-quantized to cents so the
        // cross-multiplied doubled areas are exact integers; the oracle
        // replays the recursion with correlated argmax subqueries
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 8)
          .select(col("user_id"), col("ts_ns").as("t"),
            floor(col("value") * 100 + 0.5).cast("double").as("vc"))
        SF.lttbDownsample(ev, Seq("user_id"), "t", "vc",
            bucketNs = 172800000000000L)
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            (col("vc") / lit(100.0)).as("value"), col("endpoint"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE pts AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn,
            count(*) OVER (PARTITION BY user_id) AS n
          FROM events WHERE user_id < 8),
        fp AS (SELECT user_id, t, v FROM pts WHERE rn = 1),
        lp AS (SELECT user_id, t, v FROM pts WHERE rn = n AND n >= 2),
        cand AS (SELECT user_id, t, v,
            dense_rank() OVER (PARTITION BY user_id
              ORDER BY t // 172800000000000) - 1 AS bi
          FROM pts WHERE rn > 1 AND rn < n),
        na AS (SELECT user_id, bi, sum(t // 1000) AS st, sum(v) AS sv,
            CAST(count(*) AS BIGINT) AS nn FROM cand GROUP BY 1, 2),
        mx AS (SELECT user_id, max(bi) AS mb FROM cand GROUP BY 1),
        candx AS (SELECT c.user_id, c.bi, c.t, c.v,
            CAST(coalesce(na.st, lp.t // 1000) AS HUGEINT) AS nst,
            CAST(coalesce(na.sv, lp.v) AS HUGEINT) AS nsv,
            CAST(coalesce(na.nn, 1) AS HUGEINT) AS nn
          FROM cand c
          LEFT JOIN na ON na.user_id = c.user_id AND na.bi = c.bi + 1
          JOIN lp ON lp.user_id = c.user_id),
        sel(user_id, step, t, v) AS (
          SELECT user_id, -1, t, v FROM fp
          UNION ALL
          SELECT s.user_id, s.step + 1,
            (SELECT c.t FROM candx c
              WHERE c.user_id = s.user_id AND c.bi = s.step + 1
              ORDER BY abs((CAST(s.t // 1000 AS HUGEINT) * c.nn - c.nst)
                  * (c.v - s.v)
                - CAST(s.t // 1000 - c.t // 1000 AS HUGEINT)
                  * (c.nsv - CAST(s.v AS HUGEINT) * c.nn)) DESC,
                c.t ASC, c.v ASC LIMIT 1),
            (SELECT c.v FROM candx c
              WHERE c.user_id = s.user_id AND c.bi = s.step + 1
              ORDER BY abs((CAST(s.t // 1000 AS HUGEINT) * c.nn - c.nst)
                  * (c.v - s.v)
                - CAST(s.t // 1000 - c.t // 1000 AS HUGEINT)
                  * (c.nsv - CAST(s.v AS HUGEINT) * c.nn)) DESC,
                c.t ASC, c.v ASC LIMIT 1)
          FROM sel s JOIN mx ON mx.user_id = s.user_id
          WHERE s.step + 1 <= mx.mb)
        SELECT user_id, t, v / 100.0 AS value, endpoint FROM (
          SELECT user_id, t, v, TRUE AS endpoint FROM fp
          UNION ALL SELECT user_id, t, v, FALSE FROM sel WHERE step >= 0
          UNION ALL SELECT user_id, t, v, TRUE FROM lp)
        ORDER BY user_id, t""")),

    ("events_m4",
      (s, d) => {
        // M4 downsampling (Jugel et al., VLDB 2014): min/max/first/last
        // per pixel bucket — the error-free line-chart reduction; one
        // hash aggregate, selectors as single-pass lexicographic struct
        // extremes (the Selectors discipline), no window sorts
        val bucket = 21600000000000L
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"),
            (col("ts_ns") - pmod(col("ts_ns"), lit(bucket))).as("t"),
            col("ts_ns"), col("value"))
        ev.groupBy("user_id", "t")
          .agg(min("value").as("vmin"), max("value").as("vmax"),
            min(struct(col("ts_ns"), col("value"))).as("__f"),
            max(struct(col("ts_ns"), col("value"))).as("__l"))
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("vmin"), col("vmax"),
            col("__f.value").as("vfirst"), col("__l.value").as("vlast"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS tn, value
          FROM events WHERE user_id < 5),
        b AS (SELECT user_id, tn - tn % 21600000000000 AS t, tn, value
          FROM e),
        a AS (SELECT user_id, t, min(value) AS vmin, max(value) AS vmax
          FROM b GROUP BY 1, 2),
        f AS (SELECT user_id, t, value AS vfirst FROM (SELECT *,
            row_number() OVER (PARTITION BY user_id, t
              ORDER BY tn, value) AS rk FROM b) WHERE rk = 1),
        l AS (SELECT user_id, t, value AS vlast FROM (SELECT *,
            row_number() OVER (PARTITION BY user_id, t
              ORDER BY tn DESC, value DESC) AS rk FROM b) WHERE rk = 1)
        SELECT a.user_id, a.t, a.vmin, a.vmax, f.vfirst, l.vlast
        FROM a JOIN f USING (user_id, t) JOIN l USING (user_id, t)
        ORDER BY a.user_id, a.t""")),

    ("events_cusum",
      (s, d) => {
        // Page's tabular CUSUM on integer cents (target 50.00, slack
        // 1.00, decision threshold 20.00): sustained small shifts
        // accumulate where the point-wise z-score never fires. The whole
        // recursion is integer arithmetic — the oracle replays it as a
        // recursive CTE on BIGINTs, step for step
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        SF.cusum(ev, Seq("user_id"), "t", "cents",
            target = 5000.0, slack = 100.0, threshold = 2000.0)
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("cusum_pos").cast("long").as("cusum_pos"),
            col("cusum_neg").cast("long").as("cusum_neg"), col("alarm"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(round(value * 100) AS BIGINT) AS c,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn,
            greatest(0, c - 5100) AS sp, greatest(0, 4900 - c) AS sn
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            greatest(0, r.sp + e.c - 5100), greatest(0, r.sn + 4900 - e.c)
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t, sp AS cusum_pos, sn AS cusum_neg,
          (sp > 2000 OR sn > 2000) AS alarm
        FROM r ORDER BY user_id, t""")),

    ("events_interval_join",
      (s, d) => {
        // impression->conversion attribution: purchases joined to the
        // views they follow within 1h per user — the BATCH run of the
        // stream-stream interval join (identical Catalyst condition;
        // StreamingSpec asserts the batch≡streaming parity)
        val ev = Tables.events(s, d).filter(col("user_id") < 50)
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("view_ts"),
            col("ts_ns").as("view_ns"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("buy_ts"),
            col("ts_ns").as("buy_ns"),
            round(col("value") * 100).cast("long").as("buy_cents"))
        graft.streaming.StreamJoin.intervalJoin(views, buys, "user_id",
            "view_ts", "buy_ts", horizon = "6 hours")
          .select(col("user_id").cast("long").as("user_id"),
            col("view_ns"), col("buy_ns"), col("buy_cents"))
          .orderBy("user_id", "view_ns", "buy_ns")
      },
      Some("""WITH v AS (SELECT user_id, epoch_ns(ts) AS view_ns FROM events
          WHERE user_id < 50 AND event_type = 'view'),
        b AS (SELECT user_id, epoch_ns(ts) AS buy_ns,
            CAST(round(value * 100) AS BIGINT) AS buy_cents FROM events
          WHERE user_id < 50 AND event_type = 'purchase')
        SELECT v.user_id, v.view_ns, b.buy_ns, b.buy_cents
        FROM v JOIN b ON b.user_id = v.user_id
          AND b.buy_ns >= v.view_ns
          AND b.buy_ns <= v.view_ns + 21600000000000
        ORDER BY v.user_id, view_ns, buy_ns""")),

    ("events_state_count",
      (s, d) => {
        // Flux stateCount + stateDuration: threshold-streak tracking per
        // user; all-integer window math, the duration in whole seconds
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        val pred = col("value") > 50.0
        val c = SF.stateCount(ev, Seq("user_id"), "t", pred, "in_state")
        SF.stateDuration(c, Seq("user_id"), "t", pred,
            unitNs = 1000000000L, "state_secs")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("in_state"), col("state_secs"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE user_id < 5),
        r0 AS (SELECT user_id, t, value,
            row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
          FROM e),
        r AS (SELECT user_id, t, value, rn,
            sum(CASE WHEN value > 50.0 THEN 0 ELSE 1 END) OVER upto AS sid,
            max(CASE WHEN NOT value > 50.0 THEN rn END) OVER upto AS lastf
          FROM r0 WINDOW upto AS (PARTITION BY user_id ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        d AS (SELECT user_id, t, value, rn, sid, lastf,
            min(CASE WHEN value > 50.0 THEN t END) OVER
              (PARTITION BY user_id, sid ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0
          FROM r)
        SELECT user_id, t,
          CASE WHEN value > 50.0 THEN rn - coalesce(lastf, 0)
            ELSE -1 END AS in_state,
          CASE WHEN value > 50.0 THEN (t - t0) // 1000000000
            ELSE -1 END AS state_secs
        FROM d ORDER BY user_id, t""")),

    ("events_holt",
      (s, d) => {
        // Holt linear-trend smoothing (the seasonless core of InfluxQL
        // HOLT_WINTERS; α/β explicit so the recursion is deterministic).
        // α=0.5, β=0.25 are exactly representable, so the per-step IEEE
        // arithmetic is bit-identical to the oracle's recursive CTE
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.holtLinear(ev, Seq("user_id"), "t", "value",
            alpha = 0.5, beta = 0.25, "holt")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("holt"), 6).as("holt"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS l, CAST(0 AS DOUBLE) AS b
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            CASE WHEN e.rn = 2 THEN e.value
              ELSE 0.5 * e.value + 0.5 * (r.l + r.b) END,
            CASE WHEN e.rn = 2 THEN e.value - r.l
              ELSE 0.25 * ((0.5 * e.value + 0.5 * (r.l + r.b)) - r.l)
                + 0.75 * r.b END
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        SELECT user_id, t,
          round(CASE WHEN rn >= 2 THEN l + b END, 6) AS holt
        FROM r ORDER BY user_id, t""")),

    ("events_holt_forecast",
      (s, d) => {
        // HOLT_WINTERS(…, 5, 0)-style forecast: run the level/trend
        // recursion to each series' end, then project 5 hourly points
        // l + h·b. Corpus cost = one scan; the explode is over the
        // series-count-sized final-state frame, not the data
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.holtForecast(ev, Seq("user_id"), "t", "value",
            alpha = 0.5, beta = 0.25, n = 5, stepNs = 3600000000000L, "holt")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            round(col("holt"), 6).as("holt"))
          .orderBy("user_id", "t")
      },
      Some("""WITH RECURSIVE e AS (SELECT user_id, epoch_ns(ts) AS t, value,
            row_number() OVER (PARTITION BY user_id
              ORDER BY epoch_ns(ts)) AS rn
          FROM events WHERE user_id < 5),
        r AS (SELECT user_id, t, rn, value AS l, CAST(0 AS DOUBLE) AS b
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            CASE WHEN e.rn = 2 THEN e.value
              ELSE 0.5 * e.value + 0.5 * (r.l + r.b) END,
            CASE WHEN e.rn = 2 THEN e.value - r.l
              ELSE 0.25 * ((0.5 * e.value + 0.5 * (r.l + r.b)) - r.l)
                + 0.75 * r.b END
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1),
        last AS (SELECT user_id, max(rn) AS mrn FROM r GROUP BY 1),
        fin AS (SELECT r.user_id, r.t, r.l, r.b FROM r
          JOIN last ON r.user_id = last.user_id AND r.rn = last.mrn
          WHERE last.mrn >= 2)
        SELECT fin.user_id, fin.t + h * 3600000000000 AS t,
          round(fin.l + h * fin.b, 6) AS holt
        FROM fin CROSS JOIN (SELECT unnest(range(1, 6)) AS h)
        ORDER BY user_id, t""")),

    ("events_forecast_backtest",
      (s, d) => {
        // the eval beside the forecaster: hold out each series' last 4
        // buckets, fit Holt on the rest, score the forecasts against the
        // held-out actuals as per-user sMAPE. Values are integer bucket
        // counts and α/β are dyadic, so the recursion is the same IEEE
        // sequence in both engines; each per-point sMAPE is
        // micro-quantized BEFORE the mean (exact integer sum, one
        // division) — the ANN-recall discipline applied to forecasting
        import graft.functions.{SeriesFunctions => SF}
        val bucket = 21600000000000L
        val b = Tables.events(s, d).filter(col("user_id") < 10)
          .groupBy(col("user_id"), expr("ts_ns div 21600000000000").as("hr"))
          .agg(count(lit(1)).cast("double").as("v"))
          .select(col("user_id"), (col("hr") * bucket).as("t"), col("v"))
        val byU = Window.partitionBy(col("user_id"))
        val ranked = b
          .withColumn("rn", row_number().over(byU.orderBy(col("t"))))
          .withColumn("nn", count(lit(1)).over(byU))
        val train = ranked.filter(col("rn") <= col("nn") - 4 && col("nn") >= 6)
          .select(col("user_id"), col("t"), col("v"))
        val fc = SF.holtForecast(train, Seq("user_id"), "t", "v",
            alpha = 0.5, beta = 0.25, n = 4, stepNs = bucket, "f")
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("f"))
        val sm = fc
          .join(b.select(col("user_id"), col("t"), col("v").as("a")),
            Seq("user_id", "t"))
          .select(col("user_id"),
            floor(lit(2.0) * abs(col("f") - col("a"))
              / (abs(col("f")) + abs(col("a"))) * lit(1000000) + lit(0.5))
              .cast("long").as("m"))
        sm.groupBy("user_id")
          .agg(count(lit(1)).as("n_eval"), sum("m").as("s"))
          .select(col("user_id"), col("n_eval"),
            round(col("s") / col("n_eval") / lit(1000000.0), 6).as("smape"))
          .orderBy("user_id")
      },
      Some("""WITH RECURSIVE bk AS (SELECT user_id,
            epoch_ns(ts) // 21600000000000 AS hr,
            CAST(count(*) AS DOUBLE) AS v
          FROM events WHERE user_id < 10 GROUP BY 1, 2),
        e0 AS (SELECT user_id, hr * 21600000000000 AS t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY hr) AS rn,
            count(*) OVER (PARTITION BY user_id) AS nn
          FROM bk),
        e AS (SELECT user_id, t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn
          FROM e0 WHERE rn <= nn - 4 AND nn >= 6),
        r AS (SELECT user_id, t, rn, v AS l, CAST(0 AS DOUBLE) AS b
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.t, e.rn,
            CASE WHEN e.rn = 2 THEN e.v
              ELSE 0.5 * e.v + 0.5 * (r.l + r.b) END,
            CASE WHEN e.rn = 2 THEN e.v - r.l
              ELSE 0.25 * ((0.5 * e.v + 0.5 * (r.l + r.b)) - r.l)
                + 0.75 * r.b END
          FROM e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1),
        last AS (SELECT user_id, max(rn) AS mrn FROM r GROUP BY 1),
        fin AS (SELECT r.user_id, r.t, r.l, r.b FROM r
          JOIN last ON r.user_id = last.user_id AND r.rn = last.mrn
          WHERE last.mrn >= 2),
        fc AS (SELECT fin.user_id, fin.t + h * 21600000000000 AS t,
            fin.l + h * fin.b AS f
          FROM fin CROSS JOIN (SELECT unnest(range(1, 5)) AS h)),
        j AS (SELECT fc.user_id, fc.f, a.v AS a
          FROM fc JOIN e0 a ON a.user_id = fc.user_id AND a.t = fc.t),
        sm AS (SELECT user_id, CAST(floor(2.0 * abs(f - a)
            / (abs(f) + abs(a)) * 1000000 + 0.5) AS BIGINT) AS m
          FROM j)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_eval,
          round(sum(m) / count(*) / 1000000.0, 6) AS smape
        FROM sm GROUP BY 1 ORDER BY 1""")),

    ("events_holt_seasonal",
      (s, d) => {
        // seasonal HOLT_WINTERS(…, 4, 4)-style triple smoothing over 6h
        // activity counts (period = 4 buckets = daily cycle): classical
        // init, S-slot ring recursion, 4 forecast points. All-dyadic
        // α=β=γ=0.5 over integer counts → every step is exact binary,
        // so the oracle's recursive CTE (ring carried as a LIST column)
        // reproduces the doubles bit-for-bit — no rounding needed
        import graft.functions.{SeriesFunctions => SF}
        val step = 21600000000000L
        val ev = Tables.events(s, d).filter(col("user_id") < 3)
          .groupBy(col("user_id"),
            (col("ts_ns") - pmod(col("ts_ns"), lit(step))).as("t"))
          .agg(count(lit(1)).cast("double").as("v"))
        val (fit, fc) = SF.holtSeasonal(ev, Seq("user_id"), "t", "v",
          alpha = 0.5, beta = 0.5, gamma = 0.5, n = 4, season = 4,
          stepNs = step, "hw")
        fit.withColumn("phase", lit("fit"))
          .unionByName(fc.withColumn("phase", lit("forecast")))
          .select(col("user_id").cast("long").as("user_id"), col("t"),
            col("phase"), col("hw"))
          .orderBy("user_id", "t", "phase")
      },
      Some("""WITH RECURSIVE b AS (SELECT user_id,
            (epoch_ns(ts) // 21600000000000) * 21600000000000 AS t,
            CAST(count(*) AS DOUBLE) AS v
          FROM events WHERE user_id < 3 GROUP BY 1, 2),
        e AS (SELECT user_id, t, v,
            row_number() OVER (PARTITION BY user_id ORDER BY t) AS rn,
            count(*) OVER (PARTITION BY user_id) AS cnt FROM b),
        w AS (SELECT user_id, list(v ORDER BY rn) AS vs,
            list(t ORDER BY rn) AS ts, max(cnt) AS cnt
          FROM e GROUP BY user_id),
        init AS (SELECT user_id, vs, ts, cnt,
            (((vs[1] + vs[2]) + vs[3]) + vs[4]) / 4 AS m1,
            (((vs[5] + vs[6]) + vs[7]) + vs[8]) / 4 AS m2
          FROM w WHERE cnt >= 8),
        r AS (SELECT user_id, vs, ts, cnt, 4 AS rn,
            m1 AS l, (m2 - m1) / 4 AS b,
            [vs[1] - m1, vs[2] - m1, vs[3] - m1, vs[4] - m1] AS ring,
            CAST(NULL AS DOUBLE) AS fit
          FROM init
          UNION ALL
          SELECT user_id, vs, ts, cnt, rn + 1,
            0.5 * (vs[rn + 1] - ring[(rn % 4) + 1]) + 0.5 * (l + b),
            0.5 * ((0.5 * (vs[rn + 1] - ring[(rn % 4) + 1])
              + 0.5 * (l + b)) - l) + 0.5 * b,
            ring[1:(rn % 4)]
              || [0.5 * (vs[rn + 1] - (0.5 * (vs[rn + 1] - ring[(rn % 4) + 1])
                   + 0.5 * (l + b))) + 0.5 * ring[(rn % 4) + 1]]
              || ring[(rn % 4) + 2:4],
            l + b + ring[(rn % 4) + 1]
          FROM r WHERE rn < cnt),
        fits AS (SELECT user_id, ts[rn] AS t, 'fit' AS phase, fit AS hw
          FROM r WHERE rn >= 5),
        fin AS (SELECT * FROM r WHERE rn = cnt),
        fc AS (SELECT user_id, ts[cnt] + h * 21600000000000 AS t,
            'forecast' AS phase,
            l + h * b + ring[((cnt - 1 + h) % 4) + 1] AS hw
          FROM fin CROSS JOIN (SELECT unnest(range(1, 5)) AS h))
        SELECT * FROM fits UNION ALL SELECT * FROM fc
        ORDER BY user_id, t, phase""")),

    ("events_correlation",
      (s, d) => {
        // Flux cov()/pearsonr(): align two measurement streams on a 6h
        // bucket (integer `div` — ns timestamps overflow double mantissas)
        // and correlate per key. `value` is an exact 2-decimal quantity, so
        // the whole statistic is computed on integer cents: bucket totals
        // and the co-moment sums n·Σvc−Σv·Σc are EXACT (order-free — the
        // built-in corr/covar co-moment aggregates accumulate doubles in
        // partition order and bucket totals here land exactly on rounding
        // boundaries). Products ride decimal(38) (DuckDB: HUGEINT) so the
        // shape survives 100 TB row counts; the one division per output is
        // a single IEEE op on identical exact operands in both engines.
        val dec = "decimal(18,0)"
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click"))
          .withColumn("cents", round(col("value") * 100).cast("long"))
        val b = ev
          .groupBy(col("user_id"), expr("ts_ns div 21600000000000").as("hr"))
          .agg(
            sum(when(col("event_type") === "view", col("cents"))).as("v"),
            sum(when(col("event_type") === "click", col("cents"))).as("c"))
          .filter(col("v").isNotNull && col("c").isNotNull)
        val stats = b.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum("v").as("sv"), sum("c").as("sc"),
            sum(col("v").cast(dec) * col("c").cast(dec)).as("svc"),
            sum(col("v").cast(dec) * col("v").cast(dec)).as("svv"),
            sum(col("c").cast(dec) * col("c").cast(dec)).as("scc"))
          .filter(col("n") >= 3)
        val ncov = col("n").cast(dec) * col("svc") -
          col("sv").cast(dec) * col("sc").cast(dec)
        val nvv = col("n").cast(dec) * col("svv") -
          col("sv").cast(dec) * col("sv").cast(dec)
        val ncc = col("n").cast(dec) * col("scc") -
          col("sc").cast(dec) * col("sc").cast(dec)
        stats.select(col("user_id").cast("long").as("user_id"),
            col("n").as("n_buckets"),
            round(when(nvv > 0 && ncc > 0, ncov.cast("double") /
              sqrt(nvv.cast("double") * ncc.cast("double"))), 6)
              .as("pearson_r"),
            round(ncov.cast("double") /
              (col("n") * (col("n") - lit(1))).cast("double") / lit(1e4), 6)
              .as("cov_vc"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_ns(ts) // 21600000000000 AS hr, event_type,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type IN ('view', 'click')),
        b AS (SELECT user_id, hr,
            sum(CASE WHEN event_type = 'view' THEN cents END) AS v,
            sum(CASE WHEN event_type = 'click' THEN cents END) AS c
          FROM e GROUP BY 1, 2),
        s AS (SELECT user_id, count(*) AS n, sum(v) AS sv, sum(c) AS sc,
            sum(v * c) AS svc, sum(v * v) AS svv, sum(c * c) AS scc
          FROM b WHERE v IS NOT NULL AND c IS NOT NULL
          GROUP BY user_id HAVING count(*) >= 3),
        t AS (SELECT user_id, n,
            n * svc - sv * sc AS ncov, n * svv - sv * sv AS nvv,
            n * scc - sc * sc AS ncc FROM s)
        SELECT user_id, n AS n_buckets,
          round(CASE WHEN nvv > 0 AND ncc > 0 THEN CAST(ncov AS DOUBLE)
            / sqrt(CAST(nvv AS DOUBLE) * CAST(ncc AS DOUBLE)) END, 6)
            AS pearson_r,
          round(CAST(ncov AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
            / 10000.0, 6) AS cov_vc
        FROM t ORDER BY user_id""")),

    // ------------------------------------------ InfluxQL query frontend
    // These four run QUERY TEXT through the InfluxQL parser + planner end
    // to end (raw select / time-grouped aggregates with the default
    // fill(null) grid / composed window transforms / a whole-operator
    // percentile) — the oracle recomputes each plan's semantics in SQL.
    // Aggregates are chosen exact-by-construction (count, spread,
    // selector picks, fixed-divisor moving average): no engine-order
    // float accumulation anywhere near the 6-decimal format boundary.

    ("influxql_raw",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT value FROM events WHERE event_type = 'click'
           AND time >= '2024-01-05T00:00:00Z'
           AND time < '2024-01-07T00:00:00Z' ORDER BY time"""),
      Some("""SELECT epoch_ns(ts) AS time, value FROM events
        WHERE event_type = 'click'
          AND epoch_ns(ts) >= 1704412800000000000
          AND epoch_ns(ts) < 1704585600000000000
        ORDER BY time""")),

    ("influxql_agg",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT count(value) AS n, spread(value) AS spread_v,
             first(value) AS first_v, last(value) AS last_v
           FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-15T00:00:00Z'
           GROUP BY time(1d), event_type"""),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1705276800000000000),
        agg AS (SELECT event_type,
            (tn // 86400000000000) * 86400000000000 AS time,
            count(value) AS n, max(value) - min(value) AS spread_v,
            arg_min(value, tn) AS first_v, arg_max(value, tn) AS last_v
          FROM e GROUP BY 1, 2),
        grid AS (SELECT event_type, unnest(range(1704067200000000000,
            1705276800000000000, 86400000000000)) AS time
          FROM (SELECT DISTINCT event_type FROM agg))
        SELECT g.time, g.event_type, a.n, a.spread_v, a.first_v, a.last_v
        FROM grid g LEFT JOIN agg a USING (event_type, time)
        ORDER BY 2, 1""")),

    ("influxql_transform",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT difference(value) AS diff_v,
             moving_average(value, 4) AS ma4
           FROM events WHERE event_type = 'purchase'
             AND time < '2024-01-03T00:00:00Z'
           GROUP BY user_id"""),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS time, value
          FROM events WHERE event_type = 'purchase'
            AND epoch_ns(ts) < 1704240000000000000),
        w AS (SELECT user_id, time,
            value - lag(value) OVER (PARTITION BY user_id ORDER BY time)
              AS diff_v,
            CASE WHEN count(value) OVER fr = 4
              THEN avg(value) OVER fr END AS ma4
          FROM e WINDOW fr AS (PARTITION BY user_id ORDER BY time
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW))
        SELECT time, user_id, diff_v, ma4 FROM w
        WHERE diff_v IS NOT NULL OR ma4 IS NOT NULL
        ORDER BY user_id, time""")),

    // ELAPSED with a unit + NON_NEGATIVE_DIFFERENCE in one select:
    // both per-row lag arithmetic (integer ns division / one subtraction
    // of identical operands) — deterministic on any engine, unlike the
    // float-accumulating INTEGRAL which stays spec-covered
    ("influxql_elapsed",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT elapsed(value, 1ms) AS gap_ms,
             non_negative_difference(value) AS nnd
           FROM events WHERE event_type = 'purchase'
             AND time < '2024-01-03T00:00:00Z'
           GROUP BY user_id"""),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS time, value
          FROM events WHERE event_type = 'purchase'
            AND epoch_ns(ts) < 1704240000000000000),
        w AS (SELECT user_id, time,
            (time - lag(time) OVER sw) // 1000000 AS gap_ms,
            CASE WHEN value - lag(value) OVER sw >= 0
              THEN value - lag(value) OVER sw END AS nnd
          FROM e WINDOW sw AS (PARTITION BY user_id ORDER BY time))
        SELECT time, user_id, gap_ms, nnd FROM w
        WHERE gap_ms IS NOT NULL OR nnd IS NOT NULL
        ORDER BY user_id, time""")),

    ("influxql_percentile",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        "SELECT percentile(value, 90) AS p90 FROM events GROUP BY event_type"),
      Some("""WITH e AS (SELECT event_type, value FROM events
          WHERE value IS NOT NULL),
        r AS (SELECT event_type, value,
            row_number() OVER (PARTITION BY event_type ORDER BY value) AS rk,
            count(*) OVER (PARTITION BY event_type) AS n FROM e)
        SELECT event_type, value AS p90 FROM r
        WHERE rk = floor(0.9 * n + 0.5) ORDER BY event_type""")),

    // scalar functions wrapped around aggregates — round(mean()),
    // sqrt(count()) — the post-aggregate math 1.x allows in projections
    ("influxql_scalar_agg",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT round(mean(value)) AS rm, sqrt(count(value)) AS sc
           FROM events GROUP BY event_type"""),
      Some("""SELECT event_type, round(avg(value)) AS rm,
          sqrt(count(value)) AS sc
        FROM events GROUP BY 1 ORDER BY 1""")),

    // PERCENTILE under GROUP BY time(): exact nearest-rank per (tag,
    // day bucket) — the downsampled-quantile form upstream supports and
    // the plain percentile operator previously rejected
    ("influxql_percentile_time",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT percentile(value, 90) AS p90 FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(1d), event_type fill(none)"""),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE value IS NOT NULL
            AND epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000),
        b AS (SELECT event_type,
            (tn // 86400000000000) * 86400000000000 AS time, value FROM e),
        r AS (SELECT event_type, time, value,
            row_number() OVER (PARTITION BY event_type, time
              ORDER BY value) AS rk,
            count(*) OVER (PARTITION BY event_type, time) AS n FROM b)
        SELECT time, event_type, value AS p90 FROM r
        WHERE rk = floor(0.9 * n + 0.5)
        ORDER BY event_type, time""")),

    // TOP under GROUP BY time(): the n extreme points per (tag, day
    // bucket), each keeping its own timestamp — the per-bucket selector
    // form upstream supports
    ("influxql_top_time",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT top(value, 2) AS top2 FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(1d), event_type"""),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE value IS NOT NULL
            AND epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000),
        b AS (SELECT event_type,
            (tn // 86400000000000) * 86400000000000 AS bk, tn, value FROM e),
        r AS (SELECT event_type, tn, value, row_number() OVER (
            PARTITION BY event_type, bk
            ORDER BY value DESC, tn ASC) AS rk FROM b)
        SELECT tn AS time, event_type, value AS top2 FROM r
        WHERE rk <= 2 ORDER BY event_type, time""")),

    // TOP(field, tag_key, n): the n tag values whose best point ranks
    // highest, one (best) point each, the tag emitted as a column — the
    // grouped-selector form of the 1.x TOP/BOTTOM family
    ("influxql_top_tag",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        "SELECT TOP(value, event_type, 3) AS best FROM events"),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE value IS NOT NULL),
        b AS (SELECT event_type, tn, value, row_number() OVER (
            PARTITION BY event_type ORDER BY value DESC, tn ASC) AS rk
          FROM e),
        r AS (SELECT event_type, tn, value, row_number() OVER (
            ORDER BY value DESC, tn ASC, event_type ASC) AS rk2
          FROM b WHERE rk = 1)
        SELECT tn AS time, event_type, value AS best FROM r
        WHERE rk2 <= 3 ORDER BY time""")),

    ("influxql_downsample_rate",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT non_negative_derivative(count(value)) AS rate FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(6h), event_type fill(none)"""),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn FROM events
          WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000),
        a AS (SELECT event_type,
            (tn // 21600000000000) * 21600000000000 AS time,
            count(*) AS c FROM e GROUP BY 1, 2),
        d AS (SELECT event_type, time, c,
            lag(c) OVER w AS pc, lag(time) OVER w AS pt
          FROM a WINDOW w AS (PARTITION BY event_type ORDER BY time))
        SELECT time, event_type,
          (c - pc) / (CAST(time - pt AS DOUBLE) / 21600000000000.0) AS rate
        FROM d WHERE pc IS NOT NULL AND c - pc >= 0
        ORDER BY event_type, time""")),

    ("influxql_show_tag_values",
      // the 1.x multi-key form: WITH KEY IN (...) unions the per-key
      // distinct value sets under (measurement, key, value)
      (s, d) => graft.operators.InfluxQlPlanner.runStmt(influxMs(s, d),
        "SHOW TAG VALUES WITH KEY IN (event_type, user_id)"),
      Some("""SELECT DISTINCT 'events' AS measurement,
          'event_type' AS key, event_type AS value FROM events
        UNION ALL SELECT DISTINCT 'events', 'user_id',
          CAST(user_id AS VARCHAR) FROM events
        ORDER BY 1, 2, 3""")),

    ("influxql_from_regex",
      // FROM /^e/ sweeps every matching measurement: each plans through
      // the single-measurement pipeline, results union under the 1.x
      // per-measurement `name` label; a schema-mismatched measurement
      // would contribute nothing rather than failing the statement
      (s, d) => {
        val ev = Tables.events(s, d)
        val ms = Map(
          "events" -> graft.operators.InfluxMeasurement(ev, "ts_ns",
            Seq("event_type", "user_id")),
          "errors" -> graft.operators.InfluxMeasurement(
            ev.filter(col("event_type") === "error"), "ts_ns",
            Seq("event_type", "user_id")))
        graft.operators.InfluxQlPlanner.run(ms,
          """SELECT count(value) AS n FROM /^e/
             WHERE time >= '2024-01-01T00:00:00Z'
               AND time < '2024-01-08T00:00:00Z'
             GROUP BY time(1d) fill(none)""")
      },
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn FROM events
          WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000),
        ev AS (SELECT 'events' AS name,
            (tn // 86400000000000) * 86400000000000 AS time,
            CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 2),
        er AS (SELECT 'errors' AS name,
            (tn // 86400000000000) * 86400000000000 AS time,
            CAST(count(*) AS BIGINT) AS n FROM e
          WHERE event_type = 'error' GROUP BY 2)
        SELECT * FROM (SELECT * FROM ev UNION ALL SELECT * FROM er)
        ORDER BY name, time""")),

    ("influxql_tz",
      // TZ('Asia/Kolkata'): daily buckets aligned to +05:30 wall time.
      // The engine path is the generic zone-rules conversion (DST-capable,
      // spec-tested across a US transition); the oracle replays the
      // fixed-offset arithmetic directly — agreeing hashes prove the
      // generic path reduces to the right offset math
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT count(value) AS n, max(value) AS mx FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-15T00:00:00Z'
           GROUP BY time(1d), event_type fill(none) TZ('Asia/Kolkata')"""),
      Some("""WITH e AS (SELECT event_type, epoch_ns(ts) AS tn, value
          FROM events WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1705276800000000000)
        SELECT ((tn + 19800000000000) // 86400000000000) * 86400000000000
            - 19800000000000 AS time,
          event_type, CAST(count(*) AS BIGINT) AS n, max(value) AS mx
        FROM e GROUP BY 1, 2 ORDER BY event_type, time""")),

    ("influxql_holt_winters",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT holt_winters(count(value), 4, 0) AS hw FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(6h), event_type fill(none)""")
        .select(col("time"), col("event_type"),
          round(col("hw"), 6).as("hw"))
        .orderBy("event_type", "time"),
      // bucket counts are exact integers, so the Holt recursion performs
      // the identical IEEE op sequence in both engines (α=.5, β=.25 are
      // exactly representable); the oracle replays it per bucket series
      // and projects the same 4 points past each series end
      Some("""WITH RECURSIVE agg AS (SELECT event_type,
            (epoch_ns(ts) // 21600000000000) * 21600000000000 AS time,
            CAST(count(*) AS DOUBLE) AS v
          FROM events WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000 GROUP BY 1, 2),
        bk AS (SELECT event_type, time, v, row_number() OVER (
            PARTITION BY event_type ORDER BY time) AS rn FROM agg),
        r AS (SELECT event_type, time, rn, v AS l, CAST(0 AS DOUBLE) AS b
          FROM bk WHERE rn = 1
          UNION ALL
          SELECT bk.event_type, bk.time, bk.rn,
            CASE WHEN bk.rn = 2 THEN bk.v
              ELSE 0.5 * bk.v + 0.5 * (r.l + r.b) END,
            CASE WHEN bk.rn = 2 THEN bk.v - r.l
              ELSE 0.25 * ((0.5 * bk.v + 0.5 * (r.l + r.b)) - r.l)
                + 0.75 * r.b END
          FROM bk JOIN r ON bk.event_type = r.event_type
            AND bk.rn = r.rn + 1),
        last AS (SELECT event_type, max(rn) AS mrn FROM r GROUP BY 1),
        fin AS (SELECT r.event_type, r.time, r.l, r.b FROM r
          JOIN last ON r.event_type = last.event_type AND r.rn = last.mrn
          WHERE last.mrn >= 2)
        SELECT fin.time + h * 21600000000000 AS time, fin.event_type,
          round(fin.l + h * fin.b, 6) AS hw
        FROM fin CROSS JOIN (SELECT unnest(range(1, 5)) AS h)
        ORDER BY event_type, time""")),

    ("influxql_arith",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT max(value) - min(value) AS sp,
             (max(value) + min(value)) / 2 AS mid
           FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(1d), event_type fill(none)"""),
      // min/max are order-free exact selections, so the arithmetic is a
      // fixed IEEE expression on identical operands in both engines
      Some("""SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
            AS time, event_type,
          max(value) - min(value) AS sp,
          (max(value) + min(value)) / 2 AS mid
        FROM events
        WHERE epoch_ns(ts) >= 1704067200000000000
          AND epoch_ns(ts) < 1704672000000000000
        GROUP BY 1, 2 ORDER BY event_type, time""")),

    ("influxql_arith_row",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT value * 2 - 1 AS x, sqrt(value) + value / 4 AS y
           FROM events WHERE event_type = 'error'
             AND time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-03T00:00:00Z'
           ORDER BY time"""),
      Some("""SELECT epoch_ns(ts) AS time, value * 2 - 1 AS x,
          sqrt(value) + value / 4 AS y
        FROM events WHERE event_type = 'error'
          AND epoch_ns(ts) >= 1704067200000000000
          AND epoch_ns(ts) < 1704240000000000000
        ORDER BY time""")),

    ("influxql_distinct",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT distinct(value) AS dv FROM events
           WHERE event_type = 'error'
             AND time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY user_id"""),
      Some("""SELECT DISTINCT user_id, value AS dv FROM events
        WHERE event_type = 'error'
          AND epoch_ns(ts) >= 1704067200000000000
          AND epoch_ns(ts) < 1704672000000000000
        ORDER BY user_id, dv""")),

    ("influxql_count_distinct",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT count(distinct(value)) AS ndv FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY time(1d), event_type fill(none)"""),
      Some("""SELECT (epoch_ns(ts) // 86400000000000) * 86400000000000
            AS time, event_type, count(DISTINCT value) AS ndv
        FROM events
        WHERE epoch_ns(ts) >= 1704067200000000000
          AND epoch_ns(ts) < 1704672000000000000
        GROUP BY 1, 2 ORDER BY event_type, time""")),

    ("influxql_sample",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT sample(value, 3) FROM events
           WHERE time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-08T00:00:00Z'
           GROUP BY user_id"""),
      // upstream SAMPLE is reservoir-random; the engine's deterministic
      // stand-in picks per-series points by content hash — the oracle
      // replays the identical md5-derived ordering
      Some(s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE epoch_ns(ts) >= 1704067200000000000
            AND epoch_ns(ts) < 1704672000000000000),
        h AS (SELECT user_id, t, value,
            ${dHash60Core("CAST(user_id AS VARCHAR) || ',' || CAST(t AS VARCHAR)")} AS hh
          FROM e WHERE value IS NOT NULL),
        r AS (SELECT user_id, t, value, row_number() OVER (
            PARTITION BY user_id ORDER BY hh, t) AS rk FROM h)
        SELECT t AS time, user_id, value AS sample FROM r WHERE rk <= 3
        ORDER BY user_id, time""")),

    ("influxql_scalar",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT abs(value) AS av, floor(value) AS fv, sqrt(value) AS sv
           FROM events WHERE event_type = 'error'
             AND time >= '2024-01-01T00:00:00Z'
             AND time < '2024-01-03T00:00:00Z'
           ORDER BY time"""),
      Some("""SELECT epoch_ns(ts) AS time, abs(value) AS av,
          floor(value) AS fv, sqrt(value) AS sv
        FROM events WHERE event_type = 'error'
          AND epoch_ns(ts) >= 1704067200000000000
          AND epoch_ns(ts) < 1704240000000000000
        ORDER BY time""")),

    ("influxql_subquery",
      (s, d) => graft.operators.InfluxQlPlanner.run(influxMs(s, d),
        """SELECT count(diff) AS n, spread(diff) AS sp FROM
           (SELECT difference(value) AS diff FROM events
            WHERE event_type = 'view' GROUP BY user_id)
           GROUP BY user_id"""),
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE event_type = 'view'),
        d AS (SELECT user_id, value - lag(value)
            OVER (PARTITION BY user_id ORDER BY t) AS diff FROM e)
        SELECT user_id, count(diff) AS n, max(diff) - min(diff) AS sp
        FROM d WHERE diff IS NOT NULL
        GROUP BY user_id ORDER BY user_id""")),

    ("influxql_show",
      (s, d) => graft.operators.InfluxQlPlanner.runStmt(influxMs(s, d),
        "SHOW TAG VALUES FROM events WITH KEY = event_type"),
      Some("""SELECT 'events' AS measurement, 'event_type' AS key,
        event_type AS value FROM events
        GROUP BY event_type ORDER BY event_type""")),

    ("events_increase",
      (s, d) => {
        // Flux/PromQL counter increase over raw event series: running
        // non-negative deltas with counter-reset handling
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 5)
          .select(col("user_id"), col("ts_ns").as("t"), col("value"))
        SF.increase(ev, Seq("user_id"), "t", "value", "incr")
          .select(col("user_id"), col("t"), round(col("incr"), 6).as("incr"))
          .orderBy("user_id", "t")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value
          FROM events WHERE user_id < 5),
        c AS (SELECT user_id, t,
            CASE WHEN lag(value) OVER win IS NULL THEN 0.0
              WHEN value < lag(value) OVER win THEN value
              ELSE value - lag(value) OVER win END AS contrib
          FROM e WINDOW win AS (PARTITION BY user_id ORDER BY t))
        SELECT user_id, t, round(sum(contrib) OVER (PARTITION BY user_id
            ORDER BY t ROWS UNBOUNDED PRECEDING), 6) AS incr
        FROM c ORDER BY user_id, t""")),

    // Apdex score per event type (the SRE satisfaction index): satisfied
    // = value <= T, tolerating = T < value <= 4T, apdex = (sat + tol/2)
    // / total — computed as the exact rational (2·sat + tol) / (2·total)
    // so the only float is one division of exact integers. One scan,
    // conditional counts, no shuffle beyond the keyed aggregate
    ("events_apdex",
      (s, d) => {
        val t = 100.0
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") <= t, 1L).otherwise(0L)).as("sat"),
            sum(when(col("value") > t && col("value") <= 4 * t, 1L)
              .otherwise(0L)).as("tol"))
          .select(col("event_type"), col("n"), col("sat"), col("tol"),
            round((col("sat") * 2 + col("tol"))
              / (col("n") * lit(2.0)), 6).as("apdex"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS sat,
        CAST(sum(CASE WHEN value > 100.0 AND value <= 400.0 THEN 1
          ELSE 0 END) AS BIGINT) AS tol,
        round((sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) * 2
            + sum(CASE WHEN value > 100.0 AND value <= 400.0 THEN 1
              ELSE 0 END))
          / (count(*) * 2.0), 6) AS apdex
        FROM events GROUP BY 1 ORDER BY 1""")),

    // PromQL `resets`: per-series counter-restart count — the
    // instance-flap audit next to rate/increase. Pure comparisons of
    // identical raw values (no arithmetic), integer counts
    ("events_resets",
      (s, d) => {
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            col("ts_ns").as("t"), col("value"))
        SF.resets(ev, Seq("user_id", "event_type"), "t", "value", "n_resets")
          .orderBy("user_id", "event_type")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t,
          value FROM events),
        r AS (SELECT user_id, event_type,
            CASE WHEN lag(value) OVER win IS NOT NULL
              AND value < lag(value) OVER win THEN 1 ELSE 0 END AS rst
          FROM e WINDOW win AS (PARTITION BY user_id, event_type ORDER BY t))
        SELECT user_id, event_type, CAST(sum(rst) AS BIGINT) AS n_resets,
          CAST(count(*) AS BIGINT) AS n_points
        FROM r GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("influxql_show_cardinality",
      (s, d) => graft.operators.InfluxQlPlanner.runStmt(influxMs(s, d),
        "SHOW SERIES CARDINALITY"),
      Some("""SELECT 'events' AS measurement, count(DISTINCT
          'events,event_type=' || event_type || ',user_id=' || user_id)
          AS count
        FROM events""")),

    ("events_histogram",
      (s, d) => {
        // Flux histogram(): cumulative counts per upper bound, one wide
        // aggregate then an in-row unpivot — raw rows are never exploded
        import graft.functions.{InfluxAggregates => IA}
        IA.histogram(Tables.events(s, d), Seq("event_type"), "value",
            Seq(50.0, 100.0, 200.0, 400.0, 800.0))
          .orderBy("event_type", "le")
      },
      Some("""WITH b AS (SELECT unnest([50.0, 100.0, 200.0, 400.0, 800.0]) AS le)
        SELECT event_type, le,
          CAST(count(*) FILTER (value <= le) AS BIGINT) AS n
        FROM events CROSS JOIN b GROUP BY 1, 2 ORDER BY 1, 2""")),

    ("events_histogram_quantile",
      (s, d) => {
        // Flux histogramQuantile(): the sketch-side quantile — estimated
        // from the cumulative histogram alone, raw data never re-scanned.
        // The oracle replays the same interpolation rule in SQL; every
        // arithmetic shape is mirrored, so the doubles are bit-equal
        import graft.functions.{InfluxAggregates => IA}
        val hist = IA.histogram(Tables.events(s, d), Seq("event_type"),
          "value", Seq(50.0, 100.0, 200.0, 400.0, 800.0))
        IA.histogramQuantile(hist, Seq("event_type"), "le", "n",
            q = 0.9, "p90_est")
          .select(col("event_type"), round(col("p90_est"), 6).as("p90_est"))
          .orderBy("event_type")
      },
      Some("""WITH b AS (SELECT unnest([50.0, 100.0, 200.0, 400.0, 800.0]) AS le),
        h AS (SELECT event_type, le,
            CAST(count(*) FILTER (value <= le) AS BIGINT) AS n
          FROM events CROSS JOIN b GROUP BY 1, 2),
        w AS (SELECT event_type, le, n,
            0.9 * CAST(max(n) OVER (PARTITION BY event_type) AS DOUBLE) AS t,
            coalesce(lag(le) OVER k, 0.0) AS ple,
            coalesce(lag(n) OVER k, 0) AS pn
          FROM h WINDOW k AS (PARTITION BY event_type ORDER BY le))
        SELECT event_type, round(ple + (t - pn) * (le - ple)
            / CAST(n - pn AS DOUBLE), 6) AS p90_est
        FROM w WHERE CAST(n AS DOUBLE) >= t AND CAST(pn AS DOUBLE) < t
        ORDER BY event_type""")),

    ("events_pivot",
      (s, d) => {
        // Flux pivot() / schema.fieldsAsCols: one row per day, one count
        // column per event type. Spark's relational pivot with explicit
        // values compiles to the same conditional aggregation the oracle
        // spells out — absent combinations stay NULL in both
        Tables.events(s, d)
          .groupBy(expr("ts_ns div 86400000000000").as("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .orderBy("day")
      },
      Some("""SELECT epoch_ns(ts) // 86400000000000 AS day,
          CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
          CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
          CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
          CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
          CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        FROM events GROUP BY 1 ORDER BY 1""")),

    ("events_prom_rate",
      (s, d) => {
        // PromQL-faithful rate() per 6h window: reset-aware increase
        // extrapolated to the window edges (classic Prometheus
        // extrapolatedRate); integer-cent increase sums exactly, the
        // extrapolation is a mirrored IEEE expression in both engines
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 10)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        SF.promRate(ev, Seq("user_id"), "t", "cents",
            windowNs = 21600000000000L, "r")
          .select(col("user_id"), col("time"),
            round(col("r") / 100.0, 6).as("rate"))
          .orderBy("user_id", "time")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(round(value * 100) AS BIGINT) AS v
          FROM events WHERE user_id < 10),
        c AS (SELECT user_id, t, v, t // 21600000000000 AS b,
            CASE WHEN lag(v) OVER w IS NULL THEN 0
              WHEN v < lag(v) OVER w THEN v ELSE v - lag(v) OVER w END
              AS contrib
          FROM e WINDOW w AS (PARTITION BY user_id, t // 21600000000000
            ORDER BY t)),
        g AS (SELECT user_id, b, count(*) AS n, min(t) AS ft, max(t) AS lt,
            min(struct_pack(t := t, v := v)) AS fs, sum(contrib) AS inc
          FROM c GROUP BY 1, 2),
        x AS (SELECT user_id, (b + 1) * 21600000000000 AS time, n,
            CAST(ft - b * 21600000000000 AS DOUBLE) AS d2s,
            CAST((b + 1) * 21600000000000 - lt AS DOUBLE) AS d2e,
            CAST(lt - ft AS DOUBLE) AS si,
            CAST(fs.v AS DOUBLE) AS fv, CAST(inc AS DOUBLE) AS incd
          FROM g WHERE n >= 2 AND lt > ft),
        y AS (SELECT *, si / CAST(n - 1 AS DOUBLE) AS avgd FROM x),
        z AS (SELECT *,
            CASE WHEN d2s >= avgd * 1.1 THEN avgd / 2.0 ELSE d2s END AS exts0,
            CASE WHEN d2e >= avgd * 1.1 THEN avgd / 2.0 ELSE d2e END AS exte
          FROM y),
        f AS (SELECT *, CASE WHEN incd > 0 AND fv >= 0
              AND si * (fv / (CASE WHEN incd > 0 THEN incd END)) < exts0
            THEN si * (fv / incd) ELSE exts0 END AS exts
          FROM z)
        SELECT user_id, time,
          round(incd * ((si + exts + exte) / si) / 21600.0 / 100.0, 6)
            AS rate
        FROM f ORDER BY user_id, time""")),

    ("events_predict_linear",
      (s, d) => {
        // PromQL predict_linear()/deriv(): per-series OLS over 6h bucket
        // sums (integer cents), evaluated 4 buckets past the last point.
        // Slope and prediction are ratios of exact decimal(38,0) integer
        // polynomials — one final IEEE division each (see
        // SeriesFunctions.predictLinear); x is re-based to the global min
        // bucket so the co-moment magnitudes stay tiny at any corpus size
        import graft.functions.{SeriesFunctions => SF}
        val b = Tables.events(s, d).filter(col("user_id") < 50)
          .select(col("user_id"), expr("ts_ns div 21600000000000").as("hr"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("user_id", "hr").agg(sum("cents").as("y"))
        val base = b.agg(min("hr").as("__h0"))
        val xed = b.crossJoin(broadcast(base))
          .select(col("user_id"), (col("hr") - col("__h0")).as("x"), col("y"))
        SF.predictLinear(xed, Seq("user_id"), "x", "y", horizon = 4L)
          .select(col("user_id"), col("n"),
            round(col("slope"), 6).as("slope"),
            round(col("predicted"), 6).as("predicted"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_ns(ts) // 21600000000000 AS hr,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 50),
        b AS (SELECT user_id, hr, sum(cents) AS y FROM e GROUP BY 1, 2),
        m AS (SELECT min(hr) AS h0 FROM b),
        x AS (SELECT user_id, hr - h0 AS x, y FROM b CROSS JOIN m),
        g AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
            CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
            CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
            CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            max(x) AS xmax
          FROM x GROUP BY 1),
        t AS (SELECT user_id, n, n * sxx - sx * sx AS den,
            n * sxy - sx * sy AS snum, sy * sxx - sx * sxy AS inum, xmax
          FROM g)
        SELECT user_id, CAST(n AS BIGINT) AS n,
          round(CASE WHEN den != 0
            THEN CAST(snum AS DOUBLE) / CAST(den AS DOUBLE) END, 6) AS slope,
          round(CASE WHEN den != 0
            THEN CAST(inum + snum * (xmax + 4) AS DOUBLE)
              / CAST(den AS DOUBLE) END, 6) AS predicted
        FROM t ORDER BY user_id""")),

    ("events_acf",
      (s, d) => {
        // autocorrelation at lags 1..3 per user over 6h bucket sums — the
        // seasonality probe next to seasonalDecompose. Bucket keys are
        // unique per series (lag order is total), values are integer
        // cents, and each r_k is one division of exact decimal(38,0)
        // polynomials (see SeriesFunctions.acf)
        import graft.functions.{SeriesFunctions => SF}
        val b = Tables.events(s, d).filter(col("user_id") < 30)
          .select(col("user_id"), expr("ts_ns div 21600000000000").as("hr"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy("user_id", "hr").agg(sum("cents").as("y"))
        SF.acf(b, Seq("user_id"), "hr", "y", maxLag = 3)
          .select(col("user_id"), col("n"),
            round(col("acf1"), 6).as("acf1"),
            round(col("acf2"), 6).as("acf2"),
            round(col("acf3"), 6).as("acf3"))
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
            epoch_ns(ts) // 21600000000000 AS hr,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 30),
        b AS (SELECT user_id, hr, sum(cents) AS y FROM e GROUP BY 1, 2),
        l AS (SELECT user_id, y,
            lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2,
            lag(y, 3) OVER w AS l3
          FROM b WINDOW w AS (PARTITION BY user_id ORDER BY hr)),
        g AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
            CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS s,
            CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
            CAST(sum(CASE WHEN l1 IS NOT NULL
              THEN CAST(y AS HUGEINT) * l1 END) AS HUGEINT) AS p1,
            CAST(sum(CASE WHEN l1 IS NOT NULL
              THEN CAST(y AS HUGEINT) END) AS HUGEINT) AS a1,
            CAST(sum(CAST(l1 AS HUGEINT)) AS HUGEINT) AS b1,
            CAST(count(l1) AS HUGEINT) AS m1,
            CAST(sum(CASE WHEN l2 IS NOT NULL
              THEN CAST(y AS HUGEINT) * l2 END) AS HUGEINT) AS p2,
            CAST(sum(CASE WHEN l2 IS NOT NULL
              THEN CAST(y AS HUGEINT) END) AS HUGEINT) AS a2,
            CAST(sum(CAST(l2 AS HUGEINT)) AS HUGEINT) AS b2,
            CAST(count(l2) AS HUGEINT) AS m2,
            CAST(sum(CASE WHEN l3 IS NOT NULL
              THEN CAST(y AS HUGEINT) * l3 END) AS HUGEINT) AS p3,
            CAST(sum(CASE WHEN l3 IS NOT NULL
              THEN CAST(y AS HUGEINT) END) AS HUGEINT) AS a3,
            CAST(sum(CAST(l3 AS HUGEINT)) AS HUGEINT) AS b3,
            CAST(count(l3) AS HUGEINT) AS m3
          FROM l GROUP BY 1)
        SELECT user_id, CAST(n AS BIGINT) AS n,
          round(CASE WHEN n * n * syy - n * s * s != 0
            THEN CAST(n * n * p1 - n * s * (a1 + b1) + m1 * s * s AS DOUBLE)
              / CAST(n * n * syy - n * s * s AS DOUBLE) END, 6) AS acf1,
          round(CASE WHEN n * n * syy - n * s * s != 0
            THEN CAST(n * n * p2 - n * s * (a2 + b2) + m2 * s * s AS DOUBLE)
              / CAST(n * n * syy - n * s * s AS DOUBLE) END, 6) AS acf2,
          round(CASE WHEN n * n * syy - n * s * s != 0
            THEN CAST(n * n * p3 - n * s * (a3 + b3) + m3 * s * s AS DOUBLE)
              / CAST(n * n * syy - n * s * s AS DOUBLE) END, 6) AS acf3
        FROM g ORDER BY user_id""")),

    ("events_hdr_quantiles",
      (s, d) => {
        // HDR-histogram log-linear quantile sketch per event type — the
        // mergeable at-scale quantile path (vs events_histogram_quantile's
        // fixed explicit bounds). Bucketing is pure integer math (bit
        // length + power-of-two scaling — no libm anywhere), the rank
        // pick is an exact integer cross-multiplication
        import graft.functions.{InfluxAggregates => IA}
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
        val sk = IA.hdrSketch(ev, Seq("event_type"), "cents", subBits = 5)
        IA.hdrQuantiles(sk, Seq("event_type"), Seq(50, 90, 99), out = "est")
          .orderBy("event_type", "pct")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
        u AS (SELECT event_type, c, length(bin(c)) - 1 AS msb FROM e),
        v AS (SELECT event_type, msb, CAST(floor(CAST(c * 32 AS DOUBLE)
            / power(2.0, msb)) AS BIGINT) AS m FROM u),
        s AS (SELECT event_type, msb * 32 + m - 32 AS idx,
            power(2.0, msb) * (2 * m + 1) / 64.0 AS rep,
            CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY 1, 2, 3),
        w AS (SELECT event_type, idx, rep, n,
            sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS cum,
            sum(n) OVER (PARTITION BY event_type) AS tot
          FROM s),
        p AS (SELECT unnest([50, 90, 99]) AS pct)
        SELECT event_type, pct, rep AS est, CAST(tot AS BIGINT) AS n_total
        FROM w CROSS JOIN p
        WHERE cum * 100 >= tot * pct AND (cum - n) * 100 < tot * pct
        ORDER BY event_type, pct""")),

    ("events_hdr_error_audit",
      (s, d) => {
        // the sketch's accuracy contract made visible (the eval beside
        // the operator, like the ANN recall family): HDR estimate vs the
        // EXACT value at the same rank ⌈n·pct/100⌉, with the relative
        // error micro-quantized and checked against the 1/64 bucket
        // bound. est is a dyadic rational and exact_val an integer, so
        // |est−exact|/exact is IEEE ops on identical operands anywhere
        import graft.functions.{InfluxAggregates => IA}
        // cents > 0 up front: the sketch's domain is positive integers
        // (hdrSketch filters internally), and the exact ranking must
        // rank over the SAME population or ranks shift at any SF whose
        // smallest values round to zero cents
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"))
          .filter(col("cents") > 0)
        val sk = IA.hdrSketch(ev, Seq("event_type"), "cents", subBits = 5)
        val est = IA.hdrQuantiles(sk, Seq("event_type"), Seq(50, 90, 99))
        val byKey = Window.partitionBy(col("event_type"))
        val ranked = ev
          .withColumn("rk", row_number().over(byKey.orderBy(col("cents"))))
          .withColumn("nn", count(lit(1)).over(byKey))
        val exact = ranked
          .select(col("*"),
            explode(array(lit(50), lit(90), lit(99))).as("pct"))
          .filter(col("rk") === expr("(nn * pct + 99) div 100"))
          .select(col("event_type"), col("pct"),
            col("cents").as("exact_val"))
        est.join(exact, Seq("event_type", "pct"))
          .select(col("event_type"), col("pct"), col("est"),
            col("exact_val"),
            floor(abs(col("est") - col("exact_val")) / col("exact_val")
              * lit(1000000) + lit(0.5)).cast("long").as("rel_err_micro"))
          .withColumn("within_bound", col("rel_err_micro") <= lit(15625L))
          .orderBy("event_type", "pct")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
        u AS (SELECT event_type, c, length(bin(c)) - 1 AS msb FROM e),
        v AS (SELECT event_type, c, msb, CAST(floor(CAST(c * 32 AS DOUBLE)
            / power(2.0, msb)) AS BIGINT) AS m FROM u),
        s AS (SELECT event_type, msb * 32 + m - 32 AS idx,
            power(2.0, msb) * (2 * m + 1) / 64.0 AS rep,
            CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY 1, 2, 3),
        w AS (SELECT event_type, idx, rep, n,
            sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS cum,
            sum(n) OVER (PARTITION BY event_type) AS tot
          FROM s),
        p AS (SELECT unnest([50, 90, 99]) AS pct),
        est AS (SELECT event_type, pct, rep AS est
          FROM w CROSS JOIN p
          WHERE cum * 100 >= tot * pct AND (cum - n) * 100 < tot * pct),
        ranked AS (SELECT event_type, c,
            row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk,
            count(*) OVER (PARTITION BY event_type) AS nn
          FROM e),
        exact AS (SELECT event_type, pct, c AS exact_val
          FROM ranked CROSS JOIN p WHERE rk = (nn * pct + 99) // 100)
        SELECT est.event_type, est.pct, est.est, exact.exact_val,
          CAST(floor(abs(est.est - exact.exact_val) / exact.exact_val
            * 1000000 + 0.5) AS BIGINT) AS rel_err_micro,
          CAST(floor(abs(est.est - exact.exact_val) / exact.exact_val
            * 1000000 + 0.5) AS BIGINT) <= 15625 AS within_bound
        FROM est JOIN exact ON est.event_type = exact.event_type
          AND est.pct = exact.pct
        ORDER BY est.event_type, est.pct""")),

    ("events_hdr_merge",
      (s, d) => {
        // the sketch's MERGEABILITY contract made visible (the property
        // that makes it the at-scale quantile path: 1000 executors
        // sketch their shards locally, the merge is a metadata-sized
        // count sum): shard the corpus 4 ways, sketch each shard
        // independently, merge by summing per-bucket counts — the
        // quantile picks must equal the whole-corpus sketch's EXACTLY,
        // so the oracle is events_hdr_quantiles' verbatim
        import graft.functions.{InfluxAggregates => IA}
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents"),
            pmod(col("event_id"), lit(4L)).as("shard"))
        val perShard = IA.hdrSketch(ev, Seq("event_type", "shard"),
          "cents", subBits = 5)
        val merged = perShard.groupBy("event_type", "idx", "rep")
          .agg(sum(col("n")).as("n"))
        IA.hdrQuantiles(merged, Seq("event_type"), Seq(50, 90, 99),
            out = "est")
          .orderBy("event_type", "pct")
      },
      Some("""WITH e AS (SELECT event_type,
            CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
        u AS (SELECT event_type, c, length(bin(c)) - 1 AS msb FROM e),
        v AS (SELECT event_type, msb, CAST(floor(CAST(c * 32 AS DOUBLE)
            / power(2.0, msb)) AS BIGINT) AS m FROM u),
        s AS (SELECT event_type, msb * 32 + m - 32 AS idx,
            power(2.0, msb) * (2 * m + 1) / 64.0 AS rep,
            CAST(count(*) AS BIGINT) AS n
          FROM v GROUP BY 1, 2, 3),
        w AS (SELECT event_type, idx, rep, n,
            sum(n) OVER (PARTITION BY event_type ORDER BY idx) AS cum,
            sum(n) OVER (PARTITION BY event_type) AS tot
          FROM s),
        p AS (SELECT unnest([50, 90, 99]) AS pct)
        SELECT event_type, pct, rep AS est, CAST(tot AS BIGINT) AS n_total
        FROM w CROSS JOIN p
        WHERE cum * 100 >= tot * pct AND (cum - n) * 100 < tot * pct
        ORDER BY event_type, pct""")),

    ("events_gaps",
      (s, d) => {
        // outage detection: inter-arrival spans over 24h per user series
        // — the lag shares the sibling transforms' one exchange, and the
        // filter sizes the output by gaps, not points
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 30)
          .select(col("user_id"), col("ts_ns").as("t"))
        SF.gaps(ev, Seq("user_id"), "t", thresholdNs = 86400000000000L)
          .orderBy("user_id", "gap_start")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t
          FROM events WHERE user_id < 30),
        g AS (SELECT user_id,
            lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap_start,
            t AS gap_end
          FROM e)
        SELECT user_id, gap_start, gap_end, gap_end - gap_start AS gap_ns
        FROM g WHERE gap_end - gap_start > 86400000000000
        ORDER BY user_id, gap_start""")),

    ("events_downsample",
      (s, d) => {
        // LTOB largest-triangle downsampling to one visually-dominant
        // point per day: all-integer triangle areas (µs time grain ×
        // integer cents), so the per-bucket argmax is exact in any engine
        import graft.functions.{SeriesFunctions => SF}
        val ev = Tables.events(s, d).filter(col("user_id") < 30)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
        SF.ltobDownsample(ev, Seq("user_id"), "t", "cents",
            bucketNs = 86400000000000L)
          .select(col("user_id"), col("bucket"), col("t"),
            round(col("cents") / 100.0, 2).as("v"))
          .orderBy("user_id", "bucket")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 30),
        n AS (SELECT user_id, t, cents, t // 1000 AS tu,
            lag(t // 1000) OVER w AS tp, lead(t // 1000) OVER w AS tn,
            lag(cents) OVER w AS vp, lead(cents) OVER w AS vn
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        a AS (SELECT user_id, t, cents, t // 86400000000000 AS bucket,
            CASE WHEN tp IS NULL OR tn IS NULL THEN 9223372036854775807
              ELSE abs((tp - tn) * (cents - vp) - (tp - tu) * (vn - vp))
            END AS area2
          FROM n),
        r AS (SELECT user_id, bucket, t, cents,
            row_number() OVER (PARTITION BY user_id, bucket
              ORDER BY area2 DESC, t ASC, cents ASC) AS rk
          FROM a)
        SELECT user_id, bucket, t, round(cents / 100.0, 2) AS v
        FROM r WHERE rk = 1 ORDER BY user_id, bucket""")),

    // OHLC candle downsample: per (series, day) the open/high/low/close
    // plus point count — the financial-style rollup every time-series UI
    // draws. Open/close are argmin/argmax-by-time via lexicographic
    // struct aggregates (map-side partials, ties broken by value on both
    // engines identically); all comparisons run on integer cents
    ("events_ohlc",
      (s, d) => {
        val day = 86400000000000L
        Tables.events(s, d).filter(col("user_id") < 30)
          .select(col("user_id"), col("ts_ns").as("t"),
            round(col("value") * 100).cast("long").as("cents"))
          .withColumn("bucket", expr(s"t div $day"))
          .groupBy("user_id", "bucket")
          .agg(min(struct(col("t"), col("cents"))).as("__o"),
            max(struct(col("t"), col("cents"))).as("__c"),
            min("cents").as("__lo"), max("cents").as("__hi"),
            count(lit(1)).as("n_points"))
          .select(col("user_id"), col("bucket"),
            round(col("__o.cents") / 100.0, 2).as("open_v"),
            round(col("__hi") / 100.0, 2).as("high_v"),
            round(col("__lo") / 100.0, 2).as("low_v"),
            round(col("__c.cents") / 100.0, 2).as("close_v"),
            col("n_points"))
          .orderBy("user_id", "bucket")
      },
      Some("""WITH e AS (SELECT user_id, epoch_ns(ts) AS t,
            CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE user_id < 30),
        b AS (SELECT user_id, t // 86400000000000 AS bucket, t, cents
          FROM e),
        o AS (SELECT user_id, bucket, cents AS oc FROM (SELECT *,
            row_number() OVER (PARTITION BY user_id, bucket
              ORDER BY t ASC, cents ASC) AS rk FROM b) WHERE rk = 1),
        c AS (SELECT user_id, bucket, cents AS cc FROM (SELECT *,
            row_number() OVER (PARTITION BY user_id, bucket
              ORDER BY t DESC, cents DESC) AS rk FROM b) WHERE rk = 1),
        g AS (SELECT user_id, bucket, min(cents) AS lo, max(cents) AS hi,
            count(*) AS n_points FROM b GROUP BY 1, 2)
        SELECT g.user_id, g.bucket,
          round(o.oc / 100.0, 2) AS open_v, round(g.hi / 100.0, 2) AS high_v,
          round(g.lo / 100.0, 2) AS low_v, round(c.cc / 100.0, 2) AS close_v,
          CAST(g.n_points AS BIGINT) AS n_points
        FROM g JOIN o USING (user_id, bucket) JOIN c USING (user_id, bucket)
        ORDER BY user_id, bucket"""))
  )
}
