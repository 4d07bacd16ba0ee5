package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.RpcPredicate
import graft.operators.{InfluxRpc, Upsert}
import graft.sources.{LineProtocol, Tables}

/** Physical-plan shape assertions — the scale contract, pinned like the
  * reference pins optimizer behavior with EXPLAIN golden files
  * (query_tests/cases/in/pushdown.expected). A query that returns right
  * answers but scans all columns or skips partial aggregation would
  * silently stop scaling; these tests fail on that regression.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parquetTable: String = {
    val tmp = Files.createTempDirectory("graft-planshape").toString
    LineProtocol.ingest(spark, Seq(
      "cpu,host=a,region=west user=22.5,sys=1.0 100",
      "cpu,host=b,region=east user=9.9,sys=0.4 150",
      "cpu,host=a,region=west user=24.0,sys=1.5 200"))("cpu")
      .write.parquet(s"$tmp/cpu")
    s"$tmp/cpu"
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("time-range predicate reaches the parquet scan as a pushed filter") {
    val df = spark.read.parquet(parquetTable)
    val plan = executedPlan(
      RpcPredicate().withRange(100L, 200L).applyTo(df).select("host", "user"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThanOrEqual(time,100)"), plan)
    assert(plan.contains("LessThan(time,200)"), plan)
  }

  test("projection prunes the parquet read schema to referenced columns") {
    val df = spark.read.parquet(parquetTable)
    val plan = executedPlan(df.filter($"time" >= 100L).select("host", "user"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("host") && readSchema.contains("user"), readSchema)
    assert(!readSchema.contains("sys") && !readSchema.contains("region"), readSchema)
  }

  test("star-schema join broadcasts the small dimension side") {
    val d = sf("sf0.001")
    val plan = executedPlan(Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)), $"o_custkey" === $"c_custkey")
      .groupBy("c_mktsegment").count())
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("upsert dedup aggregates with map-side partial aggregation") {
    val df = Seq(("a", 1L, 1.0, 1L), ("a", 1L, 2.0, 2L)).toDF("tag", "time", "v", "seq")
    val plan = executedPlan(Upsert.dedup(df, Seq("tag", "time"), "seq"))
    // struct-max is sort-aggregated (structs aren't hash-aggregable);
    // the scale property is the partial (map-side) phase below the exchange
    assert(plan.contains("partial_max"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("bounded top-k aggregates partially before the shuffle") {
    val scored = (1 to 100).map(i => (i % 2, i.toDouble, i.toLong))
      .toDF("g", "score", "id")
    val ranked = scored.groupBy($"g")
      .agg(graft.functions.TopK.topK(3)($"score", $"id").as("tk"))
    val plan = executedPlan(ranked)
    // ObjectHashAggregate partial_topkaggregator below the exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.toLowerCase.contains("partial_topkagg"), plan)
    // and the values are the window-equivalent answer
    val top = ranked.filter($"g" === 1).select(explode($"tk")).select("col.id")
      .as[Long].collect().toSeq
    assert(top == Seq(99L, 97L, 95L))
  }

  // TwoMeasurementsPredicatePushDown (scenarios.rs:281) — the reference
  // pins these 11 WHERE clauses' pushdown behavior in
  // query_tests/cases/in/pushdown.{sql,expected}; row counts transcribed
  // from the fixture, pushdown asserted in Spark's PushedFilters terms
  test("pushdown golden matrix: 11 predicate shapes reach the scan (pushdown.sql)") {
    // the default 100-char metadata cap truncates PushedFilters mid-list
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val tmp = Files.createTempDirectory("graft-pushdown").toString
    LineProtocol.ingest(spark, Seq(
      "restaurant,town=andover count=40000u,system=5.0 100",
      "restaurant,town=reading count=632u,system=5.0 120",
      "restaurant,town=bedford count=189u,system=7.0 110",
      "restaurant,town=tewsbury count=471u,system=6.0 110",
      "restaurant,town=lexington count=372u,system=5.0 100",
      "restaurant,town=lawrence count=872u,system=6.0 110",
      "restaurant,town=reading count=632u,system=6.0 130"))("restaurant")
      .write.parquet(s"$tmp/restaurant")
    val r = spark.read.parquet(s"$tmp/restaurant")

    // (where clause, expected rows, filters that must appear in the scan)
    val cases: Seq[(org.apache.spark.sql.Column, Int, Seq[String])] = Seq(
      (lit(true), 7, Nil),
      ($"count" > 200, 6, Seq("GreaterThan(count,200)")),
      // float literal vs integer column: the cast blocks pushdown in the
      // reference too (its 2.2 expected keeps CAST..Float64 in FilterExec)
      ($"count" > 200.0, 6, Nil),
      ($"system" > 4.0, 7, Seq("GreaterThan(system,4.0)")),
      ($"count" > 200 && $"town" =!= "tewsbury", 5,
        Seq("GreaterThan(count,200)", "Not(EqualTo(town,tewsbury))")),
      ($"count" > 200 && $"town" =!= "tewsbury" &&
        ($"system" === 5.0 || $"town" === "lawrence"), 4,
        Seq("GreaterThan(count,200)", "Not(EqualTo(town,tewsbury))",
          "Or(EqualTo(system,5.0),EqualTo(town,lawrence))")),
      ($"count" > 200 && $"town" =!= "tewsbury" &&
        ($"system" === 5.0 || $"town" === "lawrence") && $"count" < 40000, 3,
        Seq("GreaterThan(count,200)", "LessThan(count,40000)")),
      ($"count" > 200 && $"count" < 40000, 5,
        Seq("GreaterThan(count,200)", "LessThan(count,40000)")),
      ($"system" > 4.0 && $"system" < 7.0, 6,
        Seq("GreaterThan(system,4.0)", "LessThan(system,7.0)")),
      ($"system" > 5.0 && $"system" < 7.0, 3,
        Seq("GreaterThan(system,5.0)", "LessThan(system,7.0)")),
      ($"system" > 5.0 && $"town" =!= "tewsbury" && lit(7.0) > $"system", 2,
        Seq("GreaterThan(system,5.0)", "LessThan(system,7.0)")),
      ($"system" > 5.0 && lit("tewsbury") =!= $"town" && $"system" < 7.0 &&
        ($"count" === 632 || $"town" === "reading"), 1,
        Seq("Or(EqualTo(count,632),EqualTo(town,reading))")),
      (lit(5.0) < $"system" && $"town" =!= "tewsbury" && $"system" < 7.0 &&
        ($"count" === 632 || $"town" === "reading") && $"time" > 130L, 0,
        Seq("GreaterThan(time,130)")))
    for (((cond, n, pushed), i) <- cases.zipWithIndex) {
      val q = r.filter(cond)
      assert(q.count() == n, s"case $i: wrong row count")
      val plan = executedPlan(q)
      pushed.foreach(p => assert(plan.contains(p), s"case $i: $p not pushed\n$plan"))
    }
  }

  test("ANN top-k: broadcast joins + partial TopK aggregate, no sort-merge join") {
    // pins the ann_brute_topk / ann_ivf_topk physical shape: the query
    // (and centroid/probe) sides broadcast, the top-k is the bounded
    // partial aggregate, and nothing falls back to a sort-merge join —
    // the plan flap that would explain bench drift without a code change
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddingsRaw(spark, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val brute = executedPlan(
      graft.pipeline.Similarity.bruteForceTopK(emb, q, k = 10))
    assert(brute.contains("BroadcastNestedLoopJoin"), brute)
    assert(brute.toLowerCase.contains("partial_topkagg"), brute)
    assert(!brute.contains("SortMergeJoin"), brute)

    val centroids = emb.filter(pmod($"vec_id", lit(50)) === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val ivf = executedPlan(
      graft.pipeline.Similarity.ivfTopK(emb, centroids, q, k = 5, nprobe = 3))
    assert(ivf.contains("BroadcastNestedLoopJoin"), ivf)
    assert(ivf.toLowerCase.contains("partial_topkagg"), ivf)
    assert(!ivf.contains("SortMergeJoin"), ivf)

    // ADC over PQ codes: same broadcast + bounded-aggregate posture —
    // the scan side carries only the code table, and the per-query
    // distance tables enter as literal arrays (no join to build them)
    val (codes, cb) = graft.pipeline.Clustering.pqFit(
      emb, "vec_id", "embedding", m = 4, k = 4, iters = 0)
    val pq = executedPlan(graft.pipeline.Similarity.pqTopK(codes, cb, q, k = 5))
    assert(pq.contains("BroadcastNestedLoopJoin"), pq)
    assert(pq.toLowerCase.contains("partial_topkagg"), pq)
    assert(!pq.contains("SortMergeJoin"), pq)
  }

  test("r10 retrieval/audit operators: broadcast fan-outs, partial " +
      "aggregates, single-scan/single-shuffle shapes") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)

    // bm25MultiQuery: the (query, term) table and df/stats broadcast onto
    // the tf stream — never a sort-merge join, never a corpus-wide index
    val multi = executedPlan(graft.pipeline.Ranking.bm25MultiQuery(
      docs, "doc_id", "text",
      Seq("qa" -> Seq("scan", "merge"), "qb" -> Seq("filter"))))
    assert(multi.contains("BroadcastHashJoin"), multi)
    assert(!multi.contains("SortMergeJoin"), multi)

    // ivfTopKIndexed: probes broadcast onto the index (equality join on
    // the list id), top-k is the bounded partial aggregate — the index
    // side is never sort-merge-joined or re-shuffled for assignment
    val emb = Tables.embeddingsRaw(spark, d)
    val cents = emb.filter(pmod($"vec_id", lit(50)) === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val q = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val idx = graft.pipeline.Similarity.ivfIndex(emb, cents)
    val served = executedPlan(graft.pipeline.Similarity.ivfTopKIndexed(
      idx, cents, q, k = 5, nprobe = 2))
    assert(served.contains("BroadcastHashJoin"), served)
    assert(served.toLowerCase.contains("partial_topkagg"), served)
    assert(!served.contains("SortMergeJoin"), served)

    // cdcChunks: the per-doc window and the (doc, chunk) aggregate share
    // ONE hash exchange (the aggregate's clustering is satisfied by the
    // window's doc partitioning — no second shuffle)
    val cdc = executedPlan(
      graft.pipeline.Packing.cdcChunks(docs, "doc_id", "text", mask = 8))
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(cdc).size
    assert(nExchanges == 1, s"expected 1 exchange, got $nExchanges\n$cdc")

    // misraGries: map-side partial aggregation — the k-counter summary
    // reduces per task before anything shuffles
    val hh = executedPlan(docs
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .agg(graft.functions.HeavyHitters.misraGries(8)($"t")))
    assert(hh.toLowerCase.contains("partial_misragries"), hh)

    // rrfFuse: fusion of already-bounded lists — the per-group result is
    // the bounded partial TopK aggregate, never a window sort or a
    // sort-merge join
    val lexList = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q", "id", "rank")
    val semList = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q", "id", "rank")
    val rrf = executedPlan(graft.pipeline.Similarity.rrfFuse(
      Seq(lexList, semList), "q", "id", "rank", k = 5))
    assert(rrf.toLowerCase.contains("partial_topkagg"), rrf)
    assert(!rrf.contains("SortMergeJoin") && !rrf.contains("WindowExec"), rrf)

    // labelCentroidCosines: the corpus scan happens exactly once — in
    // the eager localCheckpoint of the metadata-sized (label, dim)
    // aggregate — so the served plan (five references to that frame)
    // reads the checkpointed RDD and NEVER re-touches the corpus
    val cent = executedPlan(graft.pipeline.Clustering.labelCentroidCosines(
      emb, "label", "embedding"))
    val nScans = "Scan parquet".r.findAllIn(cent).size
    assert(nScans == 0, s"expected 0 corpus scans (checkpointed " +
      s"metadata frame), got $nScans\n$cent")
    assert(cent.contains("ExistingRDD"), cent)
  }

  test("r12 operators: broadcast metadata joins, no sort-merge, " +
      "checkpointed iteration bases") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)

    // weightedJaccardPairs: the 1-row corpus count broadcasts onto the
    // index (nested-loop on a single row is free); candidate counting
    // and weight totals are hash aggregates — never a sort-merge join
    val wj = executedPlan(graft.pipeline.DocDedup.weightedJaccardPairs(
      docs, "doc_id", "text", n = 3, threshold = 0.5))
    assert(wj.contains("BroadcastNestedLoopJoin") ||
      wj.contains("BroadcastHashJoin"), wj)
    assert(!wj.contains("SortMergeJoin"), wj)
    assert(!wj.contains("CartesianProduct"), wj)

    // unimaxMix: the corpus reduces to ONE strata-sized aggregate; the
    // water-filling windows run over that frame, so the plan carries
    // exactly one corpus-side hash exchange (count per stratum) before
    // the single-partition window exchange
    val um = executedPlan(graft.pipeline.Sampling.unimaxMix(
      docs, "lang", budget = 900L, capEpochs = 2))
    assert(!um.contains("SortMergeJoin"), um)
    val corpusScans = "Scan parquet".r.findAllIn(um).size
    assert(corpusScans == 1, s"expected 1 corpus scan, got $corpusScans\n$um")

    // coverageSelect: the shingled corpus is checkpointed ONCE — the
    // returned picks frame is driver rows (LocalTableScan), no lingering
    // corpus lineage
    val cs = executedPlan(graft.pipeline.Sampling.coverageSelect(
      docs, "doc_id", "text", n = 3, k = 2))
    assert(cs.contains("LocalTableScan"), cs)
    assert(!cs.contains("Scan parquet"), cs)
  }

  test("r10 correlated subqueries decorrelate: scalar -> aggregate join, " +
      "EXISTS/NOT EXISTS -> semi/anti joins") {
    val d = sf("sf0.001")
    graft.sources.SqlFrontend.register(spark, Map(
      "lineitem" -> Tables.lineitem(spark, d),
      "part" -> Tables.part(spark, d),
      "supplier" -> Tables.supplier(spark, d),
      "orders" -> Tables.orders(spark, d)))
    // q17 shape: the per-part average must run ONCE as an aggregate
    // joined back, never as a per-outer-row re-scan
    val q17 = executedPlan(spark.sql(
      """SELECT count(*) FROM lineitem l1
        WHERE l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey)"""))
    assert(!q17.contains("Subquery"), q17) // decorrelated, not re-executed
    // the decorrelated shape specifically: an average AGGREGATED BY the
    // correlation key (the outer count(*) would satisfy a bare
    // "HashAggregate" check, proving nothing)
    assert("keys=\\[l_partkey#\\d+L?\\], functions=\\[(partial_)?avg".r
      .findFirstIn(q17).isDefined, q17)
    // q18 shape: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti
    val q18 = executedPlan(spark.sql(
      """SELECT s_name, count(*) FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name"""))
    assert(q18.contains("LeftSemi"), q18)
    assert(q18.contains("LeftAnti"), q18)
  }

  test("r11 q19/q20 shapes: disjunctive bands keep per-side pushdown; " +
      "uncorrelated scalar threshold runs once, anti join plans LeftAnti") {
    val d = sf("sf0.001")
    graft.sources.SqlFrontend.register(spark, Map(
      "lineitem" -> Tables.lineitem(spark, d),
      "part" -> Tables.part(spark, d),
      "customer" -> Tables.customer(spark, d),
      "orders" -> Tables.orders(spark, d)))
    // q19 shape: from the OR-of-conjuncts, the optimizer must still
    // derive a PER-SIDE residual (brand IN (...) on the part scan,
    // quantity range on lineitem) so both scans prune before the join
    val q19 = executedPlan(spark.sql(
      """SELECT count(*) FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)"""))
    assert("PushedFilters: \\[[^\\]]*In\\(p_brand".r.findFirstIn(q19)
      .isDefined || q19.contains("p_brand#"), q19)
    // the quantity disjunction's hull must prune the lineitem scan:
    // l_quantity >= 1 AND <= 40 is derivable from the OR
    assert("GreaterThanOrEqual\\(l_quantity".r.findFirstIn(q19).isDefined,
      s"lineitem scan keeps no quantity bound:\n$q19")
    // q20 shape: the uncorrelated scalar average is a one-row subquery
    // (executed once), and NOT EXISTS plans as LeftAnti on the hash key
    val q20 = executedPlan(spark.sql(
      """SELECT count(*) FROM customer
        WHERE CAST(round(c_acctbal * 100) AS BIGINT) >
            (SELECT avg(CAST(round(c_acctbal * 100) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
            WHERE o_custkey = c_custkey)"""))
    assert(q20.contains("LeftAnti"), q20)
    assert(q20.contains("Subquery") || q20.contains("scalar-subquery"),
      s"scalar threshold should run as a one-shot subquery:\n$q20")
  }

  test("r11 filtered ANN: the attribute predicate pushes down to the " +
      "persisted index's parquet scan") {
    // the filteredTopKIndexed contract: attributes carried into the
    // index at build time mean the filter prunes the SCAN (row-group
    // stats / partition pruning), not a post-scan residual-only filter
    import graft.pipeline.Similarity
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cents = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val index = Similarity.ivfIndex(emb, cents, carryCols = Seq("label"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-pushdown").toString
    index.write.mode("overwrite").partitionBy("c_id").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val q = emb.filter($"vec_id" === 1L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val plan = executedPlan(Similarity.filteredTopKIndexed(
      persisted, cents, q, $"label" === 3, k = 5, nprobe = 2))
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(label,3\\)".r
      .findFirstIn(plan).isDefined,
      s"label predicate must reach the index parquet scan:\n$plan")
  }

  test("r10 repeatedSpans: one positional-shingle explode, keyed windows, " +
      "no join") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter($"doc_id" < 50)
    val plan = executedPlan(graft.pipeline.DocDedup.repeatedSpans(
      docs, "doc_id", "text", k = 6, minRun = 2))
    // the corpus-sized tokenize+explode stage must appear ONCE — the
    // count-aggregate + semi-join formulation evaluated it per side
    assert("Generate explode".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    // both windows are keyed (shingle count, per-doc islands) — an
    // unpartitioned window would single-task the corpus
    val specs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(s =>
      s.contains("sh") || s.contains("__id")), plan)
    // keep-first adds its rank INSIDE the existing shingle partition:
    // still one explode, still no join, still only keyed windows
    val kf = executedPlan(graft.pipeline.DocDedup.repeatedSpansKeepFirst(
      docs, "doc_id", "text", k = 6, minRun = 2))
    assert("Generate explode".r.findAllIn(kf).size == 1, kf)
    assert(!kf.contains("Join"), kf)
    val kfSpecs = "windowspecdefinition\\(([^,]*)".r
      .findAllMatchIn(kf).map(_.group(1)).toSeq
    assert(kfSpecs.nonEmpty && kfSpecs.forall(s =>
      s.contains("sh") || s.contains("__id")), kf)
  }

  test("r8 operators: IVF-PQ cell join broadcasts; covariance partial-aggregates") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.embeddingsRaw(spark, d)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val (cells, coarse) = graft.pipeline.Clustering.kmeansFit(
      emb, "vec_id", "embedding", k = 8, iters = 0)
    val (codes, cb) = graft.pipeline.Clustering.pqFit(
      emb, "vec_id", "embedding", m = 4, k = 4, iters = 0)
    val ivfpq = executedPlan(graft.pipeline.Similarity.ivfPqTopK(
      codes, cells, coarse, cb, q, k = 10, nprobe = 3))
    // the candidate cut is a broadcast join on the cell id (the probe
    // side is queries×nprobe rows), the top-k the bounded partial
    // aggregate; nothing falls back to a sort-merge join
    assert(ivfpq.contains("BroadcastHashJoin"), ivfpq)
    assert(ivfpq.toLowerCase.contains("partial_topkagg"), ivfpq)
    assert(!ivfpq.contains("SortMergeJoin"), ivfpq)

    // covariance: the n·d² pair stream partial-aggregates BELOW its
    // exchange — the shuffle carries d(d+1)/2 group sums per task, not
    // exploded pairs — and no join degenerates to a cartesian product
    // over data rows (the single-row total is a broadcast nested loop)
    val cov = executedPlan(
      graft.pipeline.Quantization.covariance(emb, "embedding"))
    assert(cov.toLowerCase.contains("partial_sum"), cov)
    assert(!cov.contains("CartesianProduct"), cov)
    assert(!cov.contains("SortMergeJoin"), cov)
  }

  test("r7 operators: partial aggs, keyed windows, broadcast sides (plan pins)") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.{SeriesFunctions => SF}
    val ev = Tables.events(spark, d).filter($"user_id" < 5)
      .select($"user_id", $"ts_ns".as("t"),
        round($"value" * 100).cast("long").as("cents"))
    // LTOB: per-bucket argmax is a map-side-combining max aggregate (no
    // rank window) and the neighbor window is keyed — never unpartitioned
    val ltob = executedPlan(
      SF.ltobDownsample(ev, Seq("user_id"), "t", "cents", 86400000000000L))
    assert(ltob.contains("partial_max"), ltob)
    assert(!ltob.contains("Window [")
      || ltob.contains("windowspecdefinition(user_id"), ltob)
    // promRate: ONE exchange — the in-bucket lag window and the bucket
    // aggregate share the (keys, bucket)-compatible partitioning
    val rate = executedPlan(
      SF.promRate(ev, Seq("user_id"), "t", "cents", 21600000000000L, "r"))
    assert("Exchange hashpartitioning".r.findAllIn(rate).size == 1, rate)
    assert(rate.contains("partial_"), rate)
    // HLL registers: map-side-combining max into a metadata-sized table
    val docs = Tables.documentsRaw(spark, d)
    val hll = executedPlan(graft.pipeline.DocDedup.hllRegisters(
      docs.select($"source", $"text"), "text", Seq("source"), p = 8))
    assert(hll.contains("partial_max"), hll)
    // fixed-size sample: bounded partial TopK, no rank window
    val fs = executedPlan(graft.pipeline.Sampling.fixedSizeSample(
      docs, "lang", "doc_id", n = 5))
    assert(fs.toLowerCase.contains("partial_topkagg"), fs)
    assert(!fs.contains("row_number"), fs)
    // ngramPrecision: the reference count table joins without a
    // sort-merge of the candidate side at this scale (broadcast/AQE)
    val prec = executedPlan(graft.pipeline.Ranking.ngramPrecision(
      docs.filter($"source" === "src0"), docs.filter($"source" =!= "src0"),
      "doc_id", "text", 1))
    assert(prec.contains("partial_count") || prec.contains("partial_sum"), prec)
  }

  test("deterministic sampling is a scan-level filter with no shuffle") {
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
    val plan = executedPlan(
      graft.pipeline.Sampling.deterministicSample(docs, "doc_id", 37))
    assert(!plan.contains("Exchange"), plan) // pure filter: zero shuffles
    assert(plan.contains("Filter"), plan)
  }

  test("two-level rank operators never plan a corpus-wide single partition") {
    // perplexityBuckets / madOutliers / budgetSelect put ONLY their
    // driver-sized histogram through a SinglePartition exchange; the
    // corpus path must stay hash-partitioned (the whole point of the
    // two-level shape). A corpus-side global window would show up as a
    // Window above an Exchange SinglePartition over the scan.
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
      .select($"doc_id", $"lang",
        graft.functions.TextFunctions.qualityScore($"text").as("q"))
    val ppl = executedPlan(graft.pipeline.LanguageModel
      .perplexityBuckets(docs, "doc_id", "lang", "q"))
    val mad = executedPlan(graft.pipeline.Sampling
      .madOutliers(docs, "doc_id", "lang", "q"))
    for ((name, plan) <- Seq("perplexityBuckets" -> ppl, "madOutliers" -> mad)) {
      // every rangepartitioning (window sort) must sit above a tiny
      // aggregated frame, never above the raw corpus scan: the corpus
      // windows here partition by (lang[, bucket]) hash keys instead
      assert(plan.contains("Exchange hashpartitioning"), s"$name:\n$plan")
      // split assignment stays a pure projection
    }
    val splits = executedPlan(graft.pipeline.Sampling
      .assignSplits(docs, "doc_id", 100000L, 50000L))
    assert(!splits.contains("Exchange"), splits)

    val rebal = executedPlan(graft.pipeline.Sampling.rebalance(
      docs.select($"doc_id", $"lang"), "lang", "doc_id",
      Map("en" -> 500000L, "de" -> 500000L)))
    // the corpus path is scan -> broadcast joins -> filter; the only
    // exchange is the strata-sized count aggregate
    assert(rebal.contains("BroadcastHashJoin") ||
      rebal.contains("BroadcastNestedLoopJoin"), rebal)
    assert(!rebal.contains("SortMergeJoin"), rebal)
  }

  test("decontamination broadcasts the benchmark hash set; one shuffle for the doc aggregate") {
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
    val plan = executedPlan(graft.pipeline.Sampling.decontaminate(
      docs, docs.filter($"doc_id" % 13 === 0), "doc_id", "text"))
    // corpus side never sort-merge-joins against the benchmark
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // plain counts partial-aggregate before the single doc-grain shuffle;
    // a count_distinct formulation would add an (id, hash)-grain exchange
    assert(plan.contains("partial_count"), plan)
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 2, s"$shuffles shuffles (bench distinct + doc agg expected):\n$plan")
  }

  test("InfluxQL time bounds and tag predicates reach the parquet scan") {
    import graft.operators.{InfluxMeasurement, InfluxQlPlanner}
    val df = spark.read.parquet(parquetTable)
    val plan = executedPlan(InfluxQlPlanner.run(
      Map("cpu" -> InfluxMeasurement(df, "time", Seq("host", "region"))),
      "SELECT user FROM cpu WHERE host = 'a' AND time >= 100 AND time < 200"))
    // query TEXT through the frontend ends at the same pushed scan the
    // DataFrame path gets: bounds + tag equality in PushedFilters, read
    // schema pruned to the referenced columns
    assert(plan.contains("GreaterThanOrEqual(time,100)"), plan)
    assert(plan.contains("LessThan(time,200)"), plan)
    assert(plan.contains("EqualTo(host,a)"), plan)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("sys") && !readSchema.contains("region"),
      readSchema)
  }

  test("bm25 broadcasts df/stats and never builds a corpus-wide index") {
    val docs = (1 to 50).map(i => (i.toLong, s"alpha beta doc $i"))
      .toDF("doc_id", "text")
    val plan = executedPlan(
      graft.pipeline.Ranking.bm25(docs, "doc_id", "text", Seq("alpha")))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // tf shuffle happens AFTER the term filter: the exploded occurrences
    // are filtered to the query terms below the first exchange
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    val filterIdx = plan.indexOf("alpha")
    assert(exchangeIdx >= 0 && filterIdx >= 0, plan)
  }

  test("budgetSelect windows only the boundary bucket, never the corpus") {
    val docs = (1 to 100).map(i => (i.toLong, (i % 10) / 10.0, 10L))
      .toDF("id", "q", "n")
    val plan = executedPlan(
      graft.pipeline.Sampling.budgetSelect(docs, "id", "q", "n", 300L))
    // the in-bucket running sum partitions BY bucket — a global (empty
    // partition-by) running sum over the corpus would be a scale bug
    val windows = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windows.exists(_.contains("__bk")), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("weighted sampling and epoch mixing stay shuffle-free scan transforms") {
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
      .select($"doc_id", $"lang", lit(0.5).as("w"))
    val wPlan = executedPlan(
      graft.pipeline.Sampling.weightedSample(docs, "doc_id", "w", 3, 5))
    assert(!wPlan.contains("Exchange"), wPlan)
    val mPlan = executedPlan(graft.pipeline.Sampling.mixEpochs(
      docs.select("doc_id", "lang"), "lang", "doc_id",
      Map("de" -> 2500000L)))
    assert(!mPlan.contains("Exchange"), mPlan) // explode ≠ shuffle
    assert(mPlan.contains("Generate explode"), mPlan)
  }

  test("int8 encode is a zero-shuffle map; stats reduce before their exchange") {
    val emb = Tables.embeddingsRaw(spark, sf("sf0.001"))
    val stats = executedPlan(
      graft.pipeline.Quantization.int8Stats(emb, "embedding"))
    // partial min/max combine map-side; only dim-sized rows cross the wire
    assert(stats.contains("partial_min"), stats)
    val encoded = executedPlan(graft.pipeline.Quantization
      .quantizeInt8(spark, emb, "vec_id", "embedding"))
    assert(!encoded.contains("Exchange"), encoded) // codebook is literal arrays
  }

  test("incremental dedup broadcasts the batch side against the corpus index") {
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    val batch = docs.filter($"doc_id" % 7 === 0)
    val p = graft.pipeline.DocDedup.MinHashParams(32, 16)
    val idx = graft.pipeline.DocDedup.lshIndex(corpus, "doc_id", "text", 3, p)
    val plan = executedPlan(graft.pipeline.DocDedup.incrementalNearDups(
      corpus, idx, batch, "doc_id", "text", 3, 0.7, p))
    // the bucket join must not sort-merge the corpus index
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("naive bayes count tables broadcast onto the occurrence stream") {
    val docs = Tables.documentsRaw(spark, sf("sf0.001"))
    val plan = executedPlan(graft.pipeline.LanguageModel
      .naiveBayesClassify(docs, "doc_id", "lang", "text"))
    // vocab-sized tables broadcast; the corpus-grain joins never sort-merge
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // #classes fan-out
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("readFilter whole plan stays shuffle-free up to the ordering") {
    val df = spark.read.parquet(parquetTable)
    val tagged = spark.createDataFrame(
      df.select("host", "region", "user", "sys", "time").rdd,
      org.apache.spark.sql.types.StructType(Seq(
        graft.core.IoxSchema.tagged("host", org.apache.spark.sql.types.StringType, graft.core.IoxSchema.Tag),
        graft.core.IoxSchema.tagged("region", org.apache.spark.sql.types.StringType, graft.core.IoxSchema.Tag),
        graft.core.IoxSchema.tagged("user", org.apache.spark.sql.types.DoubleType, graft.core.IoxSchema.Field),
        graft.core.IoxSchema.tagged("sys", org.apache.spark.sql.types.DoubleType, graft.core.IoxSchema.Field),
        graft.core.IoxSchema.tagged("time", org.apache.spark.sql.types.LongType, graft.core.IoxSchema.Time))))
    val plan = executedPlan(InfluxRpc.readFilter(tagged, RpcPredicate(), globalSort = false))
    // clustered (non-global) form: exactly the tag repartition, no extra sort shuffle
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("r12 additions: predictLinear/acf/hdr/range-search plan pins") {
    val d = "/root/testdata/sf0.001"
    import graft.functions.{SeriesFunctions => SF, InfluxAggregates => IA}
    val b = Tables.events(spark, d).filter($"user_id" < 5)
      .select($"user_id", expr("ts_ns div 21600000000000").as("hr"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy("user_id", "hr").agg(sum("cents").as("y"))
    // predictLinear: ONE partial-aggregating groupBy per series, no window
    val pl = executedPlan(
      SF.predictLinear(b, Seq("user_id"), "hr", "y", horizon = 4L))
    assert(pl.contains("partial_"), pl)
    assert(!pl.contains("Window ["), pl)
    // acf: the lag columns ride ONE keyed window exchange, then a partial
    // agg — never one Window operator per lag
    val ac = executedPlan(SF.acf(b, Seq("user_id"), "hr", "y", maxLag = 3))
    assert("Window \\[".r.findAllIn(ac).size == 1,
      s"the 3 lags must collapse into one Window operator:\n$ac")
    assert(ac.contains("windowspecdefinition(user_id"), ac)
    assert(ac.contains("partial_"), ac)
    // hdr sketch: a plain partial-aggregating count groupBy (mergeable);
    // the quantile pick windows only the bucket frame, keyed
    val ev = Tables.events(spark, d)
      .select($"event_type", round($"value" * 100).cast("long").as("c"))
    val sk = IA.hdrSketch(ev, Seq("event_type"), "c")
    assert(executedPlan(sk).contains("partial_count"), executedPlan(sk))
    val hq = executedPlan(IA.hdrQuantiles(sk, Seq("event_type"), Seq(50, 99)))
    assert(hq.contains("windowspecdefinition(event_type"), hq)
    // range search: probes broadcast onto the index — no sort-merge join,
    // no ranking window/TopK on the scoring path (threshold filter only)
    val emb = Tables.embeddings(spark, d)
      .withColumn("embedding",
        graft.functions.VectorFunctions.microVec($"embedding"))
    val cents = emb.filter(pmod($"vec_id", lit(20)) === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val index = graft.pipeline.Similarity.ivfIndex(emb, cents,
      microRank = true)
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val rs = executedPlan(graft.pipeline.Similarity.ivfRangeIndexed(
      index, cents, q, minCosMicro = 150000L, nprobe = 2))
    assert(rs.contains("BroadcastHashJoin"), rs)
    assert(!rs.contains("SortMergeJoin"), rs)
    assert(!rs.contains("row_number"), rs)
    // the probe SELECTION may rank (bounded TopK over nprobe candidates),
    // but the index-scoring side must not re-rank: the only TopK in the
    // plan is the probe pick
    assert("TopKAgg".r.findAllIn(rs).size <= 2, rs)
    // maxsim: query parts broadcast onto ONE chunk scan; max-then-sum
    // collapse the pair expansion with map-side partials; no corpus
    // window anywhere
    val chunks = emb.select(expr("vec_id div 5").as("doc_id"), $"embedding")
    val qp = emb.filter($"vec_id" < 13 && pmod($"vec_id", lit(5)) < 3)
      .select(expr("vec_id div 5").as("q_id"),
        pmod($"vec_id", lit(5)).as("part_id"), $"embedding".as("q_vec"))
    val ms = executedPlan(
      graft.pipeline.Similarity.maxSimTopK(chunks, qp, k = 5))
    assert(ms.contains("BroadcastNestedLoopJoin")
      || ms.contains("BroadcastHashJoin"), ms)
    assert(!ms.contains("SortMergeJoin"), ms)
    assert(ms.contains("partial_max"), ms)
    assert(!ms.contains("row_number"), ms)
  }
}
