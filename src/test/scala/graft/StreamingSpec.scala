package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.LineProtocol
import graft.streaming.Ingest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("LP stream -> parse -> partitioned parquet persist -> readable") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val srcDir = s"$tmp/src"; val outDir = s"$tmp/table"; val ck = s"$tmp/ck"
    new java.io.File(srcDir).mkdirs()
    val dayNs = 86400L * 1000000000L
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/batch1.txt"),
      Seq(
        s"cpu,host=a user=1.0 ${dayNs + 5}",
        s"cpu,host=b user=2.0 ${2 * dayNs + 5}",
        s"cpu,host=a user=3.0 ${2 * dayNs + 6}").mkString("\n"))

    val schema = LineProtocol.inferSchema(
      LineProtocol.parseLines(Seq("cpu,host=a user=1.0 1")).toSeq)
    val lines = spark.readStream.text(srcDir).as[String]
    val parsed = Ingest.parseStream(lines, "cpu", schema)
    val q = Ingest.startPersist(parsed, outDir, ck)
    q.awaitTermination(60000)

    val persisted = spark.read.parquet(outDir)
    assert(persisted.count() == 3)
    // date-partitioned layout exists (partition pruning applies)
    assert(persisted.select("part_date").distinct().count() == 2)
    val hosts = persisted.select("host").as[String].collect().toSet
    assert(hosts == Set("a", "b"))
  }

  test("compact: dedup + sort + rewrite; hotColdView prefers hot rows") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    // two "chunks" with an overlapping PK (host=a, time=10)
    val chunk1 = LineProtocol.ingest(spark, Seq(
      "m,host=a v=1.0 10", "m,host=b v=2.0 20"))("m")
    val chunk2 = LineProtocol.ingest(spark, Seq(
      "m,host=a v=9.0 10", "m,host=c v=3.0 30"))("m")
    chunk1.write.parquet(s"$tmp/raw/c1")
    chunk2.write.parquet(s"$tmp/raw/c2")

    val view = Ingest.hotColdView(hot = chunk2, cold = chunk1, pkCols = Seq("host", "time"))
    val got = view.orderBy("host").select("host", "v").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 9.0), ("b", 2.0), ("c", 3.0)))

    Ingest.compact(spark, s"$tmp/raw/c1", s"$tmp/compacted", Seq("host", "time"))
    val compacted = spark.read.parquet(s"$tmp/compacted")
    assert(compacted.count() == 2)
  }

  test("checkpointed ingest replays exactly once across restarts") {
    // the reference rebuilds MUB state from the write buffer on restart
    // (perform_replay, db.rs:518); Structured Streaming checkpoints give
    // the same exactly-once property: re-running the query must not
    // re-ingest already-committed input
    val tmp = Files.createTempDirectory("graft-replay").toString
    val srcDir = s"$tmp/src"; val outDir = s"$tmp/table"; val ck = s"$tmp/ck"
    new java.io.File(srcDir).mkdirs()
    val schema = LineProtocol.inferSchema(
      LineProtocol.parseLines(Seq("cpu,host=a user=1.0 1")).toSeq)
    def runOnce(): Unit = {
      val parsed = Ingest.parseStream(
        spark.readStream.text(srcDir).as[String], "cpu", schema)
      val q = Ingest.startPersist(parsed, outDir, ck)
      q.awaitTermination(60000)
    }
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/b1.txt"),
      "cpu,host=a user=1.0 86400000000005\ncpu,host=b user=2.0 86400000000006")
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2)
    Files.writeString(java.nio.file.Paths.get(s"$srcDir/b2.txt"),
      "cpu,host=c user=3.0 86400000000007")
    runOnce()
    val rows = spark.read.parquet(outDir)
    assert(rows.count() == 3) // b1 NOT re-ingested
    assert(rows.select("host").as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("streaming window counts finalize once the watermark passes") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)](
      spark)
    val agg = Ingest.streamWindowCounts(
      input.toDF().toDF("tag", "time"), Seq("tag"), everyNs = 1000000000L,
      lateArrival = "0 seconds")
    val q = agg.writeStream.format("memory").queryName("swc")
      .outputMode("append").start()
    try {
      input.addData(("a", 100000000L), ("a", 200000000L), ("b", 1500000000L))
      q.processAllAvailable()
      input.addData(("a", 10000000000L)) // watermark sails past both windows
      q.processAllAvailable()
      val rows = spark.table("swc")
        .select("tag", "time", "n").as[(String, Long, Long)].collect().toSet
      assert(rows.contains(("a", 1000000000L, 2L))) // stop-bound label
      assert(rows.contains(("b", 2000000000L, 1L)))
    } finally q.stop()
  }

  test("streaming dedup: re-arrivals within the watermark are dropped, text stays out of the key") {
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp)](
      spark)
    val ts = (s: Long) => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val out = graft.streaming.StreamDedup.dedupStream(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the quick brown fox", ts(100)),
        (2L, "  The  quick Brown fox ", ts(110)), // normalized dup of 1
        (3L, "a different document", ts(120)))
      q.processAllAvailable()
      input.addData((4L, "the quick brown fox", ts(130))) // dup, next batch
      q.processAllAvailable()
      val kept = spark.table("sdd").select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"kept $kept")
      // distinct hash per surviving content
      assert(spark.table("sdd").select("text_hash").distinct().count() == 2)
    } finally q.stop()
  }

  test("streaming HLL: registers accumulate incrementally, batch parity") {
    // max() is the whole sketch — natively streamable, so approx-distinct
    // over an unbounded stream is the BATCH operator under update mode,
    // with state bounded at 2^p registers per group no matter the stream
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](
      spark)
    val regs = graft.pipeline.DocDedup.hllRegisters(
      input.toDF().toDF("g", "k"), "k", Seq("g"), p = 6)
    val q = regs.writeStream.format("memory").queryName("shll")
      .outputMode("complete").start()
    try {
      input.addData((1 to 300).map(i => ("s", s"key-$i")): _*)
      q.processAllAvailable()
      input.addData((200 to 500).map(i => ("s", s"key-$i")): _*) // overlap
      q.processAllAvailable()
      val streamed = spark.table("shll").as[(String, Long, Int)].collect().toSet
      val batch = graft.pipeline.DocDedup.hllRegisters(
        (1 to 500).map(i => ("s", s"key-$i")).toDF("g", "k"), "k", Seq("g"),
        p = 6).as[(String, Long, Int)].collect().toSet
      assert(streamed == batch, "incremental registers equal the batch build")
      assert(streamed.size <= 64, "state is bounded at 2^p registers")
    } finally q.stop()
  }

  test("streaming count-min sketch: cells accumulate, batch parity") {
    // the CMS build is explode + count — natively streamable; state is
    // the fixed depth×width cell table regardless of stream length
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val cms = graft.pipeline.DocDedup.cmsBuild(
      input.toDF().toDF("k"), "k", width = 32, depth = 3)
    val q = cms.writeStream.format("memory").queryName("scms")
      .outputMode("complete").start()
    try {
      input.addData((1 to 100).map(i => s"k-${i % 7}"): _*)
      q.processAllAvailable()
      input.addData((1 to 50).map(i => s"k-${i % 11}"): _*)
      q.processAllAvailable()
      val streamed = spark.table("scms").as[(Int, Long, Long)].collect().toSet
      val batch = graft.pipeline.DocDedup.cmsBuild(
        ((1 to 100).map(i => s"k-${i % 7}") ++
          (1 to 50).map(i => s"k-${i % 11}")).toDF("k"), "k", 32, 3)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch, "incremental cells equal the batch build")
      assert(streamed.size <= 96, "state bounded at depth x width cells")
    } finally q.stop()
  }

  test("streaming HDR sketch: bucket counts accumulate, batch parity, " +
      "quantiles from the streamed state match the batch pick") {
    // the sketch is groupBy + count — natively streamable; state is the
    // occupied (key, bucket) cells, bounded by the value range's octaves
    // × 32 sub-buckets regardless of stream length. The quantile pick is
    // a metadata-frame batch step over whatever state has accumulated.
    import graft.functions.{InfluxAggregates => IA}
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)](
      spark)
    val sk = IA.hdrSketch(input.toDF().toDF("g", "v"), Seq("g"), "v")
    val q = sk.writeStream.format("memory").queryName("shdr")
      .outputMode("complete").start()
    try {
      input.addData((1L to 600L).map(("s", _)): _*)
      q.processAllAvailable()
      input.addData((401L to 1000L).map(("s", _)): _*) // overlapping range
      q.processAllAvailable()
      val streamed = spark.table("shdr")
        .as[(String, Long, Double, Long)].collect().toSet
      val batch = IA.hdrSketch(
        ((1L to 600L) ++ (401L to 1000L)).map(("s", _)).toDF("g", "v"),
        Seq("g"), "v").as[(String, Long, Double, Long)].collect().toSet
      assert(streamed == batch, "incremental bucket counts equal the batch build")
      val qs = IA.hdrQuantiles(spark.table("shdr"), Seq("g"), Seq(50, 99))
        .as[(String, Int, Double, Long)].collect()
        .map { case (_, p, est, tot) => p -> ((est, tot)) }.toMap
      val bqs = IA.hdrQuantiles(
        IA.hdrSketch(((1L to 600L) ++ (401L to 1000L)).map(("s", _))
          .toDF("g", "v"), Seq("g"), "v"), Seq("g"), Seq(50, 99))
        .as[(String, Int, Double, Long)].collect()
        .map { case (_, p, est, tot) => p -> ((est, tot)) }.toMap
      assert(qs == bqs, "quantiles from streamed state equal the batch pick")
      assert(qs(50)._2 == 1200L, "total rides the state (1200 points seen)")
    } finally q.stop()
  }

  test("streaming OHLC candles: argmin/argmax-by-time struct aggregates " +
      "stream, late arrivals revise open/close, batch parity") {
    // the events_ohlc shape is min/max of (t, cents) structs + plain
    // min/max/count — all mergeable aggregates, so candles stream
    // natively; a LATE point earlier than the current open must revise
    // the candle (complete mode), proving the argmin rides the
    // aggregation state rather than arrival order
    import org.apache.spark.sql.DataFrame
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)](
      spark)
    def candles(df: DataFrame): DataFrame = df
      .toDF("user_id", "t", "cents")
      .withColumn("bucket", expr("t div 1000"))
      .groupBy("user_id", "bucket")
      .agg(min(struct(col("t"), col("cents"))).as("__o"),
        max(struct(col("t"), col("cents"))).as("__c"),
        min("cents").as("lo"), max("cents").as("hi"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("bucket"),
        col("__o.cents").as("open"), col("hi"), col("lo"),
        col("__c.cents").as("close"), col("n"))
    val q = candles(input.toDF()).writeStream.format("memory")
      .queryName("sohlc").outputMode("complete").start()
    try {
      val early = Seq((1L, 500L, 120L), (1L, 900L, 80L), (1L, 1500L, 200L))
      val late = Seq((1L, 100L, 55L), (1L, 950L, 300L)) // 100 < current open t
      input.addData(early: _*)
      q.processAllAvailable()
      val mid = spark.table("sohlc")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(mid.contains((1L, 0L, 120L, 120L, 80L, 80L, 2L)),
        s"pre-late candle wrong: $mid")
      input.addData(late: _*)
      q.processAllAvailable()
      val streamed = spark.table("sohlc")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      val batch = candles((early ++ late).toDF("user_id", "t", "cents"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch, "incremental candles equal the batch build")
      assert(streamed.contains((1L, 0L, 55L, 300L, 55L, 300L, 4L)),
        s"late point must revise open AND high/close: $streamed")
    } finally q.stop()
  }

  test("streaming Misra-Gries heavy hitters: k-counter state, batch parity " +
      "in the exact regime") {
    // the MG summary is a mergeable Aggregator, so Structured Streaming
    // maintains it directly in the state store — one ≤ k-entry map,
    // never a vocabulary-sized state
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](spark)
    val hh = input.toDF().toDF("t")
      .agg(graft.functions.HeavyHitters.misraGries(16)(col("t")).as("hh"))
    val q = hh.writeStream.format("memory").queryName("shh")
      .outputMode("complete").start()
    try {
      input.addData((1 to 100).map(i => s"k-${i % 7}"): _*)
      q.processAllAvailable()
      input.addData((1 to 50).map(i => s"k-${i % 11}"): _*)
      q.processAllAvailable()
      val streamed = spark.table("shh")
        .select(explode(col("hh"))).as[(String, Long)].collect().toMap
      val all = (1 to 100).map(i => s"k-${i % 7}") ++
        (1 to 50).map(i => s"k-${i % 11}")
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(streamed == exact,
        "capacity 16 > 11 distinct keys: streaming summary is exact counts")
    } finally q.stop()
  }

  test("streaming semantic dedup: arrivals flag against the corpus-so-far " +
      "index, survivors fold in, duplicates never enter") {
    import graft.streaming.StreamSemanticDedup
    import graft.pipeline.Similarity
    val centroids = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("c_id", "c_vec")
    val b1 = Seq(
      (0L, Seq(0.9f, 0.1f, 0.0f)), (1L, Seq(0.1f, 0.9f, 0.1f)),
      (2L, Seq(0.8f, 0.0f, 0.3f)))
    val b2 = Seq(
      (10L, Seq(0.1f, 0.9f, 0.1f)),  // exact copy of vector 1 -> dup
      (11L, Seq(0.0f, 0.1f, 0.9f)))  // novel direction -> kept
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])](spark)
    var index = Similarity.ivfIndex(
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"),
      centroids, microRank = true)
    val flags = scala.collection.mutable.ArrayBuffer[(Long, Boolean, Any)]()
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val flagged = StreamSemanticDedup.nearDupsAgainstIndex(
          batch, index, centroids, thresholdMicro = 990000L, nprobe = 2)
        flags ++= flagged.collect().map(r =>
          (r.getLong(0), r.getBoolean(3), r.get(1)))
        val keep = batch.join(
          flagged.filter(!col("is_dup")).select("vec_id"), "vec_id")
        index = StreamSemanticDedup
          .appendToIndex(index, keep, centroids).localCheckpoint()
        ()
      }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val byId = flags.map(f => f._1 -> f).toMap
      assert(byId.size == 5)
      // batch 1 arrives to an empty index: everything kept
      assert(Seq(0L, 1L, 2L).forall(i => !byId(i)._2))
      // the exact copy flags as a duplicate OF vector 1; the novel one keeps
      assert(byId(10L)._2 && byId(10L)._3 == 1L)
      assert(!byId(11L)._2)
      // duplicates never entered the index
      val indexed = index.select("vec_id").as[Long].collect().toSet
      assert(indexed == Set(0L, 1L, 2L, 11L))
      // at-least-once replay: b2 redelivered. The already-indexed id 11
      // must match its OWN copy (the dedup path scores without the
      // retrieval self-id exclusion) and flag, so nothing double-inserts
      flags.clear()
      input.addData(b2: _*); q.processAllAvailable()
      val replay = flags.map(f => f._1 -> f).toMap
      assert(replay(10L)._2, "replayed copy-of-1 still flags")
      assert(replay(11L)._2 && replay(11L)._3 == 11L,
        "replayed indexed vector flags against its own indexed copy")
      assert(index.select("vec_id").as[Long].collect().toSet ==
        Set(0L, 1L, 2L, 11L), "replay inserted no second copy")
    } finally q.stop()
  }

  test("stream-stream interval join: in-horizon pairs only, batch parity") {
    val ts = (s: Long) => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val views = Seq(
      (1L, ts(100), "v1"), (1L, ts(400), "v2"), (2L, ts(100), "v3"))
    val clicks = Seq(
      (1L, ts(150), "c1"),  // 50s after v1: in horizon of v1 only
      (1L, ts(430), "c2"),  // 30s after v2 (330s after v1: out)
      (2L, ts(500), "c3"),  // 400s after v3: out of horizon
      (3L, ts(100), "c4"))  // keyless
    val expect = Set(("v1", "c1"), ("v2", "c2"))

    // batch reference: identical join condition, plain frames
    val batch = graft.streaming.StreamJoin.intervalJoin(
        views.toDF("user_id", "vts", "view"),
        clicks.toDF("user_id", "cts", "click"),
        "user_id", "vts", "cts", horizon = "120 seconds")
      .select($"view", $"click").as[(String, String)].collect().toSet
    assert(batch == expect, s"batch got $batch")

    // streaming: same operator, MemoryStream sides, append sink
    val vIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val cIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val out = graft.streaming.StreamJoin.intervalJoin(
      vIn.toDF().toDF("user_id", "vts", "view"),
      cIn.toDF().toDF("user_id", "cts", "click"),
      "user_id", "vts", "cts", horizon = "120 seconds",
      lateness = "30 seconds")
    val q = out.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      vIn.addData(views: _*)
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      // advance both watermarks far past every horizon so results emit
      // (distinct keys: the nudge rows must not pair with each other)
      vIn.addData((98L, ts(10000), "vx"))
      cIn.addData((99L, ts(10000), "cx"))
      q.processAllAvailable()
      val got = spark.table("ssj").select($"view", $"click")
        .as[(String, String)].collect().toSet
      assert(got == expect, s"stream got $got")
    } finally q.stop()
  }

  test("streaming CUSUM: state carries across batches, batch parity") {
    // the (S+, S-) pair is the whole per-series state; feeding the same
    // in-order points through two micro-batches must reproduce the batch
    // scan bit for bit
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Double)](
      spark)
    val flags = graft.streaming.StreamDetect.cusumStream(
      input.toDF().toDF("k", "t", "v"),
      "k", "t", "v", target = 50.0, slack = 1.0, threshold = 4.0)
    val q = flags.writeStream.format("memory").queryName("scusum")
      .outputMode("append").start()
    try {
      input.addData(("a", 1L, 50.0), ("a", 2L, 52.0), ("b", 1L, 47.0))
      q.processAllAvailable()
      input.addData(("a", 3L, 53.0), ("a", 4L, 53.0), ("b", 2L, 46.0))
      q.processAllAvailable()
      val streamed = spark.table("scusum")
        .as[(String, Long, Double, Double, Boolean)].collect().toSet
      val batch = graft.functions.SeriesFunctions.cusum(
          Seq(("a", 1L, 50.0), ("a", 2L, 52.0), ("a", 3L, 53.0),
            ("a", 4L, 53.0), ("b", 1L, 47.0), ("b", 2L, 46.0))
            .toDF("k", "t", "v"),
          Seq("k"), "t", "v", target = 50.0, slack = 1.0, threshold = 4.0)
        .as[(String, Long, Double, Double, Boolean)].collect().toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the cross-batch carry actually fired: series a alarms only in
      // the second micro-batch (S+ reaches 5 > 4 at t=4)
      assert(streamed.contains(("a", 4L, 5.0, 0.0, true)))
    } finally q.stop()
  }

  test("streamSplit: null predicate rows land on the REST side") {
    val df = LineProtocol.ingest(spark, Seq(
      "m,host=a v=1.0 10", "m,host=b v=2.0 20", "m,host=c v=3.0 30"))("m")
      .withColumn("flag",
        when($"time" === 10L, lit(true))
          .when($"time" === 20L, lit(false)))
    val (matched, rest) = Ingest.streamSplit(df, $"flag")
    assert(matched.select("time").as[Long].collect().toSet == Set(10L))
    // false AND null(time=30) both go to rest — reference split.rs semantics
    assert(rest.select("time").as[Long].collect().toSet == Set(20L, 30L))
  }

  test("persistCold writes rows <= split time, returns hot remainder") {
    val tmp = Files.createTempDirectory("graft-split").toString
    val df = LineProtocol.ingest(spark, Seq(
      "m,host=a v=1.0 10", "m,host=a v=2.0 20", "m,host=a v=3.0 30"))("m")
    val hot = Ingest.persistCold(df, splitTimeNs = 20L, s"$tmp/cold", Seq("host", "time"))
    assert(spark.read.parquet(s"$tmp/cold").select("time").as[Long].collect().toSet
      == Set(10L, 20L))
    assert(hot.select("time").as[Long].collect().toSet == Set(30L))
  }

  test("compact: later-written file wins a PK conflict (mtime arrival order)") {
    val tmp = Files.createTempDirectory("graft-compact-lww").toString
    val c1 = LineProtocol.ingest(spark, Seq("m,host=a v=1.0 10"))("m")
    c1.coalesce(1).write.mode("append").parquet(s"$tmp/raw")
    Thread.sleep(1500) // distinct file mtimes (ms granularity)
    val c2 = LineProtocol.ingest(spark, Seq("m,host=a v=9.0 10"))("m")
    c2.coalesce(1).write.mode("append").parquet(s"$tmp/raw")

    Ingest.compact(spark, s"$tmp/raw", s"$tmp/compacted", Seq("host", "time"))
    val out = spark.read.parquet(s"$tmp/compacted")
    assert(out.count() == 1)
    assert(out.select("v").as[Double].head() == 9.0)

    // explicit seq column path: seq order beats file order
    val explicitSeq = c1.withColumn("chunk_seq", lit(5L))
      .unionByName(c2.withColumn("chunk_seq", lit(2L)))
    explicitSeq.write.mode("overwrite").parquet(s"$tmp/raw2")
    Ingest.compact(spark, s"$tmp/raw2", s"$tmp/compacted2", Seq("host", "time"),
      seqCol = Some("chunk_seq"))
    assert(spark.read.parquet(s"$tmp/compacted2")
      .select("v").as[Double].head() == 1.0)
  }
}
