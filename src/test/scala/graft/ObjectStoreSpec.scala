package graft

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem
import graft.streaming.Lifecycle
import graft.streaming.Lifecycle._
import graft.sources.StatsCatalog

/** A second Hadoop FileSystem scheme for tests: `mem://` stores bytes on
  * the local disk underneath but registers as a DISTINCT scheme, so any
  * engine code that quietly assumes `file:` (java.io paths, hardcoded
  * schemes, default-FS lookups) breaks loudly when driven through it. */
class MemFs extends RawLocalFileSystem {
  override def getScheme: String = "mem"
  override def getUri: URI = URI.create("mem:///")
}

/** The object-store abstraction, exercised end-to-end over a NON-`file:`
  * scheme. The reference reads and writes chunks through its
  * `object_store` crate (S3 / GCS / Azure / file / memory all behind one
  * trait); the Spark-native equivalent is the Hadoop FileSystem API —
  * the cloud connectors themselves (s3a / gs / abfss) are jars plus
  * credentials, unavailable in this sandbox, but what the ENGINE must
  * guarantee is that every warehouse path goes `Path.getFileSystem`, so
  * pointing the same code at `s3a://bucket/...` is configuration, not a
  * port. Driving the lifecycle warehouse (persist, compaction, stats
  * sidecars, pruned dedup scans) through a registered `mem:` scheme pins
  * exactly that property. */
class ObjectStoreSpec extends SparkSpec {
  import spark.implicits._

  private def memDir(prefix: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mem.impl", classOf[MemFs].getName)
    "mem://" + java.nio.file.Files.createTempDirectory(prefix).toString
  }

  test("parquet write/read + stats sidecar round-trip over the mem: scheme") {
    val dir = memDir("graft-memfs")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$dir/t0")
    assert(spark.read.parquet(s"$dir/t0").count() == 2)
    // the sidecar IO path (write-side stats + save + load) is
    // scheme-agnostic too
    val df = Seq(("x", 100L, 1.5), ("y", 200L, 2.5)).toDF("host", "time", "v")
    val stats = StatsCatalog.computeDuringWrite(df, tagCols = Seq("host"))(
      observed => observed.write.mode("error").parquet(s"$dir/t1"),
      spark.read.parquet(s"$dir/t1"))
    StatsCatalog.save(spark, s"$dir/t1", stats)
    val st = StatsCatalog.load(spark, s"$dir/t1")
    assert(st.exists(s => s.timeMin == 100L && s.timeMax == 200L), st)
  }

  test("lifecycle timeline (write -> persist -> retention) runs over mem:") {
    val dir = memDir("graft-memfs-lc")
    val rules = Rules(
      lateArriveWindowMs = 10000L,
      persistRowThreshold = 1000L,
      persistAgeThresholdMs = 60000L)
    val table = new ChunkedTable(spark, s"$dir/m1", pkCols = Seq("host", "time"))
    table.writeChunk(
      Seq(("a", 1000L * 1000000L, 1.0), ("b", 2000L * 1000000L, 2.0))
        .toDF("host", "time", "v"), nowMs = 0L)
    table.runOnce(rules, nowMs = 70000L) // -> persisted cold chunk
    table.writeChunk(
      Seq(("c", 95000L * 1000000L, 3.0)).toDF("host", "time", "v"),
      nowMs = 95000L)
    assert(table.chunks().map(_.stage).sortBy(_.toString) ==
      Seq(Open, Persisted))
    assert(table.chunks().forall(_.path.startsWith("mem:")),
      "chunk paths stay on the registered scheme")
    assert(table.scan().count() == 3L)
    // retention drop still works through the scheme
    table.runOnce(rules.copy(retentionNs = Some(50000L * 1000000L)),
      nowMs = 100000L)
    assert(table.chunks().map(_.stage) == Seq(Open))
    assert(table.scan().as[(String, Long, Double)].collect().toSeq ==
      Seq(("c", 95000L * 1000000L, 3.0)))
  }

  /** The real-cloud arm, flag-gated: runs the same warehouse round-trip
    * against an actual `s3a://` bucket the moment (a) the hadoop-aws
    * connector jar is on the classpath and (b) GRAFT_S3_TEST_BUCKET (plus
    * optional GRAFT_S3_TEST_ENDPOINT for minio-style stores and the
    * standard AWS_* credentials) is set. In this sandbox both are absent
    * (zero egress, no connector jar — the standing SURVEY §2.1
    * disclosure), so the test CANCELS — visibly skipped, never silently
    * green — and the `mem:` tests above remain the default proof that
    * every warehouse path is scheme-agnostic. */
  test("s3a warehouse round-trip (flag-gated; cancels when env-blocked)") {
    val connectorOnClasspath =
      try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
      catch { case _: ClassNotFoundException => false }
    assume(connectorOnClasspath,
      "hadoop-aws (S3AFileSystem) not on classpath — env-blocked")
    val bucket = sys.env.get("GRAFT_S3_TEST_BUCKET")
    assume(bucket.nonEmpty, "GRAFT_S3_TEST_BUCKET not set")
    sys.env.get("GRAFT_S3_TEST_ENDPOINT").foreach { ep =>
      val hc = spark.sparkContext.hadoopConfiguration
      hc.set("fs.s3a.endpoint", ep)
      hc.set("fs.s3a.path.style.access", "true")
    }
    val dir = s"s3a://${bucket.get}/graft-objectstore-spec-${System.nanoTime()}"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$dir/t0")
    assert(spark.read.parquet(s"$dir/t0").count() == 2)
    val df = Seq(("x", 100L, 1.5), ("y", 200L, 2.5)).toDF("host", "time", "v")
    val stats = StatsCatalog.computeDuringWrite(df, tagCols = Seq("host"))(
      observed => observed.write.mode("error").parquet(s"$dir/t1"),
      spark.read.parquet(s"$dir/t1"))
    StatsCatalog.save(spark, s"$dir/t1", stats)
    val st = StatsCatalog.load(spark, s"$dir/t1")
    assert(st.exists(s => s.timeMin == 100L && s.timeMax == 200L), st)
  }
}
