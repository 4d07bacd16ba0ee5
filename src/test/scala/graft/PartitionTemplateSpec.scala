package graft

import org.apache.spark.sql.functions._
import graft.core.{PartitionTemplate, TemplatePart}
import graft.sources.LineProtocol

class PartitionTemplateSpec extends SparkSpec {
  import spark.implicits._
  import TemplatePart._

  private lazy val cpu = LineProtocol.ingest(spark, Seq(
    "cpu,host=a user=22.5 1615766721000000000", // 2021-03-15 00:05:21 UTC
    "cpu user=1.0 1617766721000000000"))("cpu") // no host tag -> null

  test("table + column + time parts join with '-'; blanks preserved") {
    val tpl = PartitionTemplate(Seq(Table, ColumnValue("host"), TimeFormat("%Y-%m-%d")))
    val keys = cpu.withColumn("part_key",
        tpl.keyColumn("cpu", cpu.schema))
      .orderBy("time").select("part_key").as[String].collect().toSeq
    assert(keys == Seq("cpu-host_a-2021-03-15", "cpu--2021-04-07"))
  }

  test("missing column renders blank, matching the reference") {
    val tpl = PartitionTemplate(Seq(ColumnValue("nope"), Table))
    val keys = cpu.withColumn("k", tpl.keyColumn("cpu", cpu.schema))
      .select("k").distinct().as[String].collect().toSeq
    assert(keys == Seq("-cpu"))
  }

  test("null time renders a blank part with separators kept") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("host", StringType), StructField("time", LongType)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("a", null))), schema)
    val tpl = PartitionTemplate(Seq(Table, TimeFormat("%Y-%m"), ColumnValue("host")))
    val keys = d.withColumn("k", tpl.keyColumn("cpu", d.schema))
      .select("k").as[String].collect().toSeq
    // blank time part, BOTH separators kept — same contract as blank columns
    assert(keys == Seq("cpu--host_a"))
  }

  test("strftime translation covers documented tokens") {
    assert(PartitionTemplate.strftimeToJava("%Y-%m-%d %H:%M:%S") ==
      "yyyy-MM-dd HH:mm:ss")
    assert(PartitionTemplate.strftimeToJava("%Y/day%j") == "yyyy/'d''a''y'DDD")
  }

  test("scanChunks prunes chunk dirs by RpcPredicate partition key pre-listing") {
    import graft.core.RpcPredicate
    import graft.operators.Upsert
    val tmp = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val tpl = PartitionTemplate(Seq(TimeFormat("%Y-%m")))
    cpu.withColumn("part_key", tpl.keyColumn("cpu", cpu.schema))
      .write.partitionBy("part_key").parquet(s"$tmp/cpu")
    val chunkDirs = Seq(s"$tmp/cpu/part_key=2021-03", s"$tmp/cpu/part_key=2021-04")

    // no key: both chunks scanned
    val all = Upsert.scanChunks(spark, chunkDirs, Seq("host", "time"))
    assert(all.count() == 2 && all.inputFiles.length == 2)

    // key match: the other chunk dir never reaches the scan's file list
    val pruned = Upsert.scanChunks(spark, chunkDirs, Seq("host", "time"),
      RpcPredicate().withPartitionKey("2021-03"))
    assert(pruned.inputFiles.forall(_.contains("part_key=2021-03")))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.count() == 1)

    // key matching nothing: zero files read, schema preserved
    val none = Upsert.scanChunks(spark, chunkDirs, Seq("host", "time"),
      RpcPredicate().withPartitionKey("1999-01"))
    assert(none.count() == 0)
    assert(none.columns.contains("user"))

    // partition-key segment parsing
    assert(Upsert.chunkPartitionKeys("/t/part_key=2021-03") == Seq("2021-03"))
    assert(Upsert.chunkPartitionKeys("/t/chunk-0") == Nil)
  }

  test("partitioned write prunes by the computed key") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ptpl").toString
    val tpl = PartitionTemplate(Seq(TimeFormat("%Y-%m")))
    cpu.withColumn("part_key", tpl.keyColumn("cpu", cpu.schema))
      .write.partitionBy("part_key").parquet(s"$tmp/cpu")
    val read = spark.read.parquet(s"$tmp/cpu").filter(col("part_key") === "2021-03")
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part_key"), plan)
  }
}
