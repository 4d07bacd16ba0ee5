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
