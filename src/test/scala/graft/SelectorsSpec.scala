package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Selectors

class SelectorsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", DoubleType),
    StructField("t", LongType)))

  private def mk(rows: (String, java.lang.Double, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  test("first/last by time; min/max by value with earliest-time tie-break") {
    val df = mk(("a", 5.0, 10L), ("a", 3.0, 20L), ("a", 8.0, 30L))
    val out = df.groupBy("g").agg(
      Selectors.firstValue(col("v"), col("t")).as("first_v"),
      Selectors.lastValue(col("v"), col("t")).as("last_v"),
      Selectors.minValue(col("v"), col("t")).as("min_v"),
      Selectors.minTime(col("v"), col("t")).as("min_t"),
      Selectors.maxValue(col("v"), col("t")).as("max_v"),
      Selectors.maxTime(col("v"), col("t")).as("max_t")).head()
    assert(out.getAs[Double]("first_v") == 5.0)
    assert(out.getAs[Double]("last_v") == 8.0)
    assert(out.getAs[Double]("min_v") == 3.0 && out.getAs[Long]("min_t") == 20L)
    assert(out.getAs[Double]("max_v") == 8.0 && out.getAs[Long]("max_t") == 30L)
  }

  test("value ties break to the EARLIEST timestamp (selectors.rs:108-116)") {
    val df = mk(("a", 7.0, 30L), ("a", 7.0, 10L), ("a", 7.0, 20L), ("a", 1.0, 40L))
    val out = df.groupBy("g").agg(
      Selectors.maxTime(col("v"), col("t")).as("max_t"),
      Selectors.minTime(col("v"), col("t")).as("min_t")).head()
    assert(out.getAs[Long]("max_t") == 10L) // max value 7.0 first seen at t=10
    assert(out.getAs[Long]("min_t") == 40L)
  }

  test("selectors work on string and boolean fields (typed accumulators)") {
    // reference: 16 typed accumulators incl. utf8/bool (selectors.rs);
    // struct-ordering min/max covers every orderable Spark type uniformly
    val s = StructType(Seq(StructField("g", StringType),
      StructField("v", StringType), StructField("b", BooleanType),
      StructField("t", LongType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", "zebra", false, 10L), Row("a", "apple", true, 20L),
      Row("a", "mango", false, 30L)), 2), s)
    val out = df.groupBy("g").agg(
      Selectors.firstValue(col("v"), col("t")).as("first_s"),
      Selectors.lastValue(col("v"), col("t")).as("last_s"),
      Selectors.minValue(col("v"), col("t")).as("min_s"),
      Selectors.maxValue(col("v"), col("t")).as("max_s"),
      Selectors.lastValue(col("b"), col("t")).as("last_b")).head()
    assert(out.getAs[String]("first_s") == "zebra")
    assert(out.getAs[String]("last_s") == "mango")
    assert(out.getAs[String]("min_s") == "apple")
    assert(out.getAs[String]("max_s") == "zebra")
    assert(out.getAs[Boolean]("last_b") == false)
  }

  test("null values are skipped (reference accumulators only update on non-null)") {
    val df = mk(("a", null, 50L), ("a", 2.0, 10L), ("a", null, 5L))
    val out = df.groupBy("g").agg(
      Selectors.lastValue(col("v"), col("t")).as("last_v"),
      Selectors.lastTime(col("v"), col("t")).as("last_t"),
      Selectors.firstValue(col("v"), col("t")).as("first_v"),
      Selectors.firstTime(col("v"), col("t")).as("first_t")).head()
    assert(out.getAs[Double]("first_v") == 2.0 && out.getAs[Long]("first_t") == 10L)
    assert(out.getAs[Double]("last_v") == 2.0 && out.getAs[Long]("last_t") == 10L)
    // all-null group yields null selector result
    val allNull = mk(("a", null, 1L), ("a", null, 2L))
      .groupBy("g").agg(Selectors.firstValue(col("v"), col("t")).as("f")).head()
    assert(allNull.isNullAt(1))
  }
}
