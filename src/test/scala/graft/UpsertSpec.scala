package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.Upsert

class UpsertSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("tag", StringType), StructField("time", LongType),
    StructField("f1", DoubleType), StructField("f2", DoubleType),
    StructField("seq", LongType)))

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  test("last non-null per field wins (reference deduplicate.rs:72-105 example)") {
    // Same PK (tag=a, time=1); arrival order by seq. f1: 1.0 then null ->
    // keeps 1.0; f2: null then 2.0 -> keeps 2.0; later non-null overrides.
    val d = df(Seq(
      Row("a", 1L, 1.0, null, 1L),
      Row("a", 1L, null, 2.0, 2L),
      Row("a", 1L, 3.0, null, 3L),
      Row("b", 1L, 9.0, 9.0, 1L)))
    val out = Upsert.dedup(d, Seq("tag", "time"), "seq")
      .orderBy("tag").collect()
    assert(out.length == 2)
    assert(out(0) == Row("a", 1L, 3.0, 2.0))
    assert(out(1) == Row("b", 1L, 9.0, 9.0))
  }

  test("all-null field stays null; distinct PKs untouched") {
    val d = df(Seq(
      Row("a", 1L, null, null, 1L),
      Row("a", 1L, null, 5.0, 2L),
      Row("a", 2L, 7.0, null, 3L)))
    val out = Upsert.dedup(d, Seq("tag", "time"), "seq")
      .orderBy("tag", "time").collect()
    assert(out(0) == Row("a", 1L, null, 5.0))
    assert(out(1) == Row("a", 2L, 7.0, null))
  }

  test("dedup with no field columns degrades to distinct PKs") {
    val pkOnly = StructType(Seq(
      StructField("tag", StringType), StructField("time", LongType),
      StructField("seq", LongType)))
    val d = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("a", 1L, 1L), Row("a", 1L, 2L), Row("b", 2L, 1L)), 2), pkOnly)
    val out = Upsert.dedup(d, Seq("tag", "time"), "seq")
      .orderBy("tag", "time").collect()
    assert(out.toSeq == Seq(Row("a", 1L), Row("b", 2L)))
  }

  test("scanWithDedup: clean chunks scan straight through, overlapping dedup") {
    import org.apache.spark.sql.functions.col
    val c1 = df(Seq(Row("a", 1L, 1.0, null, 0L), Row("a", 5L, 2.0, null, 0L))).drop("seq")
    val c2 = df(Seq(Row("a", 5L, 9.0, 9.0, 0L), Row("a", 8L, 3.0, null, 0L))).drop("seq")
    val c3 = df(Seq(Row("b", 100L, 7.0, null, 0L))).drop("seq") // disjoint: no dedup
    val out = Upsert.scanWithDedup(Seq(
        (c1, (1L, 5L), true), (c2, (5L, 8L), true), (c3, (100L, 100L), true)),
      pkCols = Seq("tag", "time"))
      .orderBy("tag", "time").collect()
    // (a,5) deduped: later chunk (c2) wins -> f1=9.0, f2=9.0
    assert(out.toSeq == Seq(
      Row("a", 1L, 1.0, null), Row("a", 5L, 9.0, 9.0),
      Row("a", 8L, 3.0, null), Row("b", 100L, 7.0, null)))
    // the disjoint chunk's subtree must contain no aggregate (no shuffle)
    val clean = Upsert.scanWithDedup(Seq((c3, (100L, 100L), true)), Seq("tag", "time"))
    assert(!clean.queryExecution.optimizedPlan.toString.toLowerCase.contains("aggregate"))
  }

  test("scanWithDedup: chunk order dominates any within-chunk arrival value") {
    import org.apache.spark.sql.functions.{col, lit}
    // Earlier chunk carries monotonically_increasing_id-scale arrivals
    // (partitionIdx << 33 | row), far beyond 32 bits. A packed
    // (chunkIdx << 32) + arrival long would let chunk 0 outrank chunk 1;
    // the struct(chunk, arrival) ordering must not.
    val huge = (5L << 33) | 7L
    val c1 = df(Seq(Row("a", 1L, 1.0, 1.0, 0L))).drop("seq")
      .withColumn(Upsert.ArrivalCol, lit(huge))
    val c2 = df(Seq(Row("a", 1L, 2.0, null, 0L))).drop("seq")
      .withColumn(Upsert.ArrivalCol, lit(0L))
    val out = Upsert.scanWithDedup(Seq(
        (c1, (1L, 1L), false), (c2, (1L, 1L), false)),
      pkCols = Seq("tag", "time")).collect()
    // chunk 2 is later: f1 -> 2.0; f2 null in chunk 2 -> keeps 1.0
    assert(out.toSeq == Seq(Row("a", 1L, 2.0, 1.0)))
  }

  test("overlap grouping (reference overlap.rs:49-239 semantics)") {
    // [1,5] [4,8] overlap; [10,12] alone; [13,20] [14,15] overlap
    val groups = Upsert.overlapGroups(Seq((1L, 5L), (4L, 8L), (10L, 12L), (13L, 20L), (14L, 15L)))
    assert(groups.map(_.toSet) == Seq(Set(0, 1), Set(2), Set(3, 4)))
    // touching endpoints count as overlap (inclusive stats ranges)
    assert(Upsert.overlapGroups(Seq((1L, 5L), (5L, 9L))).size == 1)
    assert(Upsert.overlapGroups(Nil).isEmpty)
  }
}
