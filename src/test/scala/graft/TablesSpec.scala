package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.sources.Tables

/** The events loader must accept every ts encoding the testdata generator
  * has shipped: INT64 TIMESTAMP(NANOS) (reads as a raw ns long under the
  * nanosAsLong conf) and INT64 TIMESTAMP_MICROS (reads as timestamp or
  * timestamp_ntz). All encodings of the same instant must normalize to
  * identical (`ts_ns`, `ts`) output — the r6 testdata regeneration from
  * nanos to micros broke 47 gate queries because only one branch existed.
  */
class TablesSpec extends SparkSpec {
  // 2024-01-02T00:00:00.123456789Z as ns — the 789 ns tail must truncate
  private val ns = 1704153600123456789L
  private val usTrunc = 1704153600123456000L

  private def frame(tsField: StructField, v: Any) = {
    val schema = StructType(Seq(tsField, StructField("value", DoubleType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(v, 1.5)), schema)
  }

  test("normalize: raw ns long (TIMESTAMP NANOS encoding)") {
    val out = Tables.eventsNormalize(frame(StructField("ts", LongType), ns))
    val r = out.select("ts_ns", "ts", "value").head()
    assert(r.getLong(0) == usTrunc)
    assert(r.getTimestamp(1).toInstant.toEpochMilli == usTrunc / 1000000L)
    assert(r.getTimestamp(1).getNanos == 123456000)
  }

  test("normalize: TimestampType (TIMESTAMP_MICROS, adjusted-to-UTC)") {
    val t = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      usTrunc / 1000000000L, usTrunc % 1000000000L))
    val out = Tables.eventsNormalize(frame(StructField("ts", TimestampType), t))
    assert(out.select("ts_ns").head().getLong(0) == usTrunc)
  }

  test("normalize: TimestampNTZType (TIMESTAMP_MICROS, not adjusted)") {
    val ldt = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(usTrunc / 1000000000L, usTrunc % 1000000000L),
      java.time.ZoneOffset.UTC)
    val out = Tables.eventsNormalize(frame(StructField("ts", TimestampNTZType), ldt))
    assert(out.select("ts_ns").head().getLong(0) == usTrunc)
  }

  test("normalize: both parquet round-trips agree") {
    val base = sys.props("java.io.tmpdir") + "/graft-tables-spec"
    // micros file: write a timestamp column
    val tsVal = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(usTrunc / 1000000000L, usTrunc % 1000000000L))
    frame(StructField("ts", TimestampType), tsVal)
      .write.mode("overwrite").parquet(s"$base/micros/events.parquet")
    // "nanos" stand-in: a raw long column (what nanosAsLong yields at read)
    frame(StructField("ts", LongType), ns)
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")
    val a = Tables.events(spark, s"$base/micros").select("ts_ns", "ts", "value").head()
    val b = Tables.events(spark, s"$base/nanos").select("ts_ns", "ts", "value").head()
    assert(a == b)
    assert(a.getLong(0) == usTrunc)
  }

  test("driver testdata loads and resolves (plan-time regression guard)") {
    val ev = Tables.events(spark, sf("sf0.001"))
    // force full analysis + execution of the normalized columns
    val r = ev.select(min("ts_ns"), max("ts_ns"), count(lit(1))).head()
    assert(r.getLong(2) > 0)
    assert(r.getLong(0) % 1000L == 0L, "ts_ns must be µs-grain")
  }
}
