package graft

import org.apache.spark.sql.types._

import graft.core.IoxSchema
import graft.sources.LineProtocol

/** The reference's table-schema test module ported case-for-case
  * (query_tests/src/table_schema.rs, 12 tests): per-measurement schema
  * listing — categories, types (incl. u64), selections — over the
  * TwoMeasurements scenarios, and the `set_sort_key` semantics (any
  * order, any subset, full replacement, invalid column errors).
  * Column-order note: the reference lists columns lexicographically per
  * stage; the engine's canonical layout is tags, fields, time (scan
  * plans re-project as requested), so listing assertions compare the
  * (name, type, category) SET plus the selection's order. */
class TableSchemaSpec extends SparkSpec {

  // TwoMeasurementsMubScenario data (scenarios.rs)
  private lazy val two = LineProtocol.ingest(spark, Seq(
    "cpu,region=west user=23.2 100",
    "cpu,region=west user=21.0 150",
    "disk,region=east bytes=99i 200"))

  private def listing(schema: StructType): Set[(String, DataType, String)] =
    schema.fields.map(f =>
      (f.name, f.dataType, IoxSchema.categoryOf(f).getOrElse(""))).toSet

  test("list_schema_cpu_all_mub") {
    assert(listing(two("cpu").schema) == Set(
      ("region", StringType, "tag"),
      ("user", DoubleType, "field"),
      ("time", LongType, "time")))
  }

  test("list_schema_cpu_all_rub") {
    // the RUB flavor adds the (region, time) sort key the compacted
    // chunk was written with
    val rub = IoxSchema.setSortKey(two("cpu").schema, Seq("region", "time"))
    assert(listing(rub) == listing(two("cpu").schema))
    assert(IoxSchema.sortKeyOf(rub) == Seq("region", "time"))
  }

  test("list_schema_cpu_all_rub_set_sort_key") {
    val rub = IoxSchema.setSortKey(two("cpu").schema, Seq("region", "time"))
    // re-setting the same key is idempotent
    assert(IoxSchema.sortKeyOf(IoxSchema.setSortKey(rub, Seq("region", "time")))
      == Seq("region", "time"))
  }

  test("list_schema_disk_all") {
    assert(listing(two("disk").schema) == Set(
      ("region", StringType, "tag"),
      ("bytes", LongType, "field"),
      ("time", LongType, "time")))
  }

  test("list_schema_cpu_selection") {
    // a non-lexicographic selection projects in the REQUESTED order
    val sel = two("cpu").select("user", "region")
    assert(sel.columns.toSeq == Seq("user", "region"))
    assert(listing(sel.schema) == Set(
      ("user", DoubleType, "field"), ("region", StringType, "tag")))
  }

  test("list_schema_disk_selection") {
    val sel = two("disk").select("time", "bytes")
    assert(sel.columns.toSeq == Seq("time", "bytes"))
  }

  test("list_schema_location_all") {
    // TwoMeasurementsUnsignedTypeMubScenario: a u64 field (count) rides
    // as Decimal(20,0), the engine's documented u64 container
    val restaurant = LineProtocol.ingest(spark, Seq(
      "restaurant,town=andover count=40000u 100"))("restaurant")
    assert(listing(restaurant.schema) == Set(
      ("town", StringType, "tag"),
      ("count", DecimalType(20, 0), "field"),
      ("time", LongType, "time")))
  }

  // ---- set_sort_key semantics (table_schema.rs:203-360)

  private val base = StructType(Seq(
    IoxSchema.tagged("tag1", StringType, IoxSchema.Tag),
    IoxSchema.tagged("time", LongType, IoxSchema.Time),
    IoxSchema.tagged("tag2", StringType, IoxSchema.Tag),
    IoxSchema.tagged("field_int", LongType, IoxSchema.Field),
    IoxSchema.tagged("field_float", DoubleType, IoxSchema.Field)))

  test("test_set_sort_key_valid_same_order") {
    val s = IoxSchema.setSortKey(base, Seq("tag1", "time", "tag2"))
    assert(IoxSchema.sortKeyOf(s) == Seq("tag1", "time", "tag2"))
    // the data columns themselves are untouched
    assert(listing(s) == listing(base))
  }

  test("test_set_sort_key_valid_different_order") {
    val s = IoxSchema.setSortKey(base, Seq("time", "tag2", "tag1"))
    assert(IoxSchema.sortKeyOf(s) == Seq("time", "tag2", "tag1"))
  }

  test("test_set_sort_key_valid_subset") {
    val s = IoxSchema.setSortKey(base, Seq("time", "tag1"))
    assert(IoxSchema.sortKeyOf(s) == Seq("time", "tag1"))
  }

  test("test_set_sort_key_valid_subset_of_fully_set") {
    // a later set REPLACES the earlier key entirely
    val s0 = IoxSchema.setSortKey(base, Seq("tag1", "time", "tag2"))
    val s1 = IoxSchema.setSortKey(s0, Seq("tag2", "time"))
    assert(IoxSchema.sortKeyOf(s1) == Seq("tag2", "time"))
  }

  test("test_set_sort_key_invalid_not_exist") {
    assertThrows[IllegalArgumentException](
      IoxSchema.setSortKey(base, Seq("time", "nope")))
  }
}
