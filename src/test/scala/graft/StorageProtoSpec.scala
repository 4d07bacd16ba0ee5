package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InfluxRpc
import graft.server.StorageProto
import graft.server.StorageProto._

/** Golden byte-level vectors for the storage protobuf encoding
  * (storage_common.proto:72-155; conversion order data.rs:58-213). Every
  * expected byte string below is HAND-COMPUTED from the proto3 wire spec
  * (field key = (num << 3) | wire_type; varints LSB-first base-128;
  * packed numerics; little-endian fixed64) — not produced by the encoder
  * under test — so these tests pin the wire layout itself. */
class StorageProtoSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("varint: multi-byte and 10-byte negative encodings") {
    // field 1, wire 0 -> key 0x08; 300 = 0b10_0101100 -> ac 02
    assert(hex(new Writer().varintField(1, 300L).result()) == "08ac02")
    // -1 as int64: ten bytes, nine 0xff then 0x01
    assert(hex(new Writer().varintField(1, -1L).result()) == "08" + "ff" * 9 + "01")
    // proto3 default omission: zero writes nothing
    assert(new Writer().varintField(1, 0L).result().isEmpty)
  }

  test("Tag message: key=1, value=2, both length-delimited") {
    assert(hex(tag("host".getBytes, "a".getBytes)) == "0a04686f73741201" + "61")
  }

  test("SeriesFrame: _field/_measurement lead, data_type FLOAT omitted (convert_tags)") {
    val sf = seriesFrame("cpu", "usage", Seq("host" -> "a"), StorageProto.Float)
    val expected =
      "0a0f" + "0a065f6669656c64" + "120575736167650a13" + // Tag(_field,usage)
        "0a0c5f6d6561737572656d656e74" + "1203637075" +     // Tag(_measurement,cpu)
        "0a09" + "0a04686f7374" + "120161"                  // Tag(host,a)
    assert(hex(sf) == expected)
    // a non-float type writes field 2 as a varint
    val sfInt = seriesFrame("cpu", "usage", Nil, StorageProto.Integer)
    assert(hex(sfInt).endsWith("1001"))
  }

  test("FloatPointsFrame: packed sfixed64 timestamps + packed doubles") {
    val fp = floatPoints(Seq(1L, 2L), Seq(1.5, 2.5))
    assert(hex(fp) ==
      "0a10" + "0100000000000000" + "0200000000000000" +
        "1210" + "000000000000f83f" + "0000000000000440")
  }

  test("Integer/Boolean/String points frames") {
    assert(hex(integerPoints(Seq(1L), Seq(-1L))) ==
      "0a08" + "0100000000000000" + "120a" + "ff" * 9 + "01")
    assert(hex(booleanPoints(Seq(5L), Seq(true))) ==
      "0a08" + "0500000000000000" + "120101")
    assert(hex(stringPoints(Seq(7L), Seq("hi"))) ==
      "0a08" + "0700000000000000" + "12026869")
  }

  test("packed payload over 127 bytes gets a two-byte length varint") {
    // 20 timestamps * 8 bytes = 160 = varint a0 01; no values -> field 2 absent
    val fp = floatPoints((1L to 20L), Nil)
    assert(hex(fp).startsWith("0aa001" + "0100000000000000"))
    assert(fp.length == 3 + 160)
  }

  test("GroupFrame: plain tag_keys=1 + partition_key_vals=2 (data.rs:104-121)") {
    val gf = groupFrame(Seq("host", "region"), Seq("west"))
    assert(hex(gf) == "0a04686f7374" + "0a06726567696f6e" + "120477657374")
    // oneof member 7, payload 20 bytes -> key 0x3a
    assert(hex(frame(FrameGroup, gf)) == "3a14" + hex(gf))
  }

  test("Frame oneof numbers and ReadResponse stream layout") {
    val sf = frame(FrameSeries,
      seriesFrame("cpu", "usage", Seq("host" -> "a"), StorageProto.Float))
    val pf = frame(FrameFloatPoints, floatPoints(Seq(1L, 2L), Seq(1.5, 2.5)))
    assert(hex(sf).startsWith("0a31")) // oneof member 1, 49-byte SeriesFrame
    assert(hex(pf).startsWith("1224")) // oneof member 2, 36-byte points
    // ReadResponse: repeated frames under field 1, in stream order
    assert(hex(readResponse(Seq(sf, pf))) == "0a33" + hex(sf) + "0a26" + hex(pf))
  }

  test("StringValuesResponse + 0x00/0xff measurement/field specials (data.rs:45-56)") {
    val resp = stringValuesResponse(tagKeysByteVecs(Seq("host")))
    assert(hex(resp) == "0a0100" + "0a04686f7374" + "0a01ff")
  }

  test("CapabilitiesResponse: sorted map entries, reference support matrix") {
    val caps = capabilitiesResponse()
    // entry "Group" -> [First, Last, Min, Max]
    val groupCap = "0a054669727374" + "0a044c617374" + "0a034d696e" + "0a034d6178"
    val groupEntry = "0a0547726f7570" + "1217" + groupCap
    // entry "WindowAggregate" -> [Count, Sum, Min, Max, Mean]
    val waCap = "0a05436f756e74" + "0a0353756d" + "0a034d696e" + "0a034d6178" + "0a044d65616e"
    val waEntry = "0a0f57696e646f77416767726567617465" + "121c" + waCap
    assert(hex(caps) == "0a20" + groupEntry + "0a2f" + waEntry)
  }

  test("encodeFrame splits the engine's synthetic tags back into reference order") {
    val series = InfluxRpc.Frame("series",
      Map("_measurement" -> "cpu", "host" -> "a", "_field" -> "usage"), Nil, Nil)
    assert(hex(encodeFrame(series)) == hex(frame(FrameSeries,
      seriesFrame("cpu", "usage", Seq("host" -> "a"), StorageProto.Float))))

    val points = InfluxRpc.Frame("points", Map.empty, Seq(1L, 2L), Seq(1.5, 2.5))
    assert(hex(encodeFrame(points)) ==
      hex(frame(FrameFloatPoints, floatPoints(Seq(1L, 2L), Seq(1.5, 2.5)))))

    val group = InfluxRpc.Frame("group", Map.empty, Nil, Nil,
      tagKeys = Seq("host", "region"), partitionKeyVals = Seq("west"))
    assert(hex(encodeFrame(group)) ==
      hex(frame(FrameGroup, groupFrame(Seq("host", "region"), Seq("west")))))

    // a read_group response: group frame leads its member series/points
    val rr = encodeReadResponse(Seq(group, series, points))
    assert(hex(rr).startsWith("0a" + "%02x".format(encodeFrame(group).length) +
      hex(encodeFrame(group))))
  }

  test("Int64ValuesResponse: packed int64 values (storage_common_idpe.proto:23)") {
    // values=[2]: field 1 packed -> 0a 01 02
    assert(hex(int64ValuesResponse(Seq(2L))) == "0a0102")
    // values=[300, 1]: 300 = 0xac 0x02
    assert(hex(int64ValuesResponse(Seq(300L, 1L))) == "0a03ac0201")
    assert(int64ValuesResponse(Nil).isEmpty)
  }

  test("MeasurementFieldsResponse: MessageField key/type/sfixed64 ts (storage_common.proto:222-240)") {
    // ("f", FLOAT=0, ts=1): key "f" -> 0a 01 66; type 0 omitted;
    // timestamp sfixed64 field 3 wiretype 1 -> 19 + 8 LE bytes
    assert(hex(measurementFieldsResponse(Seq(("f", FieldFloat, 1L)))) ==
      "0a0c" + "0a0166" + "19" + "0100000000000000")
    // ("load", INTEGER=1, ts=150): type now written as 10 01
    assert(hex(measurementFieldsResponse(Seq(("load", FieldInteger, 150L)))) ==
      "0a11" + "0a046c6f6164" + "1001" + "19" + "9600000000000000")
    // field type mapping from engine column types
    assert(fieldTypeOf("double") == FieldFloat)
    assert(fieldTypeOf("bigint") == FieldInteger)
    assert(fieldTypeOf("decimal(20,0)") == FieldUnsigned)
    assert(fieldTypeOf("string") == FieldString)
    assert(fieldTypeOf("boolean") == FieldBoolean)
    assert(fieldTypeOf("array<double>") == FieldUndefined)
  }
}
