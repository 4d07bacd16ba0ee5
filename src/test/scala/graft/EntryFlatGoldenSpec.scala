package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.server.EntryFlat
import graft.server.WriteProto.{PbColumn, PbValues}

/** Golden-bytes decode of the reference's flatbuffers `Entry` write
  * format (entry/src/entry.fbs): the byte vectors below were hand-built
  * to the flatbuffers wire spec with a DIFFERENT layout strategy than
  * this repo's encoder uses — fields written in increasing slot order,
  * no vtable deduplication, bottom-up depth-first object placement — so
  * they stand in for an arbitrary conformant producer (the reference's
  * own Rust builder among them). The repo's earlier coverage was
  * round-trip-only (encode → decode), which can't catch a decoder that
  * merely mirrors its own encoder's layout assumptions; these literals
  * pin any-producer generality the way StorageProtoSpec pins the
  * protobuf codecs with golden byte vectors. */
class EntryFlatGoldenSpec extends AnyFunSuite {

  // Entry { operation: write(WriteOperations { partition_writes: [
  //   PartitionWrite { key: "2020-01-01", table_batches: [
  //     cpu(host Tag["a","b"], region Tag["west"]+mask 0x02,
  //         usage Field f64[23.2,21.0], idle Field i64[1]+mask 0x02,
  //         flag Field bool[true]+mask 0x02, time Time i64[100,150]),
  //     mem(host Tag["a"], free Field u64[10], time Time i64[100]) ]}]})}
  private val writeEntryHex =
    "0c00000008000a0009000400080000000c000000000106000800040006000000" +
    "04000000010000000c00000008000c0008000400080000000800000010000000" +
    "02000000140100001c0000000a000000323032302d30312d3031000008000c00" +
    "0800040008000000080000001400000003000000a40000005c00000018000000" +
    "030000006d656d000c0010000c000b000a0004000c0000001c00000000000103" +
    "040000000400000074696d650000060008000400060000000400000001000000" +
    "64000000000000000c0010000c000b000a0004000c0000001c00000000000302" +
    "0400000004000000667265650000060008000400060000000400000001000000" +
    "0a00000000000000000000000c0010000c000b000a0004000c0000001c000000" +
    "000004010400000004000000686f737400000600080004000600000004000000" +
    "0100000004000000010000006100000008000c00080004000800000008000000" +
    "2000000006000000b40100005801000004010000b40000006800000018000000" +
    "03000000637075000c0010000c000b000a0004000c0000001c00000000000103" +
    "040000000400000074696d650000060008000400060000000400000002000000" +
    "6400000000000000960000000000000000000e00140010000f000e0008000400" +
    "0e0000001000000024000000000005020c000000010000000200000004000000" +
    "666c6167000006000800040006000000040000000100000001000e0014001000" +
    "0f000e00080004000e0000001000000024000000000001020c00000001000000" +
    "020000000400000069646c650000060008000400060000000400000001000000" +
    "01000000000000000c0010000c000b000a0004000c0000001c00000000000202" +
    "0400000005000000757361676500060008000400060000000400000002000000" +
    "333333333333374000000000000035400000000000000e00140010000f000e00" +
    "080004000e0000001000000028000000000004010c0000000100000002000000" +
    "06000000726567696f6e00000000060008000400060000000400000001000000" +
    "040000000400000077657374000000000c0010000c000b000a0004000c000000" +
    "1c000000000004010400000004000000686f7374000006000800040006000000" +
    "0400000002000000100000000400000001000000620000000100000061000000"

  // Entry { operation: delete(DeleteOperations { deletes: [
  //   Delete { table_name: "cpu", predicate: "host=\"a\"" } ]})}
  private val deleteEntryHex =
    "0c00000008000a0009000400080000000c000000000206000800040006000000" +
    "04000000010000000c00000008000c0008000400080000000800000014000000" +
    "08000000686f73743d226122000000000300000063707500"

  private def bytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def col(c: PbColumn): (String, Int, Option[PbValues], Seq[Int]) =
    (c.name, c.semanticType, c.values, c.nullMask.toSeq.map(_ & 0xff))

  test("golden write entry from an independent conformant producer decodes") {
    val decoded = EntryFlat.decode(bytes(writeEntryHex))
    assert(decoded.isRight, decoded)
    val e = decoded.toOption.get
    assert(e.deletes.isEmpty)
    assert(e.partitionWrites.map(_.key) == Vector("2020-01-01"))
    val tables = e.partitionWrites.head.tables
    assert(tables.map(t => (t.name, t.rowCount)) ==
      Vector(("cpu", 2), ("mem", 1)))
    val cpu = tables(0)
    assert(cpu.columns.map(col) == Vector(
      ("host", 2, Some(PbValues(str = Vector("a", "b"))), Nil),
      ("region", 2, Some(PbValues(str = Vector("west"))), Seq(0x02)),
      ("usage", 3, Some(PbValues(f64 = Vector(23.2, 21.0))), Nil),
      ("idle", 3, Some(PbValues(i64 = Vector(1L))), Seq(0x02)),
      ("flag", 3, Some(PbValues(bool = Vector(true))), Seq(0x02)),
      ("time", 4, Some(PbValues(i64 = Vector(100L, 150L))), Nil)))
    val mem = tables(1)
    assert(mem.columns.map(col) == Vector(
      ("host", 2, Some(PbValues(str = Vector("a"))), Nil),
      ("free", 3, Some(PbValues(u64 = Vector(10L))), Nil),
      ("time", 4, Some(PbValues(i64 = Vector(100L))), Nil)))
    // the null-mask row mapping entry.fbs documents: masked rows carry
    // no dense value (values.len + popcount(mask) = row count)
    assert(cpu.columns(1).isNull(1) && !cpu.columns(1).isNull(0))
  }

  test("golden delete entry decodes to the table-scoped predicate") {
    val decoded = EntryFlat.decode(bytes(deleteEntryHex))
    assert(decoded.isRight, decoded)
    val e = decoded.toOption.get
    assert(e.partitionWrites.isEmpty)
    assert(e.deletes.map(d => (d.tableName, d.predicate)) ==
      Vector(("cpu", "host=\"a\"")))
  }

  test("golden bytes re-encode and re-decode losslessly through the " +
      "repo's own codec (cross-producer round trip)") {
    val e = EntryFlat.decode(bytes(writeEntryHex)).toOption.get
    val again = EntryFlat.decode(EntryFlat.encode(e.partitionWrites))
    assert(again.isRight, again)
    val e2 = again.toOption.get
    assert(e2.partitionWrites.map(_.key) == e.partitionWrites.map(_.key))
    val (t1, t2) = (e.partitionWrites.head.tables,
      e2.partitionWrites.head.tables)
    assert(t1.map(_.name) == t2.map(_.name))
    assert(t1.flatMap(_.columns).map(col) == t2.flatMap(_.columns).map(col))
  }
}
