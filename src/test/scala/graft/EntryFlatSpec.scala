package graft

import graft.core.{PartitionTemplate, TemplatePart}
import graft.server.{EntryFlat, GrpcClient, HttpFacade, IoxGrpc, ManagementGrpc, StorageProto, WriteProto}
import graft.sources.LineProtocol

/** The flatbuffers `Entry` write format (entry/src/entry.fbs,
  * entry.rs:749-944): encode with the conformant flatbuffers runtime,
  * decode with the hand-rolled vtable reader, and prove the gRPC
  * WriteEntry path indistinguishable from the other write routes. */
class EntryFlatSpec extends SparkSpec {
  import WriteProto.{PbColumn, PbTableBatch, PbValues, Semantic}

  private def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
    val w = new StorageProto.Writer; f(w); w.result()
  }

  test("entry round-trip: every value type, dense nulls, row counts") {
    val cols = Vector(
      PbColumn("host", Semantic.Tag,
        // dense: row 1 of 3 is null -> two values + mask bit 1
        Some(PbValues(str = Vector("a", "b"))), Array[Byte](0x02)),
      PbColumn("usage", Semantic.Field,
        Some(PbValues(f64 = Vector(1.5, 2.5, 3.5))), Array.emptyByteArray),
      PbColumn("count", Semantic.Field,
        Some(PbValues(i64 = Vector(7L, 8L))), Array[Byte](0x04)),
      PbColumn("big", Semantic.Field,
        Some(PbValues(u64 = Vector(-1L))), Array[Byte](0x03)),
      PbColumn("up", Semantic.Field,
        Some(PbValues(bool = Vector(true, false, true))),
        Array.emptyByteArray),
      PbColumn("blob", Semantic.Field,
        Some(PbValues(bytes = Vector(Array[Byte](1, 2), Array[Byte](3)))),
        Array[Byte](0x01)),
      PbColumn("time", Semantic.Time,
        Some(PbValues(i64 = Vector(100L, 200L, 300L))),
        Array.emptyByteArray))
    val entry = EntryFlat.encode(Seq(
      EntryFlat.PartitionWrite("pk-1", Vector(PbTableBatch("cpu", cols, 3))),
      EntryFlat.PartitionWrite("pk-2",
        Vector(PbTableBatch("mem", Vector(
          PbColumn("v", Semantic.Field, Some(PbValues(i64 = Vector(9L))),
            Array.emptyByteArray),
          PbColumn("time", Semantic.Time,
            Some(PbValues(i64 = Vector(5L))), Array.emptyByteArray)), 1)))))
    val decoded = EntryFlat.decode(entry)
    assert(decoded.isRight, decoded)
    val e = decoded.toOption.get
    assert(e.deletes.isEmpty)
    assert(e.partitionWrites.map(_.key) == Vector("pk-1", "pk-2"))
    val cpu = e.partitionWrites.head.tables.head
    assert(cpu.name == "cpu" && cpu.rowCount == 3)
    val byName = cpu.columns.map(c => c.name -> c).toMap
    assert(byName("host").semanticType == Semantic.Tag)
    assert(byName("host").values.get.str == Vector("a", "b"))
    assert(byName("host").isNull(1) && !byName("host").isNull(0))
    assert(byName("usage").values.get.f64 == Vector(1.5, 2.5, 3.5))
    assert(byName("count").values.get.i64 == Vector(7L, 8L))
    assert(byName("big").values.get.u64 == Vector(-1L))
    assert(byName("up").values.get.bool == Vector(true, false, true))
    assert(byName("blob").values.get.bytes.map(_.toSeq) ==
      Vector(Seq[Byte](1, 2), Seq[Byte](3)))
    assert(byName("time").semanticType == Semantic.Time)
    val mem = e.partitionWrites(1).tables.head
    assert(mem.name == "mem" && mem.rowCount == 1)
  }

  test("delete entries round-trip; malformed buffers reject loudly") {
    val entry = EntryFlat.encodeDeletes(Seq(
      EntryFlat.DeleteOp("cpu", "host = 'a'"),
      EntryFlat.DeleteOp("mem", "")))
    val decoded = EntryFlat.decode(entry)
    assert(decoded == Right(EntryFlat.DecodedEntry(Vector.empty, Vector(
      EntryFlat.DeleteOp("cpu", "host = 'a'"),
      EntryFlat.DeleteOp("mem", "")))))
    assert(EntryFlat.decode(Array[Byte](1, 2, 3)).isLeft)
    assert(EntryFlat.decode(Array.fill[Byte](16)(0x7f)).isLeft)
    // a crafted huge declared length must reject BEFORE allocating
    // (an OutOfMemoryError would escape the Either contract): corrupt a
    // valid entry's first length-prefixed region to 0x7ffffff0
    val good = EntryFlat.encode(Seq(EntryFlat.PartitionWrite("k",
      Vector(WriteProto.PbTableBatch("t", Vector(
        PbColumn("v", Semantic.Field,
          Some(PbValues(bytes = Vector(Array.fill[Byte](64)(1)))),
          Array.emptyByteArray)), 1)))))
    val idx = good.indexOfSlice(Array[Byte](64, 0, 0, 0)) // the data vec len
    assert(idx > 0, "fixture must contain the 64-byte vector length")
    val evil = good.clone()
    evil(idx) = 0xf0.toByte; evil(idx + 1) = 0xff.toByte
    evil(idx + 2) = 0xff.toByte; evil(idx + 3) = 0x7f.toByte
    assert(EntryFlat.decode(evil).isLeft)
  }

  test("template column parts fall back to FIELD values like the " +
      "reference partitioner (database_rules.rs:211-217)") {
    val lines = LineProtocol.parseLines(Seq(
      "m,host=a level=3i 100", "m level=4i 200", "m other=1i 300").iterator)
      .toSeq
    val byLevel = PartitionTemplate(Seq(TemplatePart.ColumnValue("level")))
    val e = EntryFlat.decode(
      EntryFlat.linesToEntry(lines, byLevel, 0L)).toOption.get
    // tag-less lines key on the field value; a line with neither renders
    // blank (separators kept — single part, so empty string)
    assert(e.partitionWrites.map(_.key) == Vector("", "level_3", "level_4"))
  }

  test("linesToEntry groups by the rules template partition key " +
      "(entry.rs lines_to_sharded_entries shape)") {
    val lines = LineProtocol.parseLines(Seq(
      "cpu,host=a usage=1.5 1000000000",
      "cpu,host=b usage=2.5,idle=9i 260000000000000",
      "mem,host=a free=10i 1000000000",
      "cpu,host=a usage=3.5").iterator).toSeq
    val template = PartitionTemplate(Seq(
      TemplatePart.TimeFormat("%Y-%m-%d")))
    // default time: day 2 (so the unstamped line lands apart from day 1)
    val entry = EntryFlat.linesToEntry(lines, template,
      defaultTimeNs = 86400L * 1000000000L)
    val e = EntryFlat.decode(entry).toOption.get
    assert(e.partitionWrites.map(_.key) ==
      Vector("1970-01-01", "1970-01-02", "1970-01-04"))
    val day1 = e.partitionWrites.head
    assert(day1.tables.map(_.name) == Vector("cpu", "mem"))
    val cpu1 = day1.tables.head
    assert(cpu1.rowCount == 1)
    assert(cpu1.columns.map(_.name) == Vector("host", "usage", "time"))
    val day2 = e.partitionWrites(1).tables.head
    assert(day2.name == "cpu" &&
      day2.columns.find(_.name == "time").get.values.get.i64 ==
        Vector(86400L * 1000000000L))
    // the sparse idle field is dense with a null mask on the day-4 batch
    val day4 = e.partitionWrites(2).tables.head
    assert(day4.columns.map(_.name) == Vector("host", "idle", "usage", "time"))
    assert(day4.columns.find(_.name == "idle").get.values.get.i64 ==
      Vector(9L))
  }

  test("gRPC WriteEntry lands a queryable measurement, " +
      "indistinguishable from the LP write path") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    val grpc = IoxGrpc.start(facade)
    try {
      val p = grpc.boundPort
      val lines = LineProtocol.parseLines(Seq(
        "cpu,host=a usage=1.5 100",
        "cpu,host=a usage=2.5 200",
        "cpu,host=b usage=5.0 100").iterator).toSeq
      val entry = EntryFlat.linesToEntry(lines,
        graft.streaming.DatabaseRules.DefaultTemplate, defaultTimeNs = 0L)
      val (ws, _) = GrpcClient.call(p,
        ManagementGrpc.WritePrefix + "WriteEntry",
        msg { w => w.string(1, "edb"); w.bytes(2, entry) })
      assert(ws == 0, s"write_entry returned status $ws")
      val (qs, csv) = HttpFacade.getQuery(facade.boundPort, "edb",
        "SELECT host, count(*) AS n, sum(usage) AS su FROM cpu " +
          "GROUP BY host ORDER BY host")
      assert(qs == 200 && csv.trim.split("\n").toSeq ==
        Seq("host,n,su", "a,2,4.0", "b,1,5.0"))
    } finally { grpc.stop(); facade.stop() }
  }
}
