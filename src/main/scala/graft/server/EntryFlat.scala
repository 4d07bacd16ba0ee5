package graft.server

import java.nio.{ByteBuffer, ByteOrder}

import com.google.flatbuffers.FlatBufferBuilder

import graft.core.PartitionTemplate
import graft.sources.LineProtocol

/** The flatbuffers `Entry` durable write format (entry/src/entry.fbs;
  * builders entry.rs:749-944, accessors entry.rs:249-520) — the byte
  * shape the reference forwards to other servers and appends to the
  * write buffer.
  *
  * Encoding uses the flatbuffers runtime that ships with Arrow
  * (`com.google.flatbuffers.FlatBufferBuilder`) — a conformant writer by
  * construction. Decoding is a hand-rolled vtable cursor over the PUBLIC
  * flatbuffers wire layout (root uoffset → table soffset → vtable of
  * u16 field slots; strings/vectors as length-prefixed uoffset targets),
  * so it accepts ANY conformant producer's bytes, the reference's
  * included — that generality, not byte-for-byte builder output, is the
  * parity contract (flatbuffers builders legally differ in vtable
  * sharing and alignment padding).
  *
  * Decoded columns reuse [[WriteProto]]'s batch model: Entry columns are
  * DENSE (values carry only non-null cells, the null mask maps row →
  * presence, entry.fbs Column docs), which is exactly the contract
  * `WriteProto.cells` materializes rows from. Entry's
  * `LogicalColumnType` byte (IOx=0/Tag=1/Field=2/Time=3) maps to the
  * write_pb semantic ids (1/2/3/4).
  */
object EntryFlat {
  import WriteProto.{PbColumn, PbTableBatch, PbValues}

  final case class PartitionWrite(key: String, tables: Vector[PbTableBatch])
  final case class DeleteOp(tableName: String, predicate: String)
  final case class DecodedEntry(partitionWrites: Vector[PartitionWrite],
      deletes: Vector[DeleteOp])

  // union discriminants, entry.fbs declaration order
  private object Op { val Write = 1; val Delete = 2 }
  private object Vals {
    val I64 = 1; val F64 = 2; val U64 = 3; val Str = 4; val Bool = 5
    val Bytes = 6
  }

  // ------------------------------------------------------------- encode

  /** Entry{operation: write{partition_writes}} (entry.rs:824-857). */
  def encode(writes: Seq[PartitionWrite]): Array[Byte] = {
    val b = new FlatBufferBuilder(1024)
    val pwOffsets = writes.map { pw =>
      val keyOff = b.createString(pw.key)
      val tableOffsets = pw.tables.map(encodeTable(b, _))
      val tbVec = offsetVector(b, tableOffsets)
      b.startTable(2)
      b.addOffset(0, keyOff, 0)
      b.addOffset(1, tbVec, 0)
      b.endTable()
    }
    val pwVec = offsetVector(b, pwOffsets)
    b.startTable(1) // WriteOperations
    b.addOffset(0, pwVec, 0)
    val writeOps = b.endTable()
    finishEntry(b, Op.Write, writeOps)
  }

  /** Entry{operation: delete{deletes}} (entry.fbs DeleteOperations). */
  def encodeDeletes(deletes: Seq[DeleteOp]): Array[Byte] = {
    val b = new FlatBufferBuilder(256)
    val dOffsets = deletes.map { d =>
      val nameOff = b.createString(d.tableName)
      val predOff = b.createString(d.predicate)
      b.startTable(2)
      b.addOffset(0, nameOff, 0)
      b.addOffset(1, predOff, 0)
      b.endTable()
    }
    val dVec = offsetVector(b, dOffsets)
    b.startTable(1) // DeleteOperations
    b.addOffset(0, dVec, 0)
    val delOps = b.endTable()
    finishEntry(b, Op.Delete, delOps)
  }

  private def finishEntry(b: FlatBufferBuilder, opType: Int,
      opOff: Int): Array[Byte] = {
    b.startTable(2) // Entry: operation union = (type slot 0, value slot 1)
    b.addByte(0, opType.toByte, 0)
    b.addOffset(1, opOff, 0)
    b.finish(b.endTable())
    b.sizedByteArray()
  }

  private def offsetVector(b: FlatBufferBuilder, offs: Seq[Int]): Int = {
    b.startVector(4, offs.size, 4)
    offs.reverseIterator.foreach(b.addOffset)
    b.endVector()
  }

  private def encodeTable(b: FlatBufferBuilder, t: PbTableBatch): Int = {
    val nameOff = b.createString(t.name)
    val colOffsets = t.columns.map(encodeColumn(b, _))
    val colVec = offsetVector(b, colOffsets)
    b.startTable(2)
    b.addOffset(0, nameOff, 0)
    b.addOffset(1, colVec, 0)
    b.endTable()
  }

  private def encodeColumn(b: FlatBufferBuilder, c: PbColumn): Int = {
    val nameOff = b.createString(c.name)
    val v = c.values.getOrElse(PbValues())
    val (valType, valOff) =
      if (v.i64.nonEmpty) (Vals.I64, {
        b.startVector(8, v.i64.size, 8)
        v.i64.reverseIterator.foreach(b.addLong)
        scalarValuesTable(b, b.endVector())
      })
      else if (v.f64.nonEmpty) (Vals.F64, {
        b.startVector(8, v.f64.size, 8)
        v.f64.reverseIterator.foreach(b.addDouble)
        scalarValuesTable(b, b.endVector())
      })
      else if (v.u64.nonEmpty) (Vals.U64, {
        b.startVector(8, v.u64.size, 8)
        v.u64.reverseIterator.foreach(b.addLong)
        scalarValuesTable(b, b.endVector())
      })
      else if (v.str.nonEmpty) (Vals.Str, {
        val offs = v.str.map(b.createString(_))
        scalarValuesTable(b, offsetVector(b, offs))
      })
      else if (v.bool.nonEmpty) (Vals.Bool, {
        b.startVector(1, v.bool.size, 1)
        v.bool.reverseIterator.foreach(b.addBoolean)
        scalarValuesTable(b, b.endVector())
      })
      else (Vals.Bytes, {
        val offs = v.bytes.map { bytes =>
          val dataVec = b.createByteVector(bytes)
          b.startTable(1) // BytesValue
          b.addOffset(0, dataVec, 0)
          b.endTable()
        }
        scalarValuesTable(b, offsetVector(b, offs))
      })
    val maskOff =
      if (c.nullMask.isEmpty) 0 else b.createByteVector(c.nullMask)
    b.startTable(5) // Column: name, logical type, values union (2), mask
    b.addOffset(0, nameOff, 0)
    b.addByte(1, (c.semanticType - 1).toByte, 0) // write_pb id -> fbs enum
    b.addByte(2, valType.toByte, 0)
    b.addOffset(3, valOff, 0)
    if (maskOff != 0) b.addOffset(4, maskOff, 0)
    b.endTable()
  }

  /** Each XxxValues wrapper is a table with one `values` vector slot. */
  private def scalarValuesTable(b: FlatBufferBuilder, vecOff: Int): Int = {
    b.startTable(1)
    b.addOffset(0, vecOff, 0)
    b.endTable()
  }

  // ------------------------------------------------------------- decode

  /** Bounds-checked cursor over the public flatbuffers layout. */
  private final class Fb(bytes: Array[Byte]) {
    private val buf =
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def rootTable: Int = buf.getInt(0)
    /** Absolute position of field `id` in the table at `tab`, or 0. */
    def field(tab: Int, id: Int): Int = {
      val vtable = tab - buf.getInt(tab) // soffset, may be negative
      val vtSize = buf.getShort(vtable) & 0xffff
      val slot = 4 + 2 * id
      if (slot + 2 > vtSize) 0
      else {
        val off = buf.getShort(vtable + slot) & 0xffff
        if (off == 0) 0 else tab + off
      }
    }
    def indirect(pos: Int): Int = pos + buf.getInt(pos)
    def byteAt(pos: Int): Byte = buf.get(pos)
    def vectorLen(pos: Int): Int = buf.getInt(indirect(pos))
    def vectorElem(pos: Int, elemSize: Int, i: Int): Int =
      indirect(pos) + 4 + i * elemSize
    def longAt(pos: Int): Long = buf.getLong(pos)
    def doubleAt(pos: Int): Double = buf.getDouble(pos)
    /** Declared length validated against the remaining buffer BEFORE any
      * allocation: a crafted u32 length (e.g. 0x7ffffff0 on a tiny
      * buffer) would otherwise allocate gigabytes and throw
      * OutOfMemoryError — an Error that escapes decode()'s
      * Either-on-malformed catch and would kill the caller. */
    private def checkedLen(s: Int): Int = {
      val len = buf.getInt(s)
      require(len >= 0 && len <= bytes.length - s - 4,
        s"declared length $len overruns the ${bytes.length}-byte buffer")
      len
    }
    def string(pos: Int): String = {
      val s = indirect(pos)
      new String(bytes, s + 4, checkedLen(s), "UTF-8")
    }
    def byteVector(pos: Int): Array[Byte] = {
      val s = indirect(pos)
      val len = checkedLen(s)
      java.util.Arrays.copyOfRange(bytes, s + 4, s + 4 + len)
    }
  }

  def decode(bytes: Array[Byte]): Either[String, DecodedEntry] =
    try {
      if (bytes.length < 8) return Left("entry too short for a flatbuffer")
      val fb = new Fb(bytes)
      val entry = fb.rootTable
      val opTypePos = fb.field(entry, 0)
      val opPos = fb.field(entry, 1)
      if (opTypePos == 0 || opPos == 0) return Left("entry has no operation")
      (fb.byteAt(opTypePos).toInt, fb.indirect(opPos)) match {
        case (Op.Write, w) =>
          val pwPos = fb.field(w, 0)
          val pws =
            if (pwPos == 0) Vector.empty[PartitionWrite]
            else Vector.tabulate(fb.vectorLen(pwPos)) { i =>
              decodePartitionWrite(fb,
                fb.indirect(fb.vectorElem(pwPos, 4, i)))
            }
          Right(DecodedEntry(pws, Vector.empty))
        case (Op.Delete, d) =>
          val dPos = fb.field(d, 0)
          val ds =
            if (dPos == 0) Vector.empty[DeleteOp]
            else Vector.tabulate(fb.vectorLen(dPos)) { i =>
              val t = fb.indirect(fb.vectorElem(dPos, 4, i))
              DeleteOp(
                Option(fb.field(t, 0)).filter(_ != 0).map(fb.string)
                  .getOrElse(""),
                Option(fb.field(t, 1)).filter(_ != 0).map(fb.string)
                  .getOrElse(""))
            }
          Right(DecodedEntry(Vector.empty, ds))
        case (other, _) => Left(s"unknown entry operation type $other")
      }
    } catch {
      case e: IndexOutOfBoundsException =>
        Left(s"malformed entry flatbuffer: ${e.getMessage}")
      case e: IllegalArgumentException =>
        Left(s"malformed entry flatbuffer: ${e.getMessage}")
    }

  private def decodePartitionWrite(fb: Fb, pw: Int): PartitionWrite = {
    val keyPos = fb.field(pw, 0)
    val key = if (keyPos == 0) "" else fb.string(keyPos)
    val tbPos = fb.field(pw, 1)
    val tables =
      if (tbPos == 0) Vector.empty[PbTableBatch]
      else Vector.tabulate(fb.vectorLen(tbPos)) { i =>
        decodeTableBatch(fb, fb.indirect(fb.vectorElem(tbPos, 4, i)))
      }
    PartitionWrite(key, tables)
  }

  private def decodeTableBatch(fb: Fb, tb: Int): PbTableBatch = {
    val namePos = fb.field(tb, 0)
    val name = if (namePos == 0) "" else fb.string(namePos)
    val colPos = fb.field(tb, 1)
    val columns =
      if (colPos == 0) Vector.empty[PbColumn]
      else Vector.tabulate(fb.vectorLen(colPos)) { i =>
        decodeColumn(fb, fb.indirect(fb.vectorElem(colPos, 4, i)))
      }
    // row count reconstructs per entry.fbs's invariant:
    // values.len + popcount(null_mask) = n for EVERY column
    val counts = columns.map { c =>
      val dense = c.values.map(v => Seq(v.i64.size, v.f64.size, v.u64.size,
        v.str.size, v.bool.size, v.bytes.size).max).getOrElse(0)
      dense + c.nullMask.map(b => java.lang.Integer.bitCount(b & 0xff)).sum
    }
    require(counts.distinct.size <= 1,
      s"table $name: column row counts disagree: $counts")
    PbTableBatch(name, columns, counts.headOption.getOrElse(0))
  }

  private def decodeColumn(fb: Fb, c: Int): PbColumn = {
    val namePos = fb.field(c, 0)
    val name = if (namePos == 0) "" else fb.string(namePos)
    val ltPos = fb.field(c, 1)
    val logicalType = if (ltPos == 0) 0 else fb.byteAt(ltPos).toInt
    val vtPos = fb.field(c, 2)
    val valType = if (vtPos == 0) 0 else fb.byteAt(vtPos).toInt
    val vPos = fb.field(c, 3)
    val values = if (vPos == 0) None else {
      val vt = fb.indirect(vPos)
      val vecPos = fb.field(vt, 0)
      if (vecPos == 0) None
      else Some {
        val n = fb.vectorLen(vecPos)
        valType match {
          case Vals.I64 => PbValues(i64 = Vector.tabulate(n)(i =>
            fb.longAt(fb.vectorElem(vecPos, 8, i))))
          case Vals.F64 => PbValues(f64 = Vector.tabulate(n)(i =>
            fb.doubleAt(fb.vectorElem(vecPos, 8, i))))
          case Vals.U64 => PbValues(u64 = Vector.tabulate(n)(i =>
            fb.longAt(fb.vectorElem(vecPos, 8, i))))
          case Vals.Str => PbValues(str = Vector.tabulate(n)(i =>
            fb.string(fb.vectorElem(vecPos, 4, i))))
          case Vals.Bool => PbValues(bool = Vector.tabulate(n)(i =>
            fb.byteAt(fb.vectorElem(vecPos, 1, i)) != 0))
          case Vals.Bytes => PbValues(bytes = Vector.tabulate(n) { i =>
            val t = fb.indirect(fb.vectorElem(vecPos, 4, i))
            val dPos = fb.field(t, 0)
            if (dPos == 0) Array.emptyByteArray else fb.byteVector(dPos)
          })
          case other =>
            throw new IllegalArgumentException(
              s"column $name: unknown values union type $other")
        }
      }
    }
    val maskPos = fb.field(c, 4)
    val mask = if (maskPos == 0) Array.emptyByteArray
      else fb.byteVector(maskPos)
    // fbs enum (IOx=0/Tag=1/Field=2/Time=3) -> write_pb semantic id
    PbColumn(name, logicalType + 1, values, mask)
  }

  // --------------------------------------------------------- LP → Entry

  /** Build the Entry for a batch of parsed LP lines — the reference's
    * `lines_to_sharded_entries` partition/table grouping (entry.rs:58-137)
    * minus the shard split (the caller shards first if it shards at all):
    * lines group by the rules template's partition key, then by
    * measurement; each (partition, table) batch carries DENSE columns in
    * line-arrival row order (tags string, fields typed, `time` i64 ns
    * with `defaultTimeNs` filling absent stamps), null mask omitted when
    * a column covers every row. Conflicting field types across lines are
    * the reference's type-collision error. */
  def linesToEntry(lines: Seq[LineProtocol.ParsedLine],
      template: PartitionTemplate, defaultTimeNs: Long): Array[Byte] = {
    import LineProtocol._
    // field values rendered in keyColumn's cast-to-string spelling, for
    // templates whose Column part names a field (database_rules.rs:211-217
    // falls back from tag_value to field_value)
    def fieldStrings(l: ParsedLine): Seq[(String, String)] =
      l.fields.map {
        case (k, F64(v)) => (k, v.toString)
        case (k, I64(v)) => (k, v.toString)
        case (k, U64(v)) => (k, v.toString)
        case (k, Str(v)) => (k, v)
        case (k, Bool(v)) => (k, v.toString)
      }
    val byPartition = lines
      .groupBy(l => template.keyOf(l.measurement, l.tags,
        l.timestampNs.getOrElse(defaultTimeNs), fieldStrings(l)))
      .toSeq.sortBy(_._1)
    val writes = byPartition.map { case (key, ls) =>
      val tables = ls.groupBy(_.measurement).toSeq.sortBy(_._1)
        .map { case (m, rows) => buildBatch(m, rows, defaultTimeNs) }
      PartitionWrite(key, tables.toVector)
    }
    encode(writes)
  }

  private def buildBatch(measurement: String,
      rows: Seq[LineProtocol.ParsedLine],
      defaultTimeNs: Long): PbTableBatch = {
    import LineProtocol._
    val n = rows.size
    def mask(present: Int => Boolean): Array[Byte] =
      if ((0 until n).forall(present)) Array.emptyByteArray
      else {
        val m = new Array[Byte]((n + 7) / 8)
        (0 until n).foreach { r =>
          if (!present(r)) m(r >> 3) = (m(r >> 3) | (1 << (r & 7))).toByte
        }
        m
      }
    val tagNames = rows.flatMap(_.tags.map(_._1)).distinct.sorted
    val tagCols = tagNames.map { tn =>
      val perRow = rows.map(_.tags.collectFirst {
        case (k, v) if k == tn => v
      }).toIndexedSeq // positional mask lookups must be O(1)
      PbColumn(tn, WriteProto.Semantic.Tag,
        Some(PbValues(str = perRow.flatten.toVector)),
        mask(r => perRow(r).isDefined))
    }
    val fieldNames = rows.flatMap(_.fields.map(_._1)).distinct.sorted
    val fieldCols = fieldNames.map { fn =>
      val perRow = rows.map(_.fields.collectFirst {
        case (k, v) if k == fn => v
      }).toIndexedSeq
      val dense = perRow.flatten
      val values = dense.head match {
        case _: F64 =>
          require(dense.forall(_.isInstanceOf[F64]),
            s"field $fn: conflicting value types across lines")
          PbValues(f64 = dense.map(_.asInstanceOf[F64].v).toVector)
        case _: I64 =>
          require(dense.forall(_.isInstanceOf[I64]),
            s"field $fn: conflicting value types across lines")
          PbValues(i64 = dense.map(_.asInstanceOf[I64].v).toVector)
        case _: U64 =>
          require(dense.forall(_.isInstanceOf[U64]),
            s"field $fn: conflicting value types across lines")
          PbValues(u64 = dense.map(_.asInstanceOf[U64].v.longValue).toVector)
        case _: Str =>
          require(dense.forall(_.isInstanceOf[Str]),
            s"field $fn: conflicting value types across lines")
          PbValues(str = dense.map(_.asInstanceOf[Str].v).toVector)
        case _: Bool =>
          require(dense.forall(_.isInstanceOf[Bool]),
            s"field $fn: conflicting value types across lines")
          PbValues(bool = dense.map(_.asInstanceOf[Bool].v).toVector)
      }
      PbColumn(fn, WriteProto.Semantic.Field, Some(values),
        mask(r => perRow(r).isDefined))
    }
    val timeCol = PbColumn(graft.core.NsTime.TimeColumn,
      WriteProto.Semantic.Time,
      Some(PbValues(i64 =
        rows.map(_.timestampNs.getOrElse(defaultTimeNs)).toVector)),
      Array.emptyByteArray)
    PbTableBatch(measurement,
      (tagCols ++ fieldCols :+ timeCol).toVector, n)
  }
}
