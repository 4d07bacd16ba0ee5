package graft

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.{HttpFacade, StorageProto, WriteProto => W}

/** The protobuf write path (write_pb.rs; entry.rs:306 pb_to_entry):
  * byte-built WriteRequest messages through the decoder, the entry.rs
  * edge semantics (null mask, repeat-last fill, column-set validation),
  * and the equivalence that IS the service's contract — rows written as
  * a columnar protobuf batch are indistinguishable from the same rows
  * written as line protocol. */
class WriteProtoSpec extends SparkSpec {

  private def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
    val w = new StorageProto.Writer
    f(w); w.result()
  }

  /** Column { name=1, semantic=2, values=3, null_mask=4 }. */
  private def column(name: String, semantic: Int,
      values: StorageProto.Writer => Unit,
      nullMask: Array[Byte] = Array.emptyByteArray): Array[Byte] =
    msg { c =>
      c.string(1, name).varintField(2, semantic.toLong)
      c.bytes(3, msg(values))
      if (nullMask.nonEmpty) c.bytes(4, nullMask)
    }

  private def tableBatch(name: String, rows: Int,
      cols: Array[Byte]*): Array[Byte] = msg { t =>
    t.string(1, name)
    cols.foreach(t.bytes(2, _))
    t.varintField(3, rows.toLong)
  }

  private def writeRequest(db: String, tables: Array[Byte]*): Array[Byte] =
    msg(w => w.bytes(1, msg { b =>
      b.string(1, db)
      tables.foreach(b.bytes(2, _))
    }))

  test("decoder: packed + unpacked values, LSB-first null mask, repeat-last fill") {
    val batch = W.decodeWriteRequest(writeRequest("db",
      tableBatch("cpu", 4,
        column("host", W.Semantic.Tag,
          v => v.string(4, "a").string(4, "b").string(4, "c")),
        // packed i64 with a null at row 1 (mask 0b0010) and only THREE
        // values for 4 rows - 1 null = 3 slots: exactly dense
        column("usage", W.Semantic.Field,
          v => v.packedVarint(1, Seq(7L, 8L, 9L)), Array(0x02.toByte)),
        // under-provided: 4 non-null rows, 2 values -> last repeats
        column("load", W.Semantic.Field, v => v.packedDouble(2, Seq(1.5, 2.5))),
        column("time", W.Semantic.Time,
          v => v.packedVarint(1, Seq(100L, 200L, 300L, 400L))))))
    assert(batch.databaseName == "db")
    val t = batch.tables.head
    assert(t.name == "cpu" && t.rowCount == 4)
    val frames = W.toFrames(spark, batch)
    assert(frames.map(_._1) == Seq("cpu"))
    val df = frames.head._2
    assert(df.columns.toSeq == Seq("host", "usage", "load", "time"))
    val rows = df.orderBy("time").collect().map(r =>
      (r.getString(0), Option(r.get(1)), r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("a", Some(7L), 1.5, 100L),
      ("b", None, 2.5, 200L), // masked null consumed no value
      ("c", Some(8L), 2.5, 300L), // strings also repeat-last from here
      ("c", Some(9L), 2.5, 400L)))
    // schema carries the engine's LP category metadata
    import graft.core.IoxSchema
    assert(IoxSchema.tagColumns(df.schema) == Seq("host"))
    assert(IoxSchema.fieldColumns(df.schema) == Seq("usage", "load"))
  }

  test("decoder: column-set validation matches pb_check_table_batch_column_types") {
    def frames(cols: Array[Byte]*): Either[String, Unit] =
      try {
        W.toFrames(spark, W.decodeWriteRequest(
          writeRequest("db", tableBatch("t", 1, cols: _*))))
        Right(())
      } catch { case W.WritePbException(m) => Left(m) }
    val tagA = column("h", W.Semantic.Tag, v => v.string(4, "a"))
    val fieldF = column("f", W.Semantic.Field, v => v.packedDouble(2, Seq(1.0)))
    val timeT = column("time", W.Semantic.Time, v => v.packedVarint(1, Seq(1L)))
    val timeX = column("ts", W.Semantic.Time, v => v.packedVarint(1, Seq(1L)))
    val ioxC = column("c", W.Semantic.Iox, v => v.packedVarint(1, Seq(1L)))
    assert(frames(tagA, fieldF, timeT).isRight) // the LP set
    assert(frames(ioxC).isRight) // the IOx set
    assert(frames(ioxC, tagA, fieldF, timeT).isLeft) // IOx + LP tag
    assert(frames(fieldF, timeX).isLeft) // field needs time named 'time'
    assert(frames(fieldF).isLeft)
    assert(frames(tagA, timeT).isLeft) // tag without field
    // a tag carrying non-strings, an only-null column, a bad enum
    assert(frames(column("h", W.Semantic.Tag,
      v => v.packedVarint(1, Seq(1L))), fieldF, timeT).isLeft)
    assert(frames(column("g", W.Semantic.Field, _ => ()), timeT).isLeft)
    assert(frames(column("x", 9, v => v.packedVarint(1, Seq(1L)))).isLeft)
    // WriteRequest without database_batch
    assert((try Left(W.decodeWriteRequest(msg(_ => ())))
      catch { case W.WritePbException(m) => Right(m) }).isRight)
  }

  test("pb-written and LP-written rows are indistinguishable over the query path") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    try {
      val p = facade.boundPort
      // the SAME logical rows, once as line protocol, once as a columnar
      // protobuf batch, into two databases
      val lp = ("cpu,host=a usage=1.5,n=7i 100\n" +
        "cpu,host=b n=9i 100\n" + // usage null on this row
        "cpu,host=a usage=2.5,n=8i 200").getBytes(UTF_8)
      val w = new URI(s"http://127.0.0.1:$p/api/v2/write?org=o&bucket=lp").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      w.setRequestMethod("POST"); w.setDoOutput(true)
      w.getOutputStream.write(lp); w.getOutputStream.close()
      assert(w.getResponseCode == 204)

      // columnar: rows ordered (a,100),(b,100),(a,200); usage null at row 1
      val req = writeRequest("o_pb", tableBatch("cpu", 3,
        column("host", W.Semantic.Tag,
          v => v.string(4, "a").string(4, "b").string(4, "a")),
        column("usage", W.Semantic.Field,
          v => v.packedDouble(2, Seq(1.5, 2.5)), Array(0x02.toByte)),
        column("n", W.Semantic.Field, v => v.packedVarint(1, Seq(7L, 9L, 8L))),
        column("time", W.Semantic.Time,
          v => v.packedVarint(1, Seq(100L, 100L, 200L)))))
      val c = new URI(s"http://127.0.0.1:$p/api/v1/write_pb").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      c.setRequestMethod("POST"); c.setDoOutput(true)
      c.setRequestProperty("Content-Type", "application/x-protobuf")
      c.getOutputStream.write(req); c.getOutputStream.close()
      assert(c.getResponseCode == 200)
      assert(c.getHeaderField("Content-Type") == "application/x-protobuf")
      assert(c.getInputStream.readAllBytes().isEmpty) // WriteResponse {}

      def csv(db: String): String = {
        val q = URLEncoder.encode(
          "SELECT host, usage, n, time FROM cpu ORDER BY time, host", "UTF-8")
        val conn = new URI(s"http://127.0.0.1:$p/iox/api/v1/databases/$db" +
          s"/query?q=$q&format=csv").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        assert(conn.getResponseCode == 200)
        new String(conn.getInputStream.readAllBytes(), UTF_8)
      }
      val viaLp = csv("o_lp")
      val viaPb = csv("o_pb")
      assert(viaLp == viaPb, s"lp=$viaLp pb=$viaPb")
      assert(viaLp.linesIterator.size == 4) // header + 3 rows

      // malformed request -> 400 with the validation message
      val bad = new URI(s"http://127.0.0.1:$p/api/v1/write_pb").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      bad.setRequestMethod("POST"); bad.setDoOutput(true)
      bad.getOutputStream.write(writeRequest("o_pb", tableBatch("m", 1,
        column("f", W.Semantic.Field, v => v.packedDouble(2, Seq(1.0))))))
      bad.getOutputStream.close()
      assert(bad.getResponseCode == 400)
    } finally facade.stop()
  }
}
