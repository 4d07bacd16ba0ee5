package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.{FlightGrpc, GrpcClient, GrpcServer, HttpFacade, StorageGrpc, StorageProto, StorageProtoReader => R}

/** End-to-end storage gRPC over REAL HTTP/2: a client speaking the
  * public gRPC wire protocol (h2c prior knowledge, 5-byte length-prefixed
  * messages, grpc-status trailers) over a loopback socket against
  * [[GrpcServer]] + [[StorageGrpc]] — the same request/response protobuf
  * bytes the HTTP transport bridge serves, now under genuine framing. */
class GrpcStorageSpec extends SparkSpec {

  private def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
    val w = new StorageProto.Writer
    f(w); w.result()
  }
  private def tagRef(b: Array[Byte]) = msg(w => w.varintField(1, 3).bytes(9, b))
  private def litStr(s: String) = msg(w => w.varintField(1, 4).string(3, s))
  private def cmp(op: Int, l: Array[Byte], r: Array[Byte]) =
    msg(w => w.varintField(1, 1).bytes(2, l).bytes(2, r).varintField(12, op.toLong))
  private def predicate(root: Array[Byte]) = msg(w => w.bytes(1, root))
  // the Any-wrapped ReadSource a request's field 1 carries directly
  private def readSource(org: Long, bucket: Long) =
    msg(s => s.string(1, "type.googleapis.com/ReadSource")
      .bytes(2, msg(rs => rs.varintField(1, org).varintField(2, bucket))))
  private val measurementSentinel = Array(0x00.toByte)

  private def stringValues(resp: Array[Byte]): Seq[String] = {
    val r = new R.Reader(resp)
    val out = Seq.newBuilder[String]
    while (r.hasMore) r.key() match {
      case (1, 2) => out += new String(r.bytesField(), UTF_8)
      case (_, wt) => r.skip(wt)
    }
    out.result()
  }

  test("storage gRPC over real HTTP/2: caps, read_filter, tag keys/values") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    val storage = StorageGrpc.dispatcher(facade)
    val flight = FlightGrpc.dispatcher(facade)
    val grpc = new GrpcServer((path, req) =>
      if (path.startsWith(FlightGrpc.ServicePrefix)) flight(path, req)
      else storage(path, req))
    try {
      // land data under the hex database the read_source (0xab, 0xcd)
      // renders to, via the LP write endpoint
      val conn = new URI(s"http://127.0.0.1:${facade.boundPort}" +
        "/api/v2/write?org=00000000000000ab&bucket=00000000000000cd").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(
        ("cpu,host=a usage=1.5 100\ncpu,host=a usage=2.5 200\n" +
          "cpu,host=b usage=5.0 100").getBytes(UTF_8))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 204)

      val p = grpc.boundPort
      val S = StorageGrpc.ServicePrefix

      // Capabilities: empty request, one response message
      val (cs, caps) = GrpcClient.call(p, S + "Capabilities",
        Array.emptyByteArray)
      assert(cs == 0 && caps.size == 1 && caps.head.nonEmpty)

      // ReadFilter: table via the \x00 _measurement sentinel; the
      // server-streamed messages carry series/points frame pairs per host
      val rf = msg { b =>
        b.bytes(1, readSource(0xab, 0xcd))
        b.bytes(3, predicate(cmp(R.Cmp.Equal, tagRef(measurementSentinel),
          litStr("cpu"))))
      }
      val (rs, frames) = GrpcClient.call(p, S + "ReadFilter", rf)
      assert(rs == 0, s"grpc-status $rs")
      val members = frames.flatMap { m =>
        val r = new R.Reader(m)
        val out = Seq.newBuilder[Int]
        while (r.hasMore) r.key() match {
          case (1, 2) => val f = r.sub(); out += f.key()._1; f.bytesField()
          case (_, wt) => r.skip(wt)
        }
        out.result()
      }
      assert(members == Seq(1, 2, 1, 2), s"got $members")

      // ReadGroup by host with SUM: group frame + series + points per host
      val rg = msg { b =>
        b.bytes(1, readSource(0xab, 0xcd))
        b.bytes(3, predicate(cmp(R.Cmp.Equal, tagRef(measurementSentinel),
          litStr("cpu"))))
        b.bytes(4, "host".getBytes(UTF_8))
        b.varintField(5, 2) // Group::GROUP_BY
        b.bytes(6, msg(a => a.varintField(1, 1))) // Aggregate SUM
      }
      val (gs, gmsgs) = GrpcClient.call(p, S + "ReadGroup", rg)
      assert(gs == 0, s"grpc-status $gs")
      val gm = gmsgs.flatMap { m =>
        val r = new R.Reader(m)
        val out = Seq.newBuilder[Int]
        while (r.hasMore) r.key() match {
          case (1, 2) => val f = r.sub(); out += f.key()._1; f.bytesField()
          case (_, wt) => r.skip(wt)
        }
        out.result()
      }
      assert(gm == Seq(7, 1, 2, 7, 1, 2), s"got $gm")

      // ReadWindowAggregate: 100ns windows, SUM — per-series bucketed
      // series/points frames over the same transport
      val rwa = msg { b =>
        b.bytes(1, readSource(0xab, 0xcd))
        b.bytes(3, predicate(cmp(R.Cmp.Equal, tagRef(measurementSentinel),
          litStr("cpu"))))
        b.varintField(4, 100L) // WindowEvery ns
        b.bytes(5, msg(a => a.varintField(1, 1))) // Aggregate SUM
      }
      val (ws, wmsgs) = GrpcClient.call(p, S + "ReadWindowAggregate", rwa)
      assert(ws == 0, s"grpc-status $ws")
      val wm = wmsgs.flatMap { m =>
        val r = new R.Reader(m)
        val out = Seq.newBuilder[Int]
        while (r.hasMore) r.key() match {
          case (1, 2) => val fr = r.sub(); out += fr.key()._1; fr.bytesField()
          case (_, wt) => r.skip(wt)
        }
        out.result()
      }
      assert(wm == Seq(1, 2, 1, 2), s"got $wm")

      // TagKeys: sentinel keys plus the series tag
      val (ks, keys) = GrpcClient.call(p, S + "TagKeys", rf)
      assert(ks == 0 && stringValues(keys.head).contains("host"))

      // TagValues for host
      val tv = msg { b =>
        b.bytes(1, readSource(0xab, 0xcd))
        b.bytes(4, "host".getBytes(UTF_8))
      }
      val (vs, vals) = GrpcClient.call(p, S + "TagValues", tv)
      assert(vs == 0 && stringValues(vals.head) == Seq("a", "b"))

      // Arrow Flight DoGet on the same connection semantics: Ticket ->
      // FlightData messages -> reassembled IPC stream round-trips rows
      val ticketJson =
        """{"database_name":"00000000000000ab_00000000000000cd",""" +
          """"sql_query":"SELECT host, usage, time FROM cpu ORDER BY time, host"}"""
      val ticket = msg(w => w.bytes(1, ticketJson.getBytes(UTF_8)))
      val (fs, fdata) = GrpcClient.call(p,
        FlightGrpc.ServicePrefix + "DoGet", ticket)
      assert(fs == 0, s"flight grpc-status $fs")
      assert(fdata.size >= 2, "schema message + at least one batch")
      val (cols, rows) = graft.server.ArrowIpc.readStream(
        new java.io.ByteArrayInputStream(FlightGrpc.flightDataToIpc(fdata)))
      assert(cols == Seq("host", "usage", "time"))
      assert(rows == Seq(Seq("a", 1.5, 100L), Seq("b", 5.0, 100L),
        Seq("a", 2.5, 200L)))
      // flight errors ride the same grpc-status trailers
      val (fe, _) = GrpcClient.call(p, FlightGrpc.ServicePrefix + "DoGet",
        msg(w => w.bytes(1, """{"database_name":"nope","sql_query":"SELECT 1"}"""
          .getBytes(UTF_8))))
      assert(fe == 3)

      // metadata route family: names, scoped keys/values/fields,
      // cardinality, offsets — the full service.rs surface over gRPC
      val src = readSource(0xab, 0xcd)
      val (ms1, names) = GrpcClient.call(p, S + "MeasurementNames",
        msg(b => b.bytes(1, src)))
      assert(ms1 == 0 && stringValues(names.head) == Seq("cpu"))
      val scoped = msg { b => b.bytes(1, src); b.string(2, "cpu") }
      val (ms2, mtk) = GrpcClient.call(p, S + "MeasurementTagKeys", scoped)
      assert(ms2 == 0 && stringValues(mtk.head).contains("host"))
      val (ms3, mtv) = GrpcClient.call(p, S + "MeasurementTagValues",
        msg { b => b.bytes(1, src); b.string(2, "cpu")
          b.bytes(3, "host".getBytes(UTF_8)) })
      assert(ms3 == 0 && stringValues(mtv.head) == Seq("a", "b"))
      val (ms4, mf) = GrpcClient.call(p, S + "MeasurementFields", scoped)
      assert(ms4 == 0 && mf.size == 1 && mf.head.nonEmpty)
      val (ms5, card) = GrpcClient.call(p, S + "ReadSeriesCardinality",
        msg(b => b.bytes(1, src)))
      assert(ms5 == 0)
      // Int64ValuesResponse { repeated int64 values = 1 } (packed):
      // the db's one measurement carries two tag sets
      val cr = new R.Reader(card.head)
      assert(cr.key() == ((1, 2)))
      val packed = new R.Reader(cr.bytesField())
      assert(packed.varint() == 2L, "cpu has two series")
      val (ms6, off) = GrpcClient.call(p, S + "Offsets", Array.emptyByteArray)
      assert(ms6 == 0 && off.size == 1 && off.head.isEmpty)

      // errors surface as grpc-status 3 trailers, not transport failures
      val (es, _) = GrpcClient.call(p, S + "Nope", Array.emptyByteArray)
      assert(es == 3)
      val (ds, _) = GrpcClient.call(p, S + "ReadFilter",
        msg(b => b.bytes(3, predicate(cmp(R.Cmp.Equal,
          tagRef(measurementSentinel), litStr("cpu"))))))
      assert(ds == 3, "missing read_source is INVALID_ARGUMENT")
    } finally {
      grpc.stop(); facade.stop()
    }
  }
}
