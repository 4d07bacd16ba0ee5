package graft

import graft.server.{GrpcClient, HttpFacade, IoxGrpc, ManagementGrpc, ManagementProto => P, StorageProto, StorageProtoReader => R}

/** End-to-end management-plane gRPC over REAL HTTP/2
  * (rpc/management.rs:50-472, rpc/operations.rs:129-205,
  * rpc/write.rs:18-72; e2e shapes from
  * tests/end_to_end_cases/management_api.rs, operations_api.rs,
  * write_api.rs): server id, remotes, serving readiness, database
  * create/get/update/list with DatabaseRules protobuf round-trips,
  * partitions and the chunk state machine, long-running operations, and
  * the LP write service — all through a loopback socket against the
  * multiplexed [[IoxGrpc]] endpoint. */
class GrpcManagementSpec extends SparkSpec {

  private def msg(f: StorageProto.Writer => Unit): Array[Byte] = {
    val w = new StorageProto.Writer; f(w); w.result()
  }
  private val M = ManagementGrpc.ManagementPrefix
  private val O = ManagementGrpc.OperationsPrefix
  private val W = ManagementGrpc.WritePrefix

  private def withServer(f: (HttpFacade, Int) => Unit): Unit = {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    val grpc = IoxGrpc.start(facade)
    try f(facade, grpc.boundPort)
    finally { grpc.stop(); facade.stop() }
  }

  test("IOxTesting TestError aborts the RPC (testing.rs panic contract)") {
    withServer { (_, p) =>
      // the reference's handler panics; the client-observable contract
      // is a failed RPC — INTERNAL(13) carrying the panic text here
      val (s, _) = GrpcClient.call(p,
        "/influxdata.platform.storage.IOxTesting/TestError",
        Array.emptyByteArray)
      assert(s == 13)
      // unknown testing methods are UNIMPLEMENTED, not mis-routed to
      // the storage fallback
      assert(GrpcClient.call(p,
        "/influxdata.platform.storage.IOxTesting/Nope",
        Array.emptyByteArray)._1 == 12)
    }
  }

  test("server id: NOT_FOUND before set, settable once, idempotent re-set") {
    withServer { (_, p) =>
      // e2e management_api.rs test_set_get_writer_id
      assert(GrpcClient.call(p, M + "GetServerId", Array.emptyByteArray)._1 == 5)
      assert(GrpcClient.call(p, M + "UpdateServerId",
        msg(_.varintField(1, 42)))._1 == 0)
      val (s, r) = GrpcClient.call(p, M + "GetServerId", Array.emptyByteArray)
      assert(s == 0 && P.readVarint(r.head, 1) == 42L)
      // same id again: ok; conflicting id: field violation
      assert(GrpcClient.call(p, M + "UpdateServerId",
        msg(_.varintField(1, 42)))._1 == 0)
      assert(GrpcClient.call(p, M + "UpdateServerId",
        msg(_.varintField(1, 43)))._1 == 3)
    }
  }

  test("remotes: upsert, sorted list, delete, NOT_FOUND on unknown delete") {
    withServer { (_, p) =>
      def update(id: Int, conn: String) = GrpcClient.call(p, M + "UpdateRemote",
        msg(_.bytes(1, msg { r =>
          r.varintField(1, id.toLong); r.string(2, conn) })))._1
      assert(update(2, "http://b:8082") == 0)
      assert(update(1, "http://a:8082") == 0)
      assert(update(2, "http://b2:8082") == 0) // upsert in place
      val (s, r) = GrpcClient.call(p, M + "ListRemotes", Array.emptyByteArray)
      assert(s == 0)
      val remotes = {
        val rr = new R.Reader(r.head)
        val out = Seq.newBuilder[(Long, String)]
        while (rr.hasMore) rr.key() match {
          case (1, 2) =>
            val m = rr.sub(); var id = 0L; var c = ""
            while (m.hasMore) m.key() match {
              case (1, 0) => id = m.varint()
              case (2, 2) => c = m.stringField()
              case (_, wt) => m.skip(wt)
            }
            out += ((id, c))
          case (_, wt) => rr.skip(wt)
        }
        out.result()
      }
      assert(remotes == Seq((1L, "http://a:8082"), (2L, "http://b2:8082")))
      assert(GrpcClient.call(p, M + "DeleteRemote",
        msg(_.varintField(1, 2)))._1 == 0)
      assert(GrpcClient.call(p, M + "DeleteRemote",
        msg(_.varintField(1, 2)))._1 == 5)
    }
  }

  test("database rules: create round-trips the protobuf, get/list/update; " +
      "AlreadyExists and NotFound statuses") {
    withServer { (facade, p) =>
      val rules = msg { r =>
        r.string(1, "db_one")
        r.bytes(2, msg { t => // [table, column host, time %Y-%m-%d]
          t.bytes(1, msg(_.bytes(1, Array.emptyByteArray)))
          t.bytes(1, msg(_.string(2, "host")))
          t.bytes(1, msg(_.string(3, "%Y-%m-%d")))
        })
        r.bytes(3, msg { lc =>
          lc.varintField(4, 10000000); lc.varintField(9, 1)
          lc.varintField(12, 300); lc.varintField(13, 5000)
        })
        r.string(11, "mem:db_one")
      }
      assert(GrpcClient.call(p, M + "CreateDatabase",
        msg(_.bytes(1, rules)))._1 == 0)
      // duplicate create: ALREADY_EXISTS(6) (management.rs:127-134)
      assert(GrpcClient.call(p, M + "CreateDatabase",
        msg(_.bytes(1, rules)))._1 == 6)
      // the decoded rules landed in the same store the HTTP surface reads
      val stored = facade.rulesOf("db_one")
      assert(stored.partitionTemplate.parts == Seq(
        graft.core.TemplatePart.Table,
        graft.core.TemplatePart.ColumnValue("host"),
        graft.core.TemplatePart.TimeFormat("%Y-%m-%d")))
      assert(stored.lifecycle.bufferSizeSoft.contains(10000000L))
      assert(stored.lifecycle.lateArriveWindowMs == 300000L)
      assert(stored.lifecycle.persistRowThreshold == 5000L)
      assert(stored.writeBufferConnection.contains("mem:db_one"))
      // get: the same rules come back on the wire
      val (gs, gr) = GrpcClient.call(p, M + "GetDatabase",
        msg(_.string(1, "db_one")))
      assert(gs == 0)
      val roundTrip = {
        val rr = new R.Reader(gr.head)
        var body: Array[Byte] = Array.emptyByteArray
        while (rr.hasMore) rr.key() match {
          case (1, 2) => body = rr.bytesField()
          case (_, wt) => rr.skip(wt)
        }
        P.decodeDatabaseRules(body)
      }
      assert(roundTrip == Right(stored))
      assert(GrpcClient.call(p, M + "GetDatabase",
        msg(_.string(1, "nope")))._1 == 5)
      // list includes it
      val (_, names) = GrpcClient.call(p, M + "ListDatabases",
        Array.emptyByteArray)
      val decoded = {
        val rr = new R.Reader(names.head)
        val out = Seq.newBuilder[String]
        while (rr.hasMore) rr.key() match {
          case (1, 2) => out += rr.stringField()
          case (_, wt) => rr.skip(wt)
        }
        out.result()
      }
      assert(decoded.contains("db_one"))
      // update replaces; updating an unknown db is NOT_FOUND
      val updated = msg { r =>
        r.string(1, "db_one")
        r.bytes(2, msg(_.bytes(1, msg(_.string(2, "region")))))
      }
      assert(GrpcClient.call(p, M + "UpdateDatabase",
        msg(_.bytes(1, updated)))._1 == 0)
      assert(facade.rulesOf("db_one").partitionTemplate.parts ==
        Seq(graft.core.TemplatePart.ColumnValue("region")))
      assert(GrpcClient.call(p, M + "UpdateDatabase",
        msg(_.bytes(1, msg { r => r.string(1, "ghost") })))._1 == 5)
      // server status: initialized with the database listed
      val (ss, sr) = GrpcClient.call(p, M + "GetServerStatus",
        Array.emptyByteArray)
      assert(ss == 0 && new String(sr.head, "ISO-8859-1").contains("db_one"))
    }
  }

  test("write service + partitions + chunk state machine + operations " +
      "+ unload + wipe + dummy job + serving readiness") {
    withServer { (facade, p) =>
      // partition by the host tag so two partitions emerge
      val rules = msg { r =>
        r.string(1, "wdb")
        r.bytes(2, msg(_.bytes(1, msg(_.string(2, "host")))))
      }
      assert(GrpcClient.call(p, M + "CreateDatabase",
        msg(_.bytes(1, rules)))._1 == 0)
      val lp = "cpu,host=a usage=1.5 100\ncpu,host=a usage=2.5 200\n" +
        "cpu,host=b usage=5.0 100"
      val (ws, wr) = GrpcClient.call(p, W + "Write",
        msg { w => w.string(1, "wdb"); w.string(2, lp) })
      assert(ws == 0 && P.readVarint(wr.head, 1) == 3L,
        "write service reports lines_written")
      // bad LP: INVALID_ARGUMENT, nothing written (rpc/write.rs:37-42)
      assert(GrpcClient.call(p, W + "Write",
        msg { w => w.string(1, "wdb"); w.string(2, "not line protocol") })._1 == 3)
      // WriteEntry: a missing entry is a field violation; malformed
      // flatbuffers reject without landing anything
      assert(GrpcClient.call(p, W + "WriteEntry",
        msg(_.string(1, "wdb")))._1 == 3)
      assert(GrpcClient.call(p, W + "WriteEntry",
        msg { w => w.string(1, "wdb"); w.bytes(2, Array[Byte](1)) })._1 == 3)
      // the gRPC write is indistinguishable from an HTTP LP write on the
      // query path — the write_pb_roundtrip contract
      val (qs, csv) = HttpFacade.getQuery(facade.boundPort, "wdb",
        "SELECT host, count(*) AS n, sum(usage) AS su FROM cpu GROUP BY host ORDER BY host")
      assert(qs == 200 && csv.trim.split("\n").toSeq ==
        Seq("host,n,su", "a,2,4.0", "b,1,5.0"))
      // partitions
      val (ps, pr) = GrpcClient.call(p, M + "ListPartitions",
        msg(_.string(1, "wdb")))
      assert(ps == 0)
      val keys = {
        val rr = new R.Reader(pr.head)
        val out = Seq.newBuilder[String]
        while (rr.hasMore) rr.key() match {
          case (1, 2) =>
            val m = rr.sub()
            while (m.hasMore) m.key() match {
              case (1, 2) => out += m.stringField()
              case (_, wt) => m.skip(wt)
            }
          case (_, wt) => rr.skip(wt)
        }
        out.result()
      }
      assert(keys == Seq("host_a", "host_b"))
      assert(GrpcClient.call(p, M + "ListPartitions",
        msg(_.string(1, "ghost")))._1 == 5)
      // get_partition: present key echoes, absent key = empty response
      assert(GrpcClient.call(p, M + "GetPartition",
        msg { w => w.string(1, "wdb"); w.string(2, "host_a") })._2.head.nonEmpty)
      assert(GrpcClient.call(p, M + "GetPartition",
        msg { w => w.string(1, "wdb"); w.string(2, "host_z") })._2.head.isEmpty)
      // rollover then close chunk 0; stages flow Open -> Closed -> ReadBuffer
      def chunkStorage(): Seq[Int] = {
        val (_, cr) = GrpcClient.call(p, M + "ListPartitionChunks",
          msg { w => w.string(1, "wdb"); w.string(2, "host_a") })
        val rr = new R.Reader(cr.head)
        val out = Seq.newBuilder[Int]
        while (rr.hasMore) rr.key() match {
          case (1, 2) =>
            val c = rr.sub()
            while (c.hasMore) c.key() match {
              case (3, 0) => out += c.varint().toInt
              case (_, wt) => c.skip(wt)
            }
          case (_, wt) => rr.skip(wt)
        }
        out.result()
      }
      assert(chunkStorage() == Seq(1)) // CHUNK_STORAGE_OPEN_MUTABLE_BUFFER
      assert(GrpcClient.call(p, M + "NewPartitionChunk",
        msg { w => w.string(1, "wdb"); w.string(2, "host_a")
          w.string(3, "cpu") })._1 == 0)
      assert(chunkStorage() == Seq(2)) // CLOSED_MUTABLE_BUFFER
      assert(GrpcClient.call(p, M + "NewPartitionChunk",
        msg { w => w.string(1, "wdb"); w.string(2, "host_z")
          w.string(3, "cpu") })._1 == 5)
      // unload before the chunk reaches the read buffer: lifecycle error
      assert(GrpcClient.call(p, M + "UnloadPartitionChunk",
        msg { w => w.string(1, "wdb"); w.string(2, "host_a")
          w.varintField(3, 0); w.string(4, "cpu") })._1 == 3)
      val (cs, cr) = GrpcClient.call(p, M + "ClosePartitionChunk",
        msg { w => w.string(1, "wdb"); w.string(2, "host_a")
          w.varintField(3, 0); w.string(4, "cpu") })
      assert(cs == 0)
      assert(chunkStorage() == Seq(3)) // READ_BUFFER
      // the response wraps a done longrunning.Operation whose metadata
      // Any carries the CloseChunk job
      val opBytes = {
        val rr = new R.Reader(cr.head)
        var b: Array[Byte] = Array.emptyByteArray
        while (rr.hasMore) rr.key() match {
          case (1, 2) => b = rr.bytesField()
          case (_, wt) => rr.skip(wt)
        }
        b
      }
      assert(P.readVarint(opBytes, 3) == 1L, "operation done")
      assert(new String(opBytes, "ISO-8859-1")
        .contains("influxdata.iox.management.v1.OperationMetadata"))
      val opName = P.readString(opBytes, 1)
      // operations service: get by name, list includes it, cancel marks
      val (gs2, gr2) = GrpcClient.call(p, O + "GetOperation",
        msg(_.string(1, opName)))
      assert(gs2 == 0 && P.readString(gr2.head, 1) == opName)
      assert(GrpcClient.call(p, O + "GetOperation",
        msg(_.string(1, "999")))._1 == 5)
      assert(GrpcClient.call(p, O + "WaitOperation",
        msg(_.string(1, opName)))._1 == 0)
      assert(GrpcClient.call(p, O + "DeleteOperation",
        msg(_.string(1, opName)))._1 == 12)
      val (ls, lr) = GrpcClient.call(p, O + "ListOperations",
        Array.emptyByteArray)
      assert(ls == 0 && lr.head.nonEmpty)
      assert(GrpcClient.call(p, O + "CancelOperation",
        msg(_.string(1, opName)))._1 == 0)
      val (_, cancelled) = GrpcClient.call(p, O + "GetOperation",
        msg(_.string(1, opName)))
      assert(new String(cancelled.head, "ISO-8859-1").contains("Job cancelled"))
      // unload now succeeds; the chunk stays queryable
      assert(GrpcClient.call(p, M + "UnloadPartitionChunk",
        msg { w => w.string(1, "wdb"); w.string(2, "host_a")
          w.varintField(3, 0); w.string(4, "cpu") })._1 == 0)
      assert(chunkStorage() == Seq(5)) // OBJECT_STORE_ONLY
      assert(HttpFacade.getQuery(facade.boundPort, "wdb",
        "SELECT count(*) AS n FROM cpu")._2.trim.endsWith("3"))
      // dummy job tracks an operation with the nanos metadata
      val (ds, dr) = GrpcClient.call(p, M + "CreateDummyJob",
        msg(_.packedVarint(1, Seq(100L, 200L))))
      assert(ds == 0 && dr.head.nonEmpty)
      // wipe preserved catalog: active database is AlreadyExists; unknown
      // database records the tracked op
      assert(GrpcClient.call(p, M + "WipePreservedCatalog",
        msg(_.string(1, "wdb")))._1 == 6)
      assert(GrpcClient.call(p, M + "WipePreservedCatalog",
        msg(_.string(1, "broken_db")))._1 == 0)
      // serving readiness flips and reads back through the facade
      assert(facade.servingReadiness)
      assert(GrpcClient.call(p, M + "SetServingReadiness",
        msg(_.varintField(1, 0)))._1 == 0)
      assert(!facade.servingReadiness)
      assert(GrpcClient.call(p, M + "SetServingReadiness",
        msg(_.varintField(1, 1)))._1 == 0)
      assert(facade.servingReadiness)
    }
  }

  test("flow control: request and response bodies beyond the 64 KiB " +
      "HTTP/2 initial window cross the wire intact") {
    withServer { (facade, p) =>
      // ~400 KB LP body: without the server's WINDOW_UPDATE hand-back the
      // stream stalls at 64 KiB and the call times out (the r9 regression
      // this test pins); 5000 distinct hosts also makes the TagValues
      // response exceed the client-side window, exercising the reverse
      // direction
      val lp = (0 until 5000).map(i =>
        s"big,host=host-with-a-long-name-$i value=$i.5 ${i}000").mkString("\n")
      assert(lp.length > 65536, s"fixture must exceed the window: ${lp.length}")
      val (ws, wr) = GrpcClient.call(p, W + "Write",
        msg { w => w.string(1, "bigdb"); w.string(2, lp) })
      assert(ws == 0 && P.readVarint(wr.head, 1) == 5000L)
      val (qs, csv) = HttpFacade.getQuery(facade.boundPort, "bigdb",
        "SELECT count(*) AS n, sum(value) AS s FROM big")
      assert(qs == 200 && csv.contains("5000"))
      // storage TagValues for host: 5000 long strings back over gRPC
      val req = {
        val w = new StorageProto.Writer
        w.bytes(1, msg(s => s.string(1, "type.googleapis.com/ReadSource")
          .bytes(2, msg(rs => rs.varintField(1, 0xb1).varintField(2, 0xb2)))))
        w.bytes(4, "host".getBytes("UTF-8"))
        w.result()
      }
      // land the same data under the hex db the read_source renders to
      assert(GrpcClient.call(p, W + "Write",
        msg { w => w.string(1, "00000000000000b1_00000000000000b2")
          w.string(2, lp) })._1 == 0)
      val (ts, tv) = GrpcClient.call(p,
        "/influxdata.platform.storage.Storage/TagValues", req)
      assert(ts == 0, s"TagValues status $ts")
      assert(tv.map(_.length).sum > 65536, "response crossed the window")
    }
  }

  test("shard config round-trips through the DatabaseRules protobuf") {
    val sc = graft.core.Sharding.ShardConfig(
      Seq((graft.core.Sharding.Matcher("^system\\."), 0)),
      Some(graft.core.Sharding.HashRing(includeTable = true,
        Seq("host", "region"), IndexedSeq(1, 2, 3))))
    val rules = graft.streaming.DatabaseRules("sharded",
      shardConfig = Some(sc))
    val decoded = P.decodeDatabaseRules(P.encodeDatabaseRules(rules))
    assert(decoded == Right(rules))
  }

  test("rules decode rejects unsupported shapes loudly") {
    // regex template part (database_rules.proto Part.regex)
    val regexPart = msg { r =>
      r.string(1, "db")
      r.bytes(2, msg(_.bytes(1, msg(_.bytes(4, msg { cf =>
        cf.string(1, "c"); cf.string(2, "f") })))))
    }
    assert(P.decodeDatabaseRules(regexPart).isLeft)
    // routing_config oneof arm
    val routing = msg { r =>
      r.string(1, "db"); r.bytes(9, Array.emptyByteArray)
    }
    assert(P.decodeDatabaseRules(routing).isLeft)
    // invalid database name
    assert(P.decodeDatabaseRules(msg(_.string(1, ""))).isLeft)
  }
}
