package graft.server

import graft.core.{PartitionTemplate, Sharding, TemplatePart}
import graft.streaming.{DatabaseRules, Lifecycle}

/** Protobuf codecs for the management-plane gRPC services — the
  * `influxdata.iox.management.v1.ManagementService` /
  * `google.longrunning.Operations` / `influxdata.iox.write.v1.WriteService`
  * message surface (management/v1/service.proto, database_rules.proto,
  * chunk.proto, partition.proto, jobs.proto, google/longrunning/
  * operations.proto, write/v1/service.proto), hand-rolled on the same
  * zero-dependency writer/reader the storage service uses
  * ([[StorageProto.Writer]] / [[StorageProtoReader.Reader]]).
  *
  * DatabaseRules field mapping to the engine's model
  * ([[graft.streaming.DatabaseRules]]): name(1), partition_template(2)
  * with table/column/time parts (regex & strf_time parts are not in the
  * engine's template model and decode to an error, not a silent drop),
  * lifecycle_rules(3) (seconds-denominated knobs convert to the model's
  * milliseconds), shard_config(8), write_buffer oneof writing(11)/
  * reading(12) (the model keeps one connection string; encode emits
  * `writing`). routing_config(9) is not modeled → decode error.
  */
object ManagementProto {
  import StorageProto.Writer
  import StorageProtoReader.Reader

  private def msg(f: Writer => Unit): Array[Byte] = {
    val w = new Writer; f(w); w.result()
  }

  // ------------------------------------------------------ DatabaseRules

  def encodeDatabaseRules(r: DatabaseRules): Array[Byte] = msg { w =>
    w.string(1, r.name)
    w.bytes(2, msg { t =>
      r.partitionTemplate.parts.foreach {
        case TemplatePart.Table =>
          t.bytes(1, msg(p => p.bytes(1, Array.emptyByteArray)))
        case TemplatePart.ColumnValue(n) => t.bytes(1, msg(_.string(2, n)))
        case TemplatePart.TimeFormat(f) => t.bytes(1, msg(_.string(3, f)))
      }
    })
    w.bytes(3, encodeLifecycle(r.lifecycle))
    r.shardConfig.foreach(sc => w.bytes(8, encodeShardConfig(sc)))
    r.writeBufferConnection.foreach(c => w.string(11, c))
  }

  private def encodeLifecycle(lc: Lifecycle.Rules): Array[Byte] = msg { w =>
    lc.bufferSizeSoft.foreach(v => w.varintField(4, v))
    lc.bufferSizeHard.foreach(v => w.varintField(5, v))
    if (lc.dropNonPersisted) w.varintField(7, 1)
    if (lc.persist) w.varintField(9, 1)
    if (lc.lateArriveWindowMs > 0)
      w.varintField(12, lc.lateArriveWindowMs / 1000)
    if (lc.persistRowThreshold > 0) w.varintField(13, lc.persistRowThreshold)
    if (lc.persistAgeThresholdMs > 0)
      w.varintField(14, lc.persistAgeThresholdMs / 1000)
  }

  private def encodeShardConfig(sc: Sharding.ShardConfig): Array[Byte] =
    msg { w =>
      sc.specificTargets.foreach { case (m, shard) =>
        w.bytes(1, msg { t =>
          t.bytes(1, msg(_.string(1, m.tableRegex)))
          t.varintField(2, shard.toLong)
        })
      }
      sc.hashRing.foreach { h =>
        w.bytes(2, msg { r =>
          if (h.includeTable) r.varintField(1, 1)
          h.columns.foreach(c => r.string(2, c))
          r.packedVarint(3, h.shards.map(_.toLong))
        })
      }
    }

  def decodeDatabaseRules(raw: Array[Byte]): Either[String, DatabaseRules] = {
    val r = new Reader(raw)
    var name = ""
    var template: PartitionTemplate = DatabaseRules.DefaultTemplate
    var lifecycle = Lifecycle.Rules()
    var shard: Option[Sharding.ShardConfig] = None
    var writeBuffer: Option[String] = None
    while (r.hasMore) r.key() match {
      case (1, 2) => name = r.stringField()
      case (2, 2) =>
        decodeTemplate(r.sub()) match {
          case Left(e) => return Left(e)
          case Right(t) => template = t
        }
      case (3, 2) => lifecycle = decodeLifecycle(r.sub())
      case (8, 2) => shard = Some(decodeShardConfig(r.sub()))
      case (9, 2) => return Left("routing_config rules are not supported")
      case (10, 2) => r.bytesField() // worker_cleanup_avg_sleep: no analog
      case (11, 2) => writeBuffer = Some(r.stringField())
      case (12, 2) => writeBuffer = Some(r.stringField())
      case (_, wt) => r.skip(wt)
    }
    DatabaseRules.validateName(name).map(n =>
      DatabaseRules(n, template, lifecycle, writeBuffer, shard))
  }

  private def decodeTemplate(r: Reader): Either[String, PartitionTemplate] = {
    val parts = Seq.newBuilder[TemplatePart]
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        val p = r.sub()
        while (p.hasMore) p.key() match {
          case (1, 2) => p.bytesField(); parts += TemplatePart.Table
          case (2, 2) => parts += TemplatePart.ColumnValue(p.stringField())
          case (3, 2) => parts += TemplatePart.TimeFormat(p.stringField())
          case (4, 2) => return Left("regex template parts are not supported")
          case (5, 2) =>
            return Left("strf_time template parts are not supported")
          case (_, wt) => p.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    val ps = parts.result()
    Right(if (ps.isEmpty) DatabaseRules.DefaultTemplate
    else PartitionTemplate(ps))
  }

  private def decodeLifecycle(r: Reader): Lifecycle.Rules = {
    // proto3 presence semantics: an explicit LifecycleRules message with
    // `persist` absent MEANS false (the proto default) — starting from
    // the model default (true) would make persist=false unexpressable
    // on the wire. A rules message with no lifecycle at all still gets
    // the engine defaults (the caller never reaches here).
    var lc = Lifecycle.Rules(persist = false)
    while (r.hasMore) r.key() match {
      case (4, 0) => lc = lc.copy(bufferSizeSoft = Some(r.varint()))
      case (5, 0) => lc = lc.copy(bufferSizeHard = Some(r.varint()))
      case (7, 0) => lc = lc.copy(dropNonPersisted = r.varint() != 0)
      case (9, 0) => lc = lc.copy(persist = r.varint() != 0)
      case (12, 0) => lc = lc.copy(lateArriveWindowMs = r.varint() * 1000)
      case (13, 0) => lc = lc.copy(persistRowThreshold = r.varint())
      case (14, 0) => lc = lc.copy(persistAgeThresholdMs = r.varint() * 1000)
      case (_, wt) => r.skip(wt)
    }
    lc
  }

  private def decodeShardConfig(r: Reader): Sharding.ShardConfig = {
    val targets = Seq.newBuilder[(Sharding.Matcher, Int)]
    var ring: Option[Sharding.HashRing] = None
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        val t = r.sub()
        var regex = ""; var shard = 0
        while (t.hasMore) t.key() match {
          case (1, 2) =>
            val m = t.sub()
            while (m.hasMore) m.key() match {
              case (1, 2) => regex = m.stringField()
              case (_, wt) => m.skip(wt)
            }
          case (2, 0) => shard = t.varint().toInt
          case (_, wt) => t.skip(wt)
        }
        targets += ((Sharding.Matcher(regex), shard))
      case (2, 2) =>
        val h = r.sub()
        var includeTable = false
        val columns = Seq.newBuilder[String]
        val shards = IndexedSeq.newBuilder[Int]
        while (h.hasMore) h.key() match {
          case (1, 0) => includeTable = h.varint() != 0
          case (2, 2) => columns += h.stringField()
          case (3, 0) => shards += h.varint().toInt
          case (3, 2) => // packed
            val p = h.sub()
            while (p.hasMore) shards += p.varint().toInt
          case (_, wt) => h.skip(wt)
        }
        ring = Some(Sharding.HashRing(includeTable, columns.result(),
          shards.result()))
      case (_, wt) => r.skip(wt)
    }
    Sharding.ShardConfig(targets.result(), ring)
  }

  // ---------------------------------------------- chunks and partitions

  /** chunk.proto ChunkStorage enum from the facade's stage labels. */
  def storageEnum(stage: String): Int = stage match {
    case "OpenMutableBuffer" => 1
    case "ClosedMutableBuffer" => 2
    case "ReadBuffer" => 3
    case "ReadBufferAndObjectStore" => 4
    case "ObjectStoreOnly" => 5
    case _ => 0
  }

  def encodeChunk(c: HttpFacade.ChunkRow): Array[Byte] = msg { w =>
    w.string(1, c.partitionKey)
    w.varintField(2, c.id.toLong)
    w.varintField(3, storageEnum(c.storage).toLong)
    w.string(8, c.table)
    w.varintField(9, c.rowCount)
  }

  def chunksResponse(chunks: Seq[HttpFacade.ChunkRow]): Array[Byte] =
    msg(w => chunks.foreach(c => w.bytes(1, encodeChunk(c))))

  def partitionsResponse(keys: Seq[String]): Array[Byte] =
    msg(w => keys.foreach(k => w.bytes(1, msg(_.string(1, k)))))

  def partitionResponse(key: String): Array[Byte] =
    msg(w => w.bytes(1, msg(_.string(1, key))))

  // ------------------------------------------------- operations encoding

  private val MetadataTypeUrl =
    "type.googleapis.com/influxdata.iox.management.v1.OperationMetadata"
  private val EmptyTypeUrl = "type.googleapis.com/google.protobuf.Empty"

  /** jobs.proto OperationMetadata with the record's job in the oneof:
    * dummy(5) / close_chunk(7) / wipe_preserved_catalog(9). */
  private def operationMetadata(r: HttpFacade.OpRecord): Array[Byte] =
    msg { w =>
      r.kind match {
        case "CloseChunk" => w.bytes(7, msg { j =>
          j.string(1, r.dbName)
          j.string(2, r.partitionKey)
          j.varintField(3, r.chunkId.getOrElse(0).toLong)
          j.string(4, r.tableName)
        })
        case "WipePreservedCatalog" => w.bytes(9, msg(_.string(1, r.dbName)))
        case _ => w.bytes(5, msg(_.packedVarint(1, r.nanos)))
      }
    }

  /** google.longrunning.Operation (operations.proto:128): every facade
    * job is terminal, so done=true with either the Empty response or —
    * after cancel — the CANCELLED google.rpc.Status, exactly
    * rpc/operations.rs encode_tracker's (is_complete, is_cancelled)
    * matrix. */
  def encodeOperation(r: HttpFacade.OpRecord): Array[Byte] = msg { w =>
    w.string(1, r.id.toString)
    w.bytes(2, msg { a =>
      a.string(1, MetadataTypeUrl)
      a.bytes(2, operationMetadata(r))
    })
    w.varintField(3, 1) // done
    if (r.cancelled)
      w.bytes(4, msg { s =>
        s.varintField(1, 1) // tonic::Code::Cancelled
        s.string(2, "Job cancelled")
      })
    else w.bytes(5, msg(_.string(1, EmptyTypeUrl)))
  }

  def listOperationsResponse(ops: Seq[HttpFacade.OpRecord]): Array[Byte] =
    msg(w => ops.foreach(o => w.bytes(1, encodeOperation(o))))

  /** The `{operation: ...}` wrapper Close/DummyJob/Wipe responses share. */
  def operationWrapper(r: HttpFacade.OpRecord): Array[Byte] =
    msg(_.bytes(1, encodeOperation(r)))

  // ------------------------------------------------------ server plane

  def serverIdResponse(id: Int): Array[Byte] =
    msg(w => if (id != 0) { w.varintField(1, id.toLong); () })

  def remotesResponse(remotes: Seq[(Int, String)]): Array[Byte] =
    msg(w => remotes.foreach { case (id, conn) =>
      w.bytes(1, msg { r => r.varintField(1, id.toLong); r.string(2, conn) })
    })

  /** GetServerStatusResponse: the facade is always initialized; each
    * database reports DATABASE_STATE_INITIALIZED(4). */
  def serverStatusResponse(dbNames: Seq[String]): Array[Byte] =
    msg(_.bytes(1, msg { s =>
      s.varintField(1, 1) // initialized
      dbNames.foreach(db => s.bytes(3, msg { d =>
        d.string(1, db)
        d.varintField(3, 4)
      }))
    }))

  // ------------------------------------------------------ request reads

  /** Single string field `field` of a request message. */
  def readString(raw: Array[Byte], field: Int): String = {
    val r = new Reader(raw)
    var v = ""
    while (r.hasMore) r.key() match {
      case (`field`, 2) => v = r.stringField()
      case (_, wt) => r.skip(wt)
    }
    v
  }

  /** Single varint field `field` of a request message. */
  def readVarint(raw: Array[Byte], field: Int): Long = {
    val r = new Reader(raw)
    var v = 0L
    while (r.hasMore) r.key() match {
      case (`field`, 0) => v = r.varint()
      case (_, wt) => r.skip(wt)
    }
    v
  }

  /** The embedded DatabaseRules of a Create/UpdateDatabaseRequest
    * (field 1); Left when absent or invalid. */
  def readRules(raw: Array[Byte]): Either[String, DatabaseRules] = {
    val r = new Reader(raw)
    var rules: Option[Array[Byte]] = None
    while (r.hasMore) r.key() match {
      case (1, 2) => rules = Some(r.bytesField())
      case (_, wt) => r.skip(wt)
    }
    rules match {
      case None => Left("rules field is required")
      case Some(b) => decodeDatabaseRules(b)
    }
  }

  /** UpdateRemoteRequest.remote: (id, connection_string). */
  def readRemote(raw: Array[Byte]): Either[String, (Int, String)] = {
    val r = new Reader(raw)
    var found = false
    var id = 0; var conn = ""
    while (r.hasMore) r.key() match {
      case (1, 2) =>
        found = true
        val m = r.sub()
        while (m.hasMore) m.key() match {
          case (1, 0) => id = m.varint().toInt
          case (2, 2) => conn = m.stringField()
          case (_, wt) => m.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    if (!found) Left("remote field is required")
    else if (id == 0) Left("remote.id is required")
    else Right((id, conn))
  }

  /** CreateDummyJobRequest.nanos (repeated uint64, packed or not). */
  def readNanos(raw: Array[Byte]): Seq[Long] = {
    val r = new Reader(raw)
    val out = Seq.newBuilder[Long]
    while (r.hasMore) r.key() match {
      case (1, 0) => out += r.varint()
      case (1, 2) =>
        val p = r.sub()
        while (p.hasMore) out += p.varint()
      case (_, wt) => r.skip(wt)
    }
    out.result()
  }

  /** The (db_name, partition_key, table_name, chunk_id) tuple the
    * partition/chunk requests share (service.proto:214-261 — note
    * table_name=3 on New but table_name=4 + chunk_id=3 on Close/Unload). */
  def readChunkRef(raw: Array[Byte],
      tableField: Int): (String, String, String, Int) = {
    val r = new Reader(raw)
    var db = ""; var key = ""; var table = ""; var chunk = 0
    while (r.hasMore) r.key() match {
      case (1, 2) => db = r.stringField()
      case (2, 2) => key = r.stringField()
      case (`tableField`, 2) => table = r.stringField()
      case (3, 0) => chunk = r.varint().toInt
      case (_, wt) => r.skip(wt)
    }
    (db, key, table, chunk)
  }

  /** write/v1 WriteRequest: (db_name, lp_data). */
  def readWriteRequest(raw: Array[Byte]): (String, String) = {
    val r = new Reader(raw)
    var db = ""; var lp = ""
    while (r.hasMore) r.key() match {
      case (1, 2) => db = r.stringField()
      case (2, 2) => lp = r.stringField()
      case (_, wt) => r.skip(wt)
    }
    (db, lp)
  }
}
