package graft.server

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import graft.core.IoxSchema
import graft.operators.InfluxRpc

/** The storage gRPC service over [[GrpcServer]]'s real HTTP/2 framing —
  * `influxdata.platform.storage.Storage` methods wired to the SAME
  * protobuf decode/plan/encode pipeline the HTTP transport bridge serves
  * (reference: src/influxdb_ioxd/rpc/storage/service.rs behind tonic).
  * Requests here are always protobuf (no JSON convenience branch);
  * database resolution is the read_source org/bucket rendering, table
  * selection the `\x00 _measurement` predicate sentinel — exactly what
  * reference storage clients put on the wire.
  *
  * Methods wired: Capabilities, ReadFilter and ReadGroup (both
  * server-streaming ReadResponse; ReadGroup through the shared
  * transport-neutral planning core), TagKeys, TagValues (incl. the
  * `_measurement`/`_field` sentinel keys). The remaining methods share
  * these decoders/encoders and stay on the HTTP bridge; moving one is
  * mechanical — ReadGroup is the worked example.
  */
object StorageGrpc {
  val ServicePrefix = "/influxdata.platform.storage.Storage/"

  def dispatcher(facade: HttpFacade)
      : (String, Array[Byte]) => Either[String, Iterator[Array[Byte]]] =
    (path, req) =>
      try route(facade, path, req)
      catch {
        case NonFatal(e) =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      }

  private def route(f: HttpFacade, path: String, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] =
    if (!path.startsWith(ServicePrefix)) Left(s"unknown service: $path")
    else path.stripPrefix(ServicePrefix) match {
      case "Capabilities" =>
        Right(Iterator.single(StorageProto.capabilitiesResponse()))
      case "ReadFilter" => readFilter(f, raw)
      case "ReadGroup" => readGroup(f, raw)
      case "ReadWindowAggregate" => readWindowAggregate(f, raw)
      case "TagKeys" => tagKeys(f, raw)
      case "TagValues" => tagValues(f, raw)
      case other => Left(s"unimplemented method: $other")
    }

  private def readWindowAggregate(f: HttpFacade, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] = {
    val req = StorageProtoReader.decodeReadWindowAggregate(raw)
    StorageProtoReader.toRpcPredicate(req).flatMap { case (pred, meas) =>
      (req.databaseName, meas) match {
        case (Some(db), Some(t)) =>
          if (req.aggregates.size != 1)
            Left(s"aggregate must be a singleton, got ${req.aggregates.size}")
          else f.protoAggNames.get(req.aggregates.head) match {
            case Some(aggName) =>
              f.resolveProtoWindow(req).flatMap {
                case (evNs, evMonths, offNs, offMonths) =>
                  f.planReadWindowAggregate(db, t, pred, aggName, evNs,
                      evMonths, offNs, offMonths) match {
                    case Left((_, err)) => Left(err)
                    case Right(frames) => Right(frameStream(frames))
                  }
              }
            case None =>
              Left(s"unconvertible aggregate type enum: ${req.aggregates.head}")
          }
        case (None, _) => Left("request needs read_source")
        case (_, None) => Left("request needs a _measurement predicate")
      }
    }
  }

  private def frameStream(
      frames: org.apache.spark.sql.Dataset[InfluxRpc.Frame])
      : Iterator[Array[Byte]] = {
    import scala.jdk.CollectionConverters._
    frames.toLocalIterator().asScala.map(fr =>
      StorageProto.readResponse(Seq(StorageProto.encodeFrame(fr))))
  }

  private def readGroup(f: HttpFacade, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] = {
    val req = StorageProtoReader.decodeReadGroup(raw)
    StorageProtoReader.toRpcPredicate(req).flatMap { case (pred, meas) =>
      (req.databaseName, meas) match {
        case (Some(db), Some(t)) =>
          val code = req.aggregates.headOption.getOrElse(0)
          f.protoAggNames.get(code) match {
            case Some(aggName) =>
              f.planReadGroup(db, t, pred, aggName, req.groupKeys) match {
                case Left((_, err)) => Left(err)
                case Right(frames) => Right(frameStream(frames))
              }
            case None => Left(s"unconvertible aggregate type enum: $code")
          }
        case (None, _) => Left("request needs read_source")
        case (_, None) => Left("request needs a _measurement predicate")
      }
    }
  }

  private def readFilter(f: HttpFacade, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] = {
    val req = StorageProtoReader.decodeReadFilter(raw)
    StorageProtoReader.toRpcPredicate(req).flatMap { case (pred, meas) =>
      (req.databaseName, meas) match {
        case (Some(db), Some(t)) =>
          f.measurementView(db, t) match {
            case Some(df) =>
              import scala.jdk.CollectionConverters._
              val frames = InfluxRpc.toFrames(
                InfluxRpc.toSeriesSet(InfluxRpc.readFilter(df, pred),
                  IoxSchema.fieldColumns(df.schema)), t)
              Right(frames.toLocalIterator().asScala.map(fr =>
                StorageProto.readResponse(Seq(StorageProto.encodeFrame(fr)))))
            case None => Left(s"no table $t in database $db")
          }
        case (None, _) => Left("request needs read_source")
        case (_, None) => Left("request needs a _measurement predicate")
      }
    }
  }

  private def tagKeys(f: HttpFacade, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] = {
    val req = StorageProtoReader.decodeReadFilter(raw) // same field set
    StorageProtoReader.toRpcPredicate(req).flatMap { case (pred, meas) =>
      req.databaseName match {
        case Some(db) =>
          val keys = meas match {
            case Some(t) =>
              f.measurementView(db, t).map(InfluxRpc.tagKeys(_, pred))
            case None =>
              Some(InfluxRpc.tagKeysAcrossTables(f.dbTables(db), pred))
          }
          keys match {
            case Some(ks) => Right(Iterator.single(
              StorageProto.stringValuesResponse(
                StorageProto.tagKeysByteVecs(ks))))
            case None => Left(s"no such table in $db")
          }
        case None => Left("request needs read_source")
      }
    }
  }

  private def tagValues(f: HttpFacade, raw: Array[Byte])
      : Either[String, Iterator[Array[Byte]]] = {
    val req = StorageProtoReader.decodeTagValues(raw)
    StorageProtoReader.toRpcPredicate(req).flatMap { case (pred, meas) =>
      (req.databaseName, req.tagKey) match {
        case (Some(db), Some(tk)) =>
          val tables = f.dbTables(db)
          val values: Option[Seq[String]] =
            StorageProtoReader.renderTagKey(tk) match {
              case "\u0000" | "_measurement" =>
                Some(InfluxRpc.tableNames(tables, pred))
              case "ÿ" | "_field" => meas match {
                case Some(t) => tables.get(t).map(df =>
                  InfluxRpc.fieldColumns(df, pred).collect()
                    .map(_.getString(0)).toSeq)
                case None =>
                  Some(InfluxRpc.fieldColumnsAcrossTables(tables, pred)
                    .map(_._1))
              }
              case k => meas match {
                case Some(t) => tables.get(t).map(df =>
                  InfluxRpc.tagValues(df, k, pred)
                    .collect().map(_.getString(0)).toSeq)
                case None =>
                  Some(InfluxRpc.tagValuesAcrossTables(tables, k, pred))
              }
            }
          values match {
            case Some(vs) => Right(Iterator.single(
              StorageProto.stringValuesResponse(vs.map(_.getBytes(UTF_8)))))
            case None => Left(s"no such table in $db")
          }
        case (None, _) => Left("request needs read_source")
        case (_, None) => Left("request needs tag_key")
      }
    }
  }
}
