package graft.server

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.RpcPredicate

/** Protobuf decoding for the storage service REQUEST surface — the
  * inbound half of the wire story whose outbound half is
  * [[StorageProto]]. Decodes the tonic request messages
  * (storage_common.proto:14-66,242-261, predicate.proto) from raw proto3
  * bytes with a hand-rolled cursor reader (same zero-dependency
  * discipline as the writer: varint / fixed / length-delimited only,
  * unknown fields skipped like any proto3 decoder must).
  *
  * The predicate `Node` tree converts to the engine's [[RpcPredicate]]
  * following the reference's conversion (rpc/storage/expr.rs): tag refs
  * become tag-column comparisons; the `\x00` measurement sentinel and
  * `\xff` field sentinel (rpc/storage/expr.rs TAG_KEY_MEASUREMENT /
  * TAG_KEY_FIELD) lift to table / field-set restrictions when they
  * appear as top-level AND-ed equality conjuncts — their only
  * reference-supported position.
  */
object StorageProtoReader {

  /** Cursor over one message's bytes; sub-messages get bounded
    * sub-readers, so a truncated length fails fast instead of reading
    * into the next field. */
  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    require(end <= buf.length, "sub-message length exceeds the buffer")
    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(pos < end, "varint runs past the message end")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0 && shift <= 63
      }) ()
      v
    }

    /** (field number, wire type) */
    def key(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }

    def fixed64(): Long = {
      require(pos + 8 <= end, "fixed64 runs past the message end")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8; v
    }

    def fixed32(): Int = {
      require(pos + 4 <= end, "fixed32 runs past the message end")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4; v
    }

    def bytesField(): Array[Byte] = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= end, "length-delimited field overruns")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len; out
    }

    def stringField(): String = new String(bytesField(), UTF_8)

    /** Bounded reader over an embedded message. */
    def sub(): Reader = {
      val len = varint().toInt
      require(len >= 0 && pos + len <= end, "embedded message overruns")
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => fixed64()
      case 2 => bytesField()
      case 5 => fixed32()
      case other =>
        throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  // ------------------------------------------------------- decoded model

  /** predicate.proto Node — one decoded tree node. Enums kept as ints
    * (predicate.proto values). */
  case class Node(nodeType: Int, children: Vector[Node],
      stringValue: Option[String] = None, boolValue: Option[Boolean] = None,
      intValue: Option[Long] = None, uintValue: Option[Long] = None,
      floatValue: Option[Double] = None, regexValue: Option[String] = None,
      tagRefValue: Option[Array[Byte]] = None,
      fieldRefValue: Option[String] = None,
      logical: Option[Int] = None, comparison: Option[Int] = None)

  object NodeType {
    val Logical = 0; val Comparison = 1; val Paren = 2
    val TagRef = 3; val Literal = 4; val FieldRef = 5
  }
  object Cmp {
    val Equal = 0; val NotEqual = 1; val StartsWith = 2; val Regex = 3
    val NotRegex = 4; val Lt = 5; val Lte = 6; val Gt = 7; val Gte = 8
  }

  case class ReadSource(orgId: Long, bucketId: Long)
  case class Dur(nsecs: Long, months: Long, negative: Boolean)
  case class WindowDef(every: Option[Dur], offset: Option[Dur])
  case class Aggregate(kind: Int)

  /** Union of the request family's fields; each decoder fills what its
    * message defines. */
  case class StorageRequest(
      source: Option[ReadSource] = None,
      range: Option[(Long, Long)] = None,
      predicate: Option[Node] = None,
      groupKeys: Seq[String] = Nil,
      group: Option[Int] = None,
      aggregates: Seq[Int] = Nil,
      windowEveryNs: Long = 0L,
      offsetNs: Long = 0L,
      window: Option[WindowDef] = None,
      tagKey: Option[Array[Byte]] = None) {
    /** The reference's database-name resolution
      * (service.rs get_database_name -> names.rs
      * org_and_bucket_to_database over Id's {:016x} rendering). */
    def databaseName: Option[String] =
      source.map(s => f"${s.orgId}%016x_${s.bucketId}%016x")
  }

  def decodeNode(r: Reader): Node = {
    var n = Node(0, Vector.empty)
    while (r.hasMore) r.key() match {
      case (1, 0) => n = n.copy(nodeType = r.varint().toInt)
      case (2, 2) => n = n.copy(children = n.children :+ decodeNode(r.sub()))
      case (3, 2) => n = n.copy(stringValue = Some(r.stringField()))
      case (4, 0) => n = n.copy(boolValue = Some(r.varint() != 0L))
      case (5, 0) => n = n.copy(intValue = Some(r.varint()))
      case (6, 0) => n = n.copy(uintValue = Some(r.varint()))
      case (7, 1) => n = n.copy(floatValue =
        Some(java.lang.Double.longBitsToDouble(r.fixed64())))
      case (8, 2) => n = n.copy(regexValue = Some(r.stringField()))
      case (9, 2) => n = n.copy(tagRefValue = Some(r.bytesField()))
      case (10, 2) => n = n.copy(fieldRefValue = Some(r.stringField()))
      case (11, 0) => n = n.copy(logical = Some(r.varint().toInt))
      case (12, 0) => n = n.copy(comparison = Some(r.varint().toInt))
      case (_, wt) => r.skip(wt)
    }
    n
  }

  /** Predicate { Node root = 1 } */
  private def decodePredicate(r: Reader): Option[Node] = {
    var root: Option[Node] = None
    while (r.hasMore) r.key() match {
      case (1, 2) => root = Some(decodeNode(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    root
  }

  /** TimestampRange { int64 start = 1; int64 end = 2 } */
  private def decodeRange(r: Reader): (Long, Long) = {
    var s = 0L; var e = 0L
    while (r.hasMore) r.key() match {
      case (1, 0) => s = r.varint()
      case (2, 0) => e = r.varint()
      case (_, wt) => r.skip(wt)
    }
    (s, e)
  }

  /** google.protobuf.Any { string type_url = 1; bytes value = 2 } whose
    * value is ReadSource { uint64 org_id = 1; uint64 bucket_id = 2 }. */
  private def decodeAnyReadSource(r: Reader): ReadSource = {
    var payload: Option[Array[Byte]] = None
    while (r.hasMore) r.key() match {
      case (1, 2) => r.bytesField() // type_url — single source type here
      case (2, 2) => payload = Some(r.bytesField())
      case (_, wt) => r.skip(wt)
    }
    var org = 0L; var bucket = 0L
    payload.foreach { p =>
      val s = new Reader(p)
      while (s.hasMore) s.key() match {
        case (1, 0) => org = s.varint()
        case (2, 0) => bucket = s.varint()
        case (_, wt) => s.skip(wt)
      }
    }
    ReadSource(org, bucket)
  }

  /** Aggregate { AggregateType type = 1 } */
  private def decodeAggregate(r: Reader): Int = {
    var k = 0
    while (r.hasMore) r.key() match {
      case (1, 0) => k = r.varint().toInt
      case (_, wt) => r.skip(wt)
    }
    k
  }

  /** Duration { int64 nsecs = 1; int64 months = 2; bool negative = 3 } */
  private def decodeDuration(r: Reader): Dur = {
    var ns = 0L; var months = 0L; var neg = false
    while (r.hasMore) r.key() match {
      case (1, 0) => ns = r.varint()
      case (2, 0) => months = r.varint()
      case (3, 0) => neg = r.varint() != 0L
      case (_, wt) => r.skip(wt)
    }
    Dur(ns, months, neg)
  }

  /** Window { Duration every = 1; Duration offset = 2 } */
  private def decodeWindow(r: Reader): WindowDef = {
    var every: Option[Dur] = None; var offset: Option[Dur] = None
    while (r.hasMore) r.key() match {
      case (1, 2) => every = Some(decodeDuration(r.sub()))
      case (2, 2) => offset = Some(decodeDuration(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    WindowDef(every, offset)
  }

  /** ReadFilterRequest / TagKeysRequest / MeasurementNamesRequest — the
    * {source=1, range=2, predicate=3} family. */
  def decodeReadFilter(bytes: Array[Byte]): StorageRequest = {
    var req = StorageRequest()
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (3, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    req
  }

  /** ReadGroupRequest (storage_common.proto:20-54): adds group_keys=4,
    * group=5, aggregate=6. */
  def decodeReadGroup(bytes: Array[Byte]): StorageRequest = {
    var req = StorageRequest()
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (3, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (4, 2) => req = req.copy(groupKeys = req.groupKeys :+ r.stringField())
      case (5, 0) => req = req.copy(group = Some(r.varint().toInt))
      case (6, 2) => req = req.copy(aggregates =
        req.aggregates :+ decodeAggregate(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    req
  }

  /** ReadWindowAggregateRequest (storage_common.proto:242-250):
    * WindowEvery=4, aggregate=5 (repeated), Offset=6, window=7. */
  def decodeReadWindowAggregate(bytes: Array[Byte]): StorageRequest = {
    var req = StorageRequest()
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (3, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (4, 0) => req = req.copy(windowEveryNs = r.varint())
      case (5, 2) => req = req.copy(aggregates =
        req.aggregates :+ decodeAggregate(r.sub()))
      case (6, 0) => req = req.copy(offsetNs = r.varint())
      case (7, 2) => req = req.copy(window = Some(decodeWindow(r.sub())))
      case (_, wt) => r.skip(wt)
    }
    req
  }

  /** TagValuesRequest (storage_common.proto:174-182): tag_key=4 bytes. */
  def decodeTagValues(bytes: Array[Byte]): StorageRequest = {
    var req = StorageRequest()
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (3, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (4, 2) => req = req.copy(tagKey = Some(r.bytesField()))
      case (_, wt) => r.skip(wt)
    }
    req
  }

  /** MeasurementTagKeysRequest / MeasurementFieldsRequest
    * (storage_common.proto:197-203,214-221): source=1, measurement=2
    * (a plain string, not the sentinel), range=3, predicate=4. Returns
    * the request plus the measurement name. */
  def decodeMeasurementScoped(bytes: Array[Byte])
      : (StorageRequest, Option[String]) = {
    var req = StorageRequest()
    var measurement: Option[String] = None
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => measurement = Some(new String(r.bytesField(), UTF_8))
      case (3, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (4, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    (req, measurement)
  }

  /** MeasurementTagValuesRequest (storage_common.proto:205-212):
    * source=1, measurement=2, tag_key=3, range=4, predicate=5. */
  def decodeMeasurementTagValues(bytes: Array[Byte])
      : (StorageRequest, Option[String]) = {
    var req = StorageRequest()
    var measurement: Option[String] = None
    val r = new Reader(bytes)
    while (r.hasMore) r.key() match {
      case (1, 2) => req = req.copy(source = Some(decodeAnyReadSource(r.sub())))
      case (2, 2) => measurement = Some(new String(r.bytesField(), UTF_8))
      case (3, 2) => req = req.copy(tagKey = Some(r.bytesField()))
      case (4, 2) => req = req.copy(range = Some(decodeRange(r.sub())))
      case (5, 2) => req = req.copy(predicate = decodePredicate(r.sub()))
      case (_, wt) => r.skip(wt)
    }
    (req, measurement)
  }

  // ----------------------------------------- Node tree -> RpcPredicate

  /** The storage protocol's magic tag keys (expr.rs:42-48): `\x00` means
    * the measurement (table) name, `\xff` the field column name. */
  private def sentinelOf(tagRef: Array[Byte]): Option[String] =
    if (tagRef.length == 1 && tagRef(0) == 0x00.toByte) Some("_measurement")
    else if (tagRef.length == 1 && tagRef(0) == 0xff.toByte) Some("_field")
    else None

  private def tagRefName(tagRef: Array[Byte]): String =
    sentinelOf(tagRef).getOrElse(new String(tagRef, UTF_8))

  /** A request's tag_key bytes rendered in the facade's key spelling:
    * the 0x00/0xff sentinels by name, anything else as UTF-8. */
  def renderTagKey(tk: Array[Byte]): String =
    sentinelOf(tk).getOrElse(new String(tk, UTF_8))

  /** Decoded predicate semantics: an optional measurement restriction, an
    * optional field-set restriction, and residual row-level expressions. */
  case class DecodedPredicate(measurement: Option[String],
      fields: Seq[String], exprs: Seq[Column])

  private def literalColumn(n: Node): Either[String, Column] =
    n.stringValue.map(lit).orElse(n.intValue.map(lit))
      .orElse(n.uintValue.map(lit)).orElse(n.floatValue.map(lit))
      .orElse(n.boolValue.map(lit)).orElse(n.regexValue.map(lit))
      .toRight("LITERAL node carries no value")

  private def operandColumn(n: Node): Either[String, Column] =
    n.nodeType match {
      case NodeType.TagRef =>
        n.tagRefValue.map(b => col(tagRefName(b)))
          .toRight("TAG_REF node without tag_ref_value")
      case NodeType.FieldRef =>
        n.fieldRefValue.map(col).toRight("FIELD_REF node without value")
      case NodeType.Literal => literalColumn(n)
      case NodeType.Paren if n.children.size == 1 => operandColumn(n.children.head)
      case other => Left(s"unsupported operand node type $other")
    }

  private def comparisonColumn(n: Node): Either[String, Column] = {
    if (n.children.size != 2)
      return Left(s"comparison with ${n.children.size} operands")
    // the operator rides the `value` oneof: a prost/Go client always
    // writes it, but EQUAL encodes as 0 which zero-omitting writers drop
    // — absent defaults to EQUAL either way
    val c = n.comparison.getOrElse(Cmp.Equal)
    for {
      l <- operandColumn(n.children(0))
      r <- operandColumn(n.children(1))
      out <- c match {
        case Cmp.Equal => Right(l === r)
        case Cmp.NotEqual => Right(l =!= r)
        case Cmp.Lt => Right(l < r)
        case Cmp.Lte => Right(l <= r)
        case Cmp.Gt => Right(l > r)
        case Cmp.Gte => Right(l >= r)
        case Cmp.StartsWith =>
          n.children(1).stringValue.map(s => l.startsWith(s))
            .toRight("STARTS_WITH needs a string literal")
        case Cmp.Regex =>
          regexOf(n.children(1)).map(re =>
            l.rlike(graft.core.GoRegex.toJava(re)))
        case Cmp.NotRegex =>
          // null matches neither side — same semantics as
          // RpcPredicate.withRegexNotMatch
          regexOf(n.children(1)).map(re =>
            l.isNotNull && !l.rlike(graft.core.GoRegex.toJava(re)))
        case other => Left(s"unsupported comparison $other")
      }
    } yield out
  }

  private def regexOf(n: Node): Either[String, String] =
    n.regexValue.orElse(n.stringValue)
      .toRight("regex comparison needs a regex literal")

  /** Any node to one boolean Column (used below the top-level AND spine,
    * where sentinel lifting is not allowed — matching the reference,
    * which rejects _measurement/_field refs in general positions). */
  private def nodeToColumn(n: Node): Either[String, Column] = n.nodeType match {
    case NodeType.Paren =>
      if (n.children.size == 1) nodeToColumn(n.children.head)
      else Left("PAREN with != 1 child")
    case NodeType.Comparison =>
      sentinelComparison(n) match {
        case Some(_) => Left("_measurement/_field predicates are only " +
          "supported as top-level AND conjuncts")
        case None => comparisonColumn(n)
      }
    case NodeType.Logical =>
      if (n.children.isEmpty) Left("LOGICAL node without children")
      else n.children.foldLeft(Right(null): Either[String, Column]) {
        case (Left(e), _) => Left(e)
        case (Right(null), c) => nodeToColumn(c)
        case (Right(acc), c) => nodeToColumn(c).map { cc =>
          if (n.logical.contains(1)) acc || cc else acc && cc
        }
      }
    case other => Left(s"node type $other is not a boolean expression")
  }

  /** (sentinel name, comparison, literal) when `n` is an EQUAL comparison
    * on a sentinel tag ref. */
  private def sentinelComparison(n: Node): Option[(String, String)] = {
    if (n.nodeType != NodeType.Comparison || n.children.size != 2) return None
    val l = n.children(0)
    if (l.nodeType != NodeType.TagRef) return None
    for {
      s <- l.tagRefValue.flatMap(sentinelOf)
      if n.comparison.getOrElse(Cmp.Equal) == Cmp.Equal
      v <- n.children(1).stringValue
    } yield (s, v)
  }

  /** Walk the top-level AND spine lifting sentinel equality conjuncts to
    * measurement/field restrictions; everything else converts to Columns.
    */
  def toDecodedPredicate(root: Option[Node]): Either[String, DecodedPredicate] = {
    def walk(n: Node, acc: DecodedPredicate): Either[String, DecodedPredicate] =
      n.nodeType match {
        case NodeType.Logical if !n.logical.contains(1) => // AND spine
          n.children.foldLeft(Right(acc): Either[String, DecodedPredicate]) {
            case (Left(e), _) => Left(e)
            case (Right(a), c) => walk(c, a)
          }
        case NodeType.Paren if n.children.size == 1 =>
          walk(n.children.head, acc)
        case _ => sentinelComparison(n) match {
          case Some(("_measurement", v)) =>
            if (acc.measurement.exists(_ != v))
              Left("conflicting _measurement restrictions")
            else Right(acc.copy(measurement = Some(v)))
          case Some(("_field", v)) => Right(acc.copy(fields = acc.fields :+ v))
          case _ => nodeToColumn(n).map(c => acc.copy(exprs = acc.exprs :+ c))
        }
      }
    root match {
      case None => Right(DecodedPredicate(None, Nil, Nil))
      case Some(n) => walk(n, DecodedPredicate(None, Nil, Nil))
    }
  }

  /** Full request -> (RpcPredicate, measurement restriction). */
  def toRpcPredicate(req: StorageRequest)
      : Either[String, (RpcPredicate, Option[String])] =
    toDecodedPredicate(req.predicate).map { dp =>
      var p = RpcPredicate(exprs = dp.exprs)
      req.range.foreach { case (s, e) => p = p.withRange(s, e) }
      if (dp.fields.nonEmpty) p = p.copy(fieldColumns = Some(dp.fields))
      (p, dp.measurement)
    }
}
