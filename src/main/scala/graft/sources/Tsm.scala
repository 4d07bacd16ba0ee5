package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TSM (Time-Structured Merge tree) file importer — the legacy-format
  * bridge from InfluxDB 1.x/2.x storage into this engine.
  *
  * Format (public; reference influxdb_tsm/src/reader.rs:65-155,
  * encoders dir — studied for semantics, re-implemented fresh):
  *
  * ```
  * [4B magic 0x16D116D1][1B version]
  * [data blocks ...]                    each: [4B CRC32][block body]
  * [index]                              sorted by series key
  * [8B BE index offset]
  * ```
  *
  * Index entry: `[2B keyLen][key][1B blockType][2B nBlocks]` then per
  * block `[8B minT][8B maxT][8B offset][4B size]`. A 2.x series key is
  * `[8B org][8B bucket],\x00=<measurement>,<tags...>,\xff=<field>#!~#
  * <field>` with `\`-escaping of `, = space` (key.rs:88-118).
  *
  * Block body: `[1B type][varint tsLen][timestamp block][values block]`.
  * Timestamps: high nibble of byte 0 picks raw-delta / simple8b / RLE,
  * low nibble a 10^k scaler (timestamp.rs:146-250). Integers: the same
  * three containers over zigzag deltas (integer.rs:121-215). Floats:
  * Gorilla XOR (Pelkonen et al. 2015) with InfluxDB's quiet-NaN
  * sentinel 0x7ff8000000000001 (float.rs:329-512). Booleans:
  * varint count + MSB-first bitpack (boolean.rs:59-95). Strings:
  * snappy block + varint-length-prefixed bytes (string.rs:75-105).
  * Unsigned: the integer container reinterpreted (unsigned.rs:14-26).
  *
  * Spark-first shape: ONE file is the unit of parallelism (TSM shards
  * are many small files at scale — the 1.x engine caps them at 2 GB),
  * so [[ingest]] distributes file decode over `binaryFiles` partitions
  * and the per-measurement pivot is an ordinary groupBy that Catalyst
  * plans like any other aggregation. Nothing about the decode is
  * driver-side except the final schema union.
  */
object Tsm {
  val Magic = 0x16d116d1

  final case class Block(minTime: Long, maxTime: Long, offset: Long,
    size: Int, typ: Int)
  final case class IndexEntry(key: Array[Byte], typ: Int, blocks: Seq[Block])
  final case class ParsedKey(orgId: String, bucketId: String,
    measurement: String, tags: Seq[(String, String)], field: String)
  final case class Point(measurement: String, tags: Map[String, String],
    field: String, time: Long, fval: Option[Double], ival: Option[Long],
    uval: Option[Long], sval: Option[String], bval: Option[Boolean])

  // ----------------------------------------------------------- index

  def readIndex(data: Array[Byte]): Seq[IndexEntry] = {
    require(data.length >= 13, s"not a TSM file: ${data.length} bytes")
    val magic = be32(data, 0)
    require(magic == Magic, f"bad TSM magic 0x$magic%08x")
    val indexOff = be64(data, data.length - 8)
    require(indexOff >= 5 && indexOff <= data.length - 8,
      s"index offset $indexOff out of range")
    val end = data.length - 8
    var pos = indexOff.toInt
    val out = Seq.newBuilder[IndexEntry]
    while (pos < end) {
      val keyLen = be16(data, pos); pos += 2
      val key = java.util.Arrays.copyOfRange(data, pos, pos + keyLen)
      pos += keyLen
      val typ = data(pos) & 0xff; pos += 1
      val n = be16(data, pos); pos += 2
      val blocks = (0 until n).map { _ =>
        val b = Block(be64s(data, pos), be64s(data, pos + 8),
          be64(data, pos + 16), be32(data, pos + 24), typ)
        pos += 28
        b
      }
      out += IndexEntry(key, typ, blocks)
    }
    out.result()
  }

  // ------------------------------------------------------------- key

  /** 2.x series-key parse (key.rs): returns measurement, sorted tags,
    * and the field (the part before the `#!~#` delimiter, unescaped). */
  def parseKey(key: Array[Byte]): ParsedKey = {
    require(key.length > 17, s"key too short: ${key.length}")
    val org = key.take(8).map(b => f"${b & 0xff}%02x").mkString
    val bucket = key.slice(8, 16).map(b => f"${b & 0xff}%02x").mkString
    var i = 17 // skip org, bucket, ','
    var measurement: Option[String] = None
    var field: Option[String] = None
    val tags = Seq.newBuilder[(String, String)]

    def readUntil(stops: Set[Char]): (String, Option[Char]) = {
      val sb = new StringBuilder
      while (i < key.length) {
        val c = (key(i) & 0xff).toChar
        if (c == '\\' && i + 1 < key.length) {
          sb += (key(i + 1) & 0xff).toChar; i += 2
        } else if (stops(c)) { i += 1; return (sb.toString, Some(c)) }
        else { sb += c; i += 1 }
      }
      (sb.toString, None)
    }

    var more = true
    while (more) {
      val (k, d1) = readUntil(Set('='))
      require(d1.contains('='), s"tag key without '=' in TSM key")
      if (k.length == 1 && k.charAt(0) == 0xff.toChar) { // the xff field marker
        // field: bytes up to the literal (unescaped) `#!~#`; everything
        // after the delimiter repeats the name unescaped (key.rs:158+)
        val sb = new StringBuilder
        var done = false
        while (!done && i < key.length) {
          if (i + 3 < key.length && key(i) == '#' && key(i + 1) == '!' &&
              key(i + 2) == '~' && key(i + 3) == '#') {
            done = true; i = key.length
          } else if (key(i) == '\\' && i + 1 < key.length) {
            sb += (key(i + 1) & 0xff).toChar; i += 2
          } else { sb += (key(i) & 0xff).toChar; i += 1 }
        }
        field = Some(sb.toString)
        more = false
      } else {
        val (v, d2) = readUntil(Set(','))
        if (k.length == 1 && k.charAt(0) == 0) { // the x00 measurement marker
          require(measurement.isEmpty, "second measurement in TSM key")
          measurement = Some(v)
        } else tags += (k -> v)
        more = d2.contains(',')
      }
    }
    ParsedKey(org, bucket,
      measurement.getOrElse(sys.error("TSM key without measurement")),
      tags.result(), field.getOrElse(sys.error("TSM key without field")))
  }

  // ---------------------------------------------------------- blocks

  /** Decode one data block: (timestamps, typed values). The 4-byte CRC
    * is skipped like the reference reader (reader.rs:593). */
  def decodeBlock(data: Array[Byte], block: Block): (Array[Long], AnyRef) = {
    val off = block.offset.toInt
    var i = off + 4 // skip CRC32
    val typ = data(i) & 0xff; i += 1
    require(typ == block.typ, s"block type $typ != index type ${block.typ}")
    val (tsLen, n) = varuint(data, i); i += n
    val ts = decodeTimestamps(data, i, tsLen.toInt)
    i += tsLen.toInt
    val valuesEnd = off + block.size
    val values: AnyRef = typ match {
      case 0 => decodeFloats(data, i, valuesEnd)
      case 1 => decodeIntegers(data, i, valuesEnd)
      case 2 => decodeBooleans(data, i, valuesEnd)
      case 3 => decodeStrings(data, i, valuesEnd)
      case 4 => decodeIntegers(data, i, valuesEnd) // unsigned: same container
      case other => sys.error(s"invalid TSM block type $other")
    }
    (ts, values)
  }

  private def decodeTimestamps(d: Array[Byte], off: Int, len: Int): Array[Long] = {
    if (len == 0) return Array.empty
    val enc = (d(off) & 0xff) >> 4
    val scaler = pow10((d(off) & 0x0f))
    enc match {
      case 0 => // raw big-endian deltas, cumulative
        val n = (len - 1) / 8
        val out = new Array[Long](n)
        var prev = 0L
        var i = 0
        while (i < n) { prev += be64s(d, off + 1 + i * 8); out(i) = prev; i += 1 }
        out
      case 2 => // RLE: [scaler nibble][8B first][varint delta][varint count]
        var i = off + 1
        val first = be64s(d, i); i += 8
        val (dv, n1) = varuint(d, i); i += n1
        val delta = dv * scaler
        val (count, _) = varuint(d, i)
        val out = new Array[Long](count.toInt)
        var v = first
        var k = 0
        while (k < count) { out(k) = v; v += delta; k += 1 }
        out
      case 1 => // simple8b deltas after a raw first value
        var i = off + 1
        val first = be64s(d, i); i += 8
        val deltas = simple8b(d, i, off + len)
        val out = new Array[Long](1 + deltas.length)
        out(0) = first
        var prev = first
        var k = 0
        while (k < deltas.length) {
          prev += deltas(k) * scaler; out(k + 1) = prev; k += 1
        }
        out
      case other => sys.error(s"invalid timestamp encoding $other")
    }
  }

  private def decodeIntegers(d: Array[Byte], off: Int, end: Int): Array[Long] = {
    if (off >= end) return Array.empty
    val enc = (d(off) & 0xff) >> 4
    enc match {
      case 0 => // raw big-endian zigzag deltas, cumulative
        val n = (end - off - 1) / 8
        val out = new Array[Long](n)
        var prev = 0L
        var i = 0
        while (i < n) {
          prev += zigzag(be64(d, off + 1 + i * 8)); out(i) = prev; i += 1
        }
        out
      case 2 => // RLE: [8B zigzag first][varint zigzag delta][varint count-AFTER-first]
        var i = off + 1
        val first = zigzag(be64(d, i)); i += 8
        val (dv, n1) = varuint(d, i); i += n1
        val delta = zigzag(dv)
        val (count, _) = varuint(d, i)
        val out = new Array[Long](count.toInt + 1)
        var v = first
        out(0) = v
        var k = 0
        while (k < count) { v += delta; out(k + 1) = v; k += 1 }
        out
      case 1 => // simple8b zigzag deltas after a raw zigzag first
        var i = off + 1
        val first = zigzag(be64(d, i)); i += 8
        val deltas = simple8b(d, i, end)
        val out = new Array[Long](1 + deltas.length)
        out(0) = first
        var prev = first
        var k = 0
        while (k < deltas.length) {
          prev += zigzag(deltas(k)); out(k + 1) = prev; k += 1
        }
        out
      case other => sys.error(s"invalid integer encoding $other")
    }
  }

  /** Gorilla XOR float decode with InfluxDB's quiet-NaN block sentinel. */
  private val FloatSentinel = 0x7ff8000000000001L

  private def decodeFloats(d: Array[Byte], off: Int, end: Int): Array[Double] = {
    if (end - off < 9) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = off + 1 // first byte is the encoding header (always gorilla)
    var value = be64(d, i); i += 8
    out += java.lang.Double.longBitsToDouble(value)
    // bit reader over d(i until end)
    var bitPos = 0L
    val totalBits = (end - i).toLong * 8
    def bit(): Int = {
      val b = (d(i + (bitPos >> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1
      bitPos += 1
      b
    }
    def bits(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    var leading = 0
    var meaningful = 64
    var done = false
    while (!done && bitPos < totalBits) {
      if (bit() == 0) out += java.lang.Double.longBitsToDouble(value)
      else {
        if (bit() == 1) {
          leading = bits(5).toInt
          meaningful = bits(6).toInt
          if (meaningful == 0) { meaningful = 64; leading = 0 }
        }
        val trailing = 64 - leading - meaningful
        val sbits = bits(meaningful)
        value ^= sbits << trailing
        if (value == FloatSentinel) done = true
        else out += java.lang.Double.longBitsToDouble(value)
      }
    }
    out.toArray
  }

  private def decodeBooleans(d: Array[Byte], off: Int, end: Int): Array[Boolean] = {
    if (off >= end) return Array.empty
    require((d(off) & 0xff) == (1 << 4), "unknown boolean encoding")
    var i = off + 1
    val (count0, n) = varuint(d, i); i += n
    val count = math.min(count0, (end - i).toLong * 8).toInt
    val out = new Array[Boolean](count)
    var k = 0
    while (k < count) {
      out(k) = ((d(i + (k >> 3)) >> (7 - (k & 7))) & 1) == 1
      k += 1
    }
    out
  }

  private def decodeStrings(d: Array[Byte], off: Int, end: Int): Array[String] = {
    if (off >= end) return Array.empty
    // first byte is the encoding header (only snappy exists)
    val raw = org.xerial.snappy.Snappy.uncompress(
      java.util.Arrays.copyOfRange(d, off + 1, end))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < raw.length) {
      val (len, n) = varuint(raw, i); i += n
      out += new String(raw, i, len.toInt, "UTF-8")
      i += len.toInt
    }
    out.toArray
  }

  /** simple8b unpack of d(off until end): 8-byte words, 4-bit selector. */
  private val S8bPack: Array[(Int, Int)] = Array( // (count, bits) for sel 2..15
    (60, 1), (30, 2), (20, 3), (15, 4), (12, 5), (10, 6), (8, 7), (7, 8),
    (6, 10), (5, 12), (4, 15), (3, 20), (2, 30), (1, 60))

  private def simple8b(d: Array[Byte], off: Int, end: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = off
    while (i + 8 <= end) {
      val w = be64(d, i); i += 8
      val sel = (w >>> 60).toInt
      sel match {
        case 0 => var k = 0; while (k < 240) { out += 1L; k += 1 }
        case 1 => var k = 0; while (k < 120) { out += 1L; k += 1 }
        case s =>
          val (count, bits) = S8bPack(s - 2)
          val mask = if (bits == 60) (1L << 60) - 1 else (1L << bits) - 1
          var v = w
          var k = 0
          while (k < count) { out += (v & mask); v >>>= bits; k += 1 }
      }
    }
    out.toArray
  }

  // ------------------------------------------------------- primitives

  private def be16(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
  private def be32(d: Array[Byte], i: Int): Int =
    ((d(i) & 0xff) << 24) | ((d(i + 1) & 0xff) << 16) |
      ((d(i + 2) & 0xff) << 8) | (d(i + 3) & 0xff)
  private def be64(d: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(i + k) & 0xffL); k += 1 }
    v
  }
  private def be64s(d: Array[Byte], i: Int): Long = be64(d, i)
  private def zigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)
  private def pow10(k: Int): Long = { var v = 1L; var i = 0; while (i < k) { v *= 10; i += 1 }; v }

  /** unsigned LEB128 (Go binary.Uvarint): returns (value, bytesRead). */
  private def varuint(d: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var i = off
    while (i < d.length) {
      val b = d(i) & 0xff
      v |= (b & 0x7fL) << shift
      i += 1
      if ((b & 0x80) == 0) return (v, i - off)
      shift += 7
    }
    sys.error("truncated varint")
  }

  // ------------------------------------------------------ full decode

  /** Decode every point in one TSM file image (driver- or executor-side;
    * pure function of the bytes). */
  def decodeFile(data: Array[Byte]): Iterator[Point] =
    readIndex(data).iterator.flatMap { e =>
      val k = parseKey(e.key)
      val tags = k.tags.toMap
      e.blocks.iterator.flatMap { b =>
        val (ts, values) = decodeBlock(data, b)
        (e.typ, values) match {
          case (0, vs: Array[Double]) => ts.iterator.zip(vs.iterator).map {
            case (t, v) => Point(k.measurement, tags, k.field, t,
              Some(v), None, None, None, None) }
          case (1, vs: Array[Long]) => ts.iterator.zip(vs.iterator).map {
            case (t, v) => Point(k.measurement, tags, k.field, t,
              None, Some(v), None, None, None) }
          case (4, vs: Array[Long]) => ts.iterator.zip(vs.iterator).map {
            case (t, v) => Point(k.measurement, tags, k.field, t,
              None, None, Some(v), None, None) }
          case (3, vs: Array[String]) => ts.iterator.zip(vs.iterator).map {
            case (t, v) => Point(k.measurement, tags, k.field, t,
              None, None, None, Some(v), None) }
          case (2, vs: Array[Boolean]) => ts.iterator.zip(vs.iterator).map {
            case (t, v) => Point(k.measurement, tags, k.field, t,
              None, None, None, None, Some(v)) }
          case other => sys.error(s"unexpected block decode $other")
        }
      }
    }

  /** Long-format decoded-points schema shared by [[readPoints]] and [[ingestPoints]]. */
  val pointSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("measurement", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("fval", DoubleType, nullable = true),
    StructField("ival", LongType, nullable = true),
    StructField("uval", LongType, nullable = true),
    StructField("sval", StringType, nullable = true),
    StructField("bval", BooleanType, nullable = true)))

  /** Long-format distributed read: one row per (series, time, field)
    * point across every `.tsm` file under `path` (gzipped fixtures
    * welcome — `.gz` is inflated per file). Decode runs in executors
    * via `binaryFiles`; at scale the file count is the parallelism. */
  def readPoints(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path).flatMap { case (name, pds) =>
      val raw = pds.toArray()
      val bytes =
        if (name.endsWith(".gz")) {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw))
          try in.readAllBytes() finally in.close()
        } else raw
      // Full path, not basename: real 1.x shard trees restart the
      // generation-sequence numbering per shard directory, so two .tsm
      // files with the SAME name in different subdirectories are
      // distinct files and must get distinct arrival ranks (r13 advice —
      // basename identity merged their points and let last-write-wins
      // resolve by max-value instead of generation order).
      decodeFile(bytes).map(p => Row(name, p.measurement, p.tags, p.field,
        p.time,
        p.fval.map(Double.box).orNull, p.ival.map(Long.box).orNull,
        p.uval.map(Long.box).orNull, p.sval.orNull,
        p.bval.map(Boolean.box).orNull))
    }
    spark.createDataFrame(rows, pointSchema)
  }

  /** Ingest to the engine's measurement shape: one wide DataFrame per
    * measurement with tag columns, typed field columns, and `time`
    * (ns long) — the same contract as [[LineProtocol.ingest]], so a TSM
    * shard drops into every downstream operator. Schema (tag/field
    * names and field types) is discovered from a one-pass metadata
    * aggregate over the long frame; the pivot is an ordinary groupBy
    * over (tags, time) — LAST WRITE WINS per (series, time, field),
    * with arrival order = the files' generation-sequence order (TSM
    * names are zero-padded `<generation>-<sequence>.tsm`, so the
    * lexicographic file-name rank IS the compaction order — a later
    * generation's rewrite of a point shadows the earlier one, the
    * same shadowing rule the 1.x engine applies when levels overlap).
    * The rank comes from one metadata-sized sorted broadcast of the
    * distinct file names. Within a single file a duplicate
    * (series, time, field) resolves to the max value (disclosed
    * approximation: real in-file block order needs no fixture). */
  def ingest(spark: SparkSession, path: String): Map[String, DataFrame] =
    ingestPoints(spark, readPoints(spark, path))

  /** [[ingest]] over an already-decoded long-format points frame (the
    * [[readPoints]]/`pointSchema` shape) — the seam that lets points from
    * any decoder reuse the schema-discovery + shadowing pivot. */
  def ingestPoints(spark: SparkSession, ptsRaw: DataFrame): Map[String, DataFrame] = {
    // Arrival rank per file: lexicographic FULL-PATH order. Within one
    // shard directory the zero-padded <generation>-<sequence>.tsm names
    // make this exactly the compaction order; ACROSS shard directories
    // the rank follows directory path order, and cross-shard-dir
    // generation ordering is UNDEFINED by the 1.x format (each shard dir
    // restarts numbering) — points of the same series+time in different
    // shard dirs should not exist in a healthy 1.x tree, and if they do,
    // path order is the documented tiebreak.
    val fileNames = ptsRaw.select("file").distinct()
      .collect().map(_.getString(0)).sorted
    val rank = spark.createDataFrame(
      fileNames.zipWithIndex.map { case (f, i) => (f, i.toLong) }.toSeq)
      .toDF("file", "__arrival")
    val pts = ptsRaw.join(broadcast(rank), "file")
    val meta = pts.groupBy("measurement", "field")
      .agg(
        max(when(col("fval").isNotNull, 1).otherwise(0)).as("f"),
        max(when(col("ival").isNotNull, 1).otherwise(0)).as("i"),
        max(when(col("uval").isNotNull, 1).otherwise(0)).as("u"),
        max(when(col("sval").isNotNull, 1).otherwise(0)).as("s"),
        max(when(col("bval").isNotNull, 1).otherwise(0)).as("b"))
      .collect()
    val tagKeys = pts.select(col("measurement"),
        explode(map_keys(col("tags"))).as("k"))
      .distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).sorted).toMap
    meta.groupBy(_.getString(0)).map { case (m, fields) =>
      val tks = tagKeys.getOrElse(m, Array.empty[String]).toSeq
      val base = pts.filter(col("measurement") === m)
      val tagCols = tks.map(t => col("tags")(t).as(t))
      val fieldAggs = fields.toSeq.sortBy(_.getString(1)).map { r =>
        val f = r.getString(1)
        // A field whose blocks carry more than one value type across the
        // imported files fails LOUDLY, mirroring the 1.x "field type
        // conflict" write error — the old fixed fval>ival>… priority
        // silently nulled every point of the non-chosen type in the
        // pivot (r13 advice).
        val present = Seq("float" -> r.getInt(2), "integer" -> r.getInt(3),
          "unsigned" -> r.getInt(4), "string" -> r.getInt(5),
          "boolean" -> r.getInt(6)).collect { case (t, 1) => t }
        if (present.size > 1) throw new IllegalArgumentException(
          s"field type conflict: measurement=$m field=$f has blocks of " +
            s"types [${present.mkString(", ")}] across the imported TSM files")
        val src = present.headOption match {
          case Some("float") => col("fval")
          case Some("integer") => col("ival")
          case Some("unsigned") => col("uval")
          case Some("string") => col("sval")
          case _ => col("bval")
        }
        // last-non-null by FILE arrival order per (series, time, field):
        // a later-generation rewrite of the same point shadows the
        // earlier one (max(struct(arrival, value)) — the Upsert rule)
        graft.operators.Upsert.lastNonNull(
          when(col("field") === f, src), col("__arrival")).as(f)
      }
      m -> base.select(tagCols ++ Seq(col("time"), col("field"),
          col("__arrival"), col("fval"),
          col("ival"), col("uval"), col("sval"), col("bval")): _*)
        .groupBy(tks.map(col) :+ col("time"): _*)
        .agg(fieldAggs.head, fieldAggs.tail: _*)
    }
  }
}
