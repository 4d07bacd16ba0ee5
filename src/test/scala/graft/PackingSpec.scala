package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Packing

class PackingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("id", LongType),
    StructField("n", LongType)))

  private def mk(rows: (String, Long, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2), schema)

  private def pack(rows: (String, Long, Long)*): Seq[(String, Long, Long, Long, Long)] =
    Packing.packSequences(mk(rows: _*), Seq("g"), "id", "n", seqLen = 10)
      .orderBy("g", "id", "seq_id")
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("documents pack contiguously and split across sequence boundaries") {
    // g: 4 + 10 + 3 tokens -> stream of 17 over seqLen 10
    val out = pack(("g", 1L, 4L), ("g", 2L, 10L), ("g", 3L, 3L))
    assert(out == Seq(
      ("g", 1L, 0L, 0L, 4L),  // doc 1: seq 0 tokens [0,4)
      ("g", 2L, 0L, 4L, 6L),  // doc 2 spans the boundary: 6 in seq 0...
      ("g", 2L, 1L, 0L, 4L),  // ...4 in seq 1
      ("g", 3L, 1L, 4L, 3L))) // doc 3: seq 1 tokens [14,17)
  }

  test("a document longer than several sequences spans them all") {
    val out = pack(("g", 1L, 25L))
    assert(out == Seq(("g", 1L, 0L, 0L, 10L), ("g", 1L, 1L, 0L, 10L),
      ("g", 1L, 2L, 0L, 5L)))
    assert(out.map(_._5).sum == 25L)
  }

  test("groups pack independently and zero-token docs drop") {
    val out = pack(("a", 1L, 10L), ("b", 1L, 0L), ("b", 2L, 2L))
    assert(out == Seq(("a", 1L, 0L, 0L, 10L), ("b", 2L, 0L, 0L, 2L)))
  }

  test("token conservation: spans of each doc sum to its token count") {
    val docs = (1L to 50L).map(i => ("g", i, (i * 7) % 13 + 1))
    val out = pack(docs: _*)
    val perDoc = out.groupBy(_._2).view.mapValues(_.map(_._5).sum)
    docs.foreach { case (_, id, n) => assert(perDoc(id) == n) }
    // each (seq, slot) is covered exactly once: offsets within a seq chain
    out.groupBy(x => (x._1, x._3)).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._4)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 + a._5 == b._4) // previous span ends where next starts
      }
    }
  }

  test("chunking: sliding windows with overlap, trailing chunk shorter") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "abcdefghij")), 1),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val out = Packing.chunkDocuments(df, "id", "t", size = 4, stride = 3)
      .select("chunk_id", "chunk").orderBy("chunk_id")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toSeq
    assert(out == Seq(0 -> "abcd", 1 -> "defg", 2 -> "ghij"))
  }

  test("chunking: short document still emits chunk 0") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "ab")), 1),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val out = Packing.chunkDocuments(df, "id", "t", size = 4, stride = 3)
      .select("chunk_id", "chunk").collect().map(r => r.getInt(0) -> r.getString(1))
    assert(out.toSeq == Seq(0 -> "ab"))
  }

  private def cdcOf(rows: (Long, String)*): Map[Long, Seq[(String, Long)]] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    Packing.cdcChunks(df, "id", "t", mask = 8)
      .orderBy("id", "chunk_id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3))).toMap
  }

  test("cdcChunks: chunks reassemble the document; token counts add up") {
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    val chunks = cdcOf(1L -> text)(1L)
    assert(chunks.map(_._1).mkString(" ") == text)
    assert(chunks.map(_._2).sum == 40L)
    assert(chunks.size > 1, "mask 8 over 40 tokens should cut somewhere")
  }

  test("shardBalance: boustrophedon dealing by descending size within " +
      "each group, hand-checked totals beat round-robin skew") {
    // group "a": the hand-checked 10-doc deal; group "b": a copy of the
    // first three docs — its ranks must restart (keyed window), so doc 1
    // lands on shard 0 in BOTH groups
    val rows = (1L to 10L).map(i => Row("a", i, 11L - i)) ++
      (1L to 3L).map(i => Row("b", i, 11L - i))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("g", StringType), StructField("id", LongType),
        StructField("n", LongType))))
    val res = Packing.shardBalance(df, Seq("g"), "id", "n", shards = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    val out = (1L to 10L).map(i => i -> res(("a", i))).toMap
    // sizes desc: 10 9 8 | 7 6 5 | 4 3 2 | 1 -> shards 012 | 210 | 012 | 2
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 1,
      6L -> 0, 7L -> 0, 8L -> 1, 9L -> 2, 10L -> 2))
    val totals = (1L to 10L).groupBy(i => out(i))
      .view.mapValues(_.map(11L - _).sum).toMap
    assert(totals == Map(0 -> 19L, 1 -> 18L, 2 -> 18L))
    assert((1L to 3L).map(i => res(("b", i))) == Seq(0, 1, 2),
      "group b ranks independently of group a")
    intercept[IllegalArgumentException] {
      Packing.shardBalance(df, Nil, "id", "n", shards = 3)
    }
  }

  test("cdcChunks: boundaries re-synchronize after an insertion " +
      "(the content-defined property fixed windows lack)") {
    import org.apache.spark.unsafe.types.UTF8String
    val text = (0 until 40).map(i => s"tok$i").mkString(" ")
    // pick an inserted token that is NOT itself a boundary, so the only
    // change is a longer first chunk
    val ins = Seq("zzz", "qqq", "xxy", "wvu").find(t =>
      graft.functions.Hash60.hash60(UTF8String.fromString(t)) % 8 != 0).get
    val out = cdcOf(1L -> text, 2L -> s"$ins $text")
    val (a, b) = (out(1L), out(2L))
    assert(b.size == a.size)
    assert(b.head._1 == s"$ins ${a.head._1}")
    assert(b.tail == a.tail, "all chunks after the edited one are identical")
  }
}
