package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Equivalence pins for the r16 native bit kernels
  * ([[graft.functions.SignPackExpr]], [[graft.functions.HammingDistExpr]])
  * against the composed higher-order-function formulations they replaced
  * (the pre-r16 Similarity.binarySign / hammingTopK bodies, reconstructed
  * verbatim here), over an adversarial vector matrix and the real sf0.01
  * embeddings. The ann_hamming/emb_hamming oracle queries hash their
  * results, so any divergence in bit placement, null handling, or edge
  * conventions is a correctness regression. */
class BitKernelsSpec extends SparkSpec {
  import spark.implicits._

  // pre-r16 composed binarySign, kept bit-for-bit
  private def oldBinarySign(df: DataFrame, idCol: String, vecCol: String,
      out: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val powers = array((0 until 32).map(j => lit(1L << j)): _*)
    val nWords = floor((size(v) + 31) / lit(32)).cast("int")
    val packed = transform(sequence(lit(0), nWords - 1), w =>
      aggregate(
        zip_with(slice(v, w * 32 + 1, lit(32)), powers,
          (x, p) => when(x >= 0, p).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseOR(x)))
    val words = when(size(v) > 0, packed)
      .otherwise(array().cast("array<bigint>"))
    df.select(col(idCol), words.as(out))
  }

  private def oldHamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  private def newHamming(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.HammingDistExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(a),
        org.apache.spark.sql.graft.ColumnBridge.toExpr(b)))

  private val tricky: Seq[(Long, Seq[java.lang.Double])] = Seq(
    (1L, null),
    (2L, Seq.empty),
    (3L, Seq[java.lang.Double](0.0)),
    (4L, Seq[java.lang.Double](-0.0)),                      // -0.0 >= 0 sets the bit
    (5L, Seq[java.lang.Double](Double.NaN, 1.0, -1.0)),     // NaN >= 0 is TRUE in Spark (NaN sorts above all) — bit set
    (6L, Seq[java.lang.Double](null, 2.0, null)),           // null elements
    (7L, (0 until 31).map(i => java.lang.Double.valueOf(if (i % 2 == 0) 1.0 else -1.0))),
    (8L, (0 until 32).map(i => java.lang.Double.valueOf(-1.0))),
    (9L, (0 until 33).map(i => java.lang.Double.valueOf(1.0))),  // word spill
    (10L, (0 until 64).map(i => java.lang.Double.valueOf(if (i < 32) 1.0 else -1.0))),
    (11L, (0 until 95).map(i => java.lang.Double.valueOf(math.sin(i.toDouble)))))

  test("signPack == composed binarySign (matrix)") {
    val df = tricky.toDF("id", "v")
    val a = Similarity.binarySign(df, "id", "v", out = "bits")
    val b = oldBinarySign(df, "id", "v", out = "bits_old")
    a.join(b, "id").collect().foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"signPack diverged for id ${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("hamming == composed fold (matrix, incl. mismatched lengths and nulls)") {
    val pairs: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (null, Seq[java.lang.Long](1L)),
      (Seq[java.lang.Long](1L), null),
      (Seq.empty, Seq.empty),
      (Seq[java.lang.Long](0L), Seq[java.lang.Long](-1L)),      // 64 bits
      (Seq[java.lang.Long](5L, 9L), Seq[java.lang.Long](6L, 9L)),
      (Seq[java.lang.Long](5L), Seq[java.lang.Long](5L, 9L)),   // length mismatch
      (Seq[java.lang.Long](null, 3L), Seq[java.lang.Long](1L, 3L)), // null element
      (Seq[java.lang.Long](Long.MinValue), Seq[java.lang.Long](Long.MaxValue)))
    val df = pairs.toDF("a", "b")
    df.select(newHamming(col("a"), col("b")).as("n"),
        oldHamming(col("a"), col("b")).as("o"), col("a"), col("b"))
      .collect().foreach { r =>
        assert(r.get(0) == r.get(1),
          s"hamming diverged for ${r.get(2)} / ${r.get(3)}: ${r.get(0)} vs ${r.get(1)}")
      }
  }

  test("signPack + hammingTopK == composed forms on the sf0.01 embeddings") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val diff = Similarity.binarySign(emb, "vec_id", "embedding")
      .join(oldBinarySign(emb, "vec_id", "embedding", "bits_old"), "vec_id")
      .filter(not(col("bits") <=> col("bits_old")))
      .count()
    assert(diff == 0L, s"$diff corpus rows diverged in signPack")
    // end-to-end: the hamming scan over real packed signatures
    val bits = Similarity.binarySign(emb, "vec_id", "embedding")
    val q = bits.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("bits").as("q_bits"))
    val scan = bits.crossJoin(broadcast(q))
    val hdiff = scan.select(
        newHamming(col("bits"), col("q_bits")).as("n"),
        oldHamming(col("bits"), col("q_bits")).as("o"))
      .filter(not(col("n") <=> col("o"))).count()
    assert(hdiff == 0L, s"$hdiff pair rows diverged in hamming")
  }
}
