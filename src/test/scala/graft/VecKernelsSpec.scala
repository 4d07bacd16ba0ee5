package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Equivalence pins for the r15 native vector/simhash kernels
  * ([[graft.functions.VecKernels]]) against the composed
  * higher-order-function forms they replaced (reconstructed verbatim from
  * the r14 file history). The ANN/clustering oracles hash results, so the
  * sequential fold order, null conventions (null array / null element /
  * length mismatch → null) and NaN propagation must all match exactly.
  */
class VecKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def oldDot(a: Column, b: Column): Column =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def oldL2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
  private def oldMicroVec(v: Column): Column =
    transform(v.cast("array<double>"),
      x => floor(x * lit(1e6) + lit(0.5)).cast("double"))
  private def oldQuantize(v: Column): Column =
    transform(v.cast("array<double>"),
      x => floor(x * lit(1e6) + lit(0.5)).cast("long"))
  private def oldSimHash(text: Column, bits: Int = 60): Column = {
    val masks = lit((0 until bits).map(b => 1L << b).toArray)
    val hs = transform(array_distinct(TextFunctions.tokens(text)),
      t => TextFunctions.hash60(t))
    val bitSums = aggregate(hs, lit(Array.fill(bits)(0L)), (acc, h) =>
      zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, masks, (s, m) => when(s > 0L, m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  private val vecs: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, -0.2, 0.3333333), Seq(-1e10, 2e-10, 0.5000005)),
    (Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)),          // null element
    (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),                // length mismatch
    (Seq(), Seq()),                                     // empty → 0.0
    (Seq(Double.NaN, 1.0), Seq(1.0, 1.0)),              // NaN propagates
    (Seq(Double.PositiveInfinity), Seq(0.0)),           // Inf · 0 = NaN
    (Seq(1e308, 1e308), Seq(1e308, -1e308)),            // overflow to ±Inf
    (null, Seq(1.0)),                                   // null array
    (Seq(0.4999999999999999, 0.5, -0.5), Seq(1.5e-7, -1.5e-7, 2.5e-7)))

  test("native dot / l2 / quantize == composed forms") {
    val df = vecs.toDF("a", "b")
    df.select(
      VectorFunctions.dot(col("a"), col("b")).as("nd"),
      oldDot(col("a"), col("b")).as("od"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("nl"),
      oldL2(col("a"), col("b")).as("ol"),
      VectorFunctions.microVec(col("a")).as("nm"),
      oldMicroVec(col("a")).as("om"),
      graft.pipeline.Clustering.quantize(col("a")).as("nq"),
      oldQuantize(col("a")).as("oq"))
      .collect().zipWithIndex.foreach { case (r, i) =>
        def bits(x: Any): Any = x match {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case other => other
        }
        assert(bits(r.get(0)) == bits(r.get(1)), s"dot diverged at row $i: ${r.get(0)} vs ${r.get(1)}")
        assert(bits(r.get(2)) == bits(r.get(3)), s"l2 diverged at row $i")
        assert(r.getSeq[Double](4) == r.getSeq[Double](5), s"microVec diverged at row $i")
        assert(r.getSeq[Long](6) == r.getSeq[Long](7), s"quantize diverged at row $i")
      }
  }

  test("native kernels == composed forms on the sf0.01 embeddings corpus") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val probe = emb.select(col("embedding").as("b")).limit(1)
    val diff = emb.crossJoin(probe)
      .select(
        VectorFunctions.dot(col("embedding"), col("b")).as("nd"),
        oldDot(col("embedding"), col("b")).as("od"),
        VectorFunctions.microVec(col("embedding")).as("nm"),
        oldMicroVec(col("embedding")).as("om"))
      .filter(col("nd") =!= col("od") || col("nm") =!= col("om"))
      .count()
    assert(diff == 0L)
  }

  test("native simhash == composed form on tricky strings and the corpus") {
    val tricky = Seq(null, "", " ", "one", "One two THREE two one",
      "a  b\tc\nd", "ÅNGSTRÖM Straße İstanbul", "dup dup dup",
      "emoji 🦀 mixed").toDF("text")
    val t = tricky.select(
      graft.pipeline.DocDedup.simHash(col("text")).as("n"),
      oldSimHash(col("text")).as("o"), col("text"))
    t.collect().foreach { r =>
      assert(r.get(0) == r.get(1), s"simhash diverged for ${Option(r.get(2))}")
    }
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val diff = docs.select(
      graft.pipeline.DocDedup.simHash(col("text")).as("n"),
      oldSimHash(col("text")).as("o"))
      .filter(col("n") =!= col("o")).count()
    assert(diff == 0L)
  }
}
