package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/** Scalar int8 quantization of embedding columns — the standard 4×
  * memory/IO reduction before ANN indexing or training export (a 100 TB
  * float corpus becomes 25 TB of codes plus a dim-sized codebook).
  *
  * Per-dimension min/max codebook, `code = floor((x-mn)·255/(mx-mn)+0.5)`
  * clamped to [0, 255]; degenerate dimensions (mx == mn) code to 0.
  * `floor(v + 0.5)` is spelled out (not `round`) so every engine applies
  * the same half-up rule to the same IEEE doubles — inputs are exact
  * f32→f64 casts and the affine transform is evaluated in the same
  * operation order everywhere, so codes are bit-reproducible.
  *
  * Scale shape: the stats pass is a posexplode + groupBy(dim) that
  * REDUCES to a dim-sized frame (64–4096 rows — driver metadata, same
  * posture as k-means centroids at `Clustering.kmeansAssign`); the
  * codebook returns to executors as two broadcast array literals, and
  * encoding is a zero-shuffle per-row `transform`. No (vec × dim) row
  * explosion ever shuffles.
  */
object Quantization {

  /** Per-dimension (min, max) over the corpus: `dim` is 0-based. */
  def int8Stats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(VF.asDouble(col(vecCol))).as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))

  /** Encode every vector against the corpus codebook. Output keeps the
    * id column and adds `codes: array<int>` (one int8 code per dim). */
  def quantizeInt8(spark: SparkSession, emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val stats = int8Stats(emb, vecCol).orderBy("dim").collect()
    val mns = stats.map(_.getAs[Double]("mn"))
    val mxs = stats.map(_.getAs[Double]("mx"))
    val mnArr = array(mns.map(lit): _*)
    val mxArr = array(mxs.map(lit): _*)
    emb.select(col(idCol),
      zip_with(VF.asDouble(col(vecCol)),
        zip_with(mnArr, mxArr, (a, b) => struct(a.as("mn"), b.as("mx"))),
        (x, s) => {
          val mn = s.getField("mn"); val mx = s.getField("mx")
          when(mx === mn, lit(0)).otherwise(
            greatest(lit(0), least(lit(255),
              floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("int"))))
        }).as("codes"))
  }
}
