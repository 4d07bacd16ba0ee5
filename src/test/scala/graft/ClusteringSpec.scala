package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.pipeline.Clustering

class ClusteringSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("vec", ArrayType(DoubleType))))

  private def mk(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)

  // three tight directional groups on the unit circle-ish plane
  private val corpus = mk(
    0L -> Seq(1.0, 0.05), 1L -> Seq(0.05, 1.0), 2L -> Seq(-1.0, -0.02),
    3L -> Seq(0.9, 0.1), 4L -> Seq(0.11, 0.95), 5L -> Seq(-0.93, -0.11),
    6L -> Seq(0.98, 0.0), 7L -> Seq(0.0, 0.97), 8L -> Seq(-0.99, 0.02))

  test("kmeans assigns by cosine direction and is stable across iterations") {
    val a = Clustering.kmeansAssign(corpus, "id", "vec", k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // seeds are ids 0,1,2 -> clusters 0,1,2; members follow direction
    assert(a(0) == 0 && a(3) == 0 && a(6) == 0)
    assert(a(1) == 1 && a(4) == 1 && a(7) == 1)
    assert(a(2) == 2 && a(5) == 2 && a(8) == 2)
  }

  test("kmeans iterations move centroids: a seed-adjacent point can flip") {
    // seed 1 = (1, 0.8): nearer seed 0 than its eventual group mean
    val drift = mk(
      0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.8),
      2L -> Seq(0.0, 1.0), 3L -> Seq(0.05, 1.0), 4L -> Seq(1.0, 0.05))
    val zero = Clustering.kmeansAssign(drift, "id", "vec", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val two = Clustering.kmeansAssign(drift, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // against raw seeds, the y-heavy points stick to seed 1
    assert(zero(2) == 1 && zero(3) == 1)
    // after updates the centroids separate to the axes; memberships settle
    assert(two(0) == 0 && two(4) == 0 && two(2) == 1 && two(3) == 1)
  }

  test("assignment ties break to the smallest cluster id") {
    // equidistant from both seeds (equal cosine): must land in cluster 0
    val t = mk(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0), 2L -> Seq(0.5, 0.5))
    val a = Clustering.kmeansAssign(t, "id", "vec", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a(2) == 0)
  }

  test("semanticDedup drops the higher id of a near-identical pair, once") {
    val dup = mk(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0),
      2L -> Seq(0.999, 0.001), // ~= id 0 -> dropped
      3L -> Seq(0.0, 0.9))     // same direction as id 1 -> dropped
    val out = Clustering.semanticDedup(dup, "id", "vec", k = 2, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0) && out(1))
    assert(!out(2) && !out(3))
  }

  test("semanticDedup only pairs within a cluster") {
    // ids 0/1 nearly opposite: cos ~ -1, never a pair; both kept
    val c = mk(0L -> Seq(1.0, 0.0), 1L -> Seq(-1.0, 0.01))
    val out = Clustering.semanticDedup(c, "id", "vec", k = 2, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0) && out(1))
  }

  test("quantization: floor(x*1e6+0.5) survives the long round-trip") {
    val q = mk(0L -> Seq(0.1234567891, -0.9999995))
      .select(Clustering.quantize(col("vec")).as("q"))
      .head().getAs[scala.collection.Seq[Long]]("q")
    assert(q == Seq(123457L, -999999L))
  }

  test("ivfPqTopK with nprobe = nlist matches the flat pqTopK scan") {
    import graft.pipeline.Similarity
    val (cells, coarse) = Clustering.kmeansFit(corpus, "id", "vec",
      k = 3, iters = 0)
    val (codes, cb) = Clustering.pqFit(corpus, "id", "vec",
      m = 1, k = 3, iters = 1)
    val q = corpus.filter(col("id") < 2)
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
    val key = (r: Row) => (r.getLong(0), r.getInt(3))
    val flat = Similarity.pqTopK(codes, cb, q, k = 5, idCol = "id")
      .orderBy("q_id", "rank").collect().toSeq
    val ivf = Similarity.ivfPqTopK(codes, cells, coarse, cb, q,
        k = 5, nprobe = 3, idCol = "id")
      .orderBy("q_id", "rank").collect().toSeq
    assert(ivf == flat)
  }

  test("ivfPqTopK nprobe=1 returns only the probed (nearest) cell") {
    import graft.pipeline.Similarity
    val (cells, coarse) = Clustering.kmeansFit(corpus, "id", "vec",
      k = 3, iters = 0)
    val (codes, cb) = Clustering.pqFit(corpus, "id", "vec",
      m = 1, k = 3, iters = 1)
    val q = corpus.filter(col("id") === 0)
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
    val cellOf = cells.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.ivfPqTopK(codes, cells, coarse, cb, q,
        k = 9, nprobe = 1, idCol = "id")
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(out.nonEmpty)
    // query 0 sits in its own cell; every neighbor shares that cell
    assert(out.forall(n => cellOf(n) == cellOf(0L)))
    // and some corpus member outside the cell was pruned
    assert(out.length < cellOf.size - 1)
  }

  test("farthestPointSeeds: Gonzalez traversal picks the angularly " +
      "farthest point each round, ties to smallest id, radius curve " +
      "non-decreasing") {
    // axis-ish geometry in 3d: id0 on x, id2 on y, id3 on z, id1 hugs
    // id0, id4 sits between x and y
    val c = mk3(
      0L -> Seq(1.0, 0.0, 0.0), 1L -> Seq(0.9, 0.1, 0.0),
      2L -> Seq(0.0, 1.0, 0.0), 3L -> Seq(0.0, 0.0, 1.0),
      4L -> Seq(0.7, 0.7, 0.0))
    val out = Clustering.farthestPointSeeds(c, "id", "vec", k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    // start = smallest id; rounds: id2 and id3 are both orthogonal to
    // id0 (max-cos 0) -> tie to id2; then id3 (orthogonal to both);
    // last pick is id4 (cos ~0.707 to x and y beats id1's ~0.994 to id0)
    assert(out.map(_._2).toSeq == Seq(0L, 2L, 3L, 4L), out.toSeq.toString)
    assert(out.head._3.isEmpty, "the start has no coverage cosine")
    val curve = out.tail.map(_._3.get).toSeq
    assert(curve == curve.sorted,
      s"coverage cosine must be non-decreasing: $curve")
    assert(curve.head == 0L && curve.last > 700000L && curve.last < 710000L)
  }

  private def mk3(rows: (Long, Seq[Double])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      StructType(Seq(StructField("id", LongType),
        StructField("vec", ArrayType(DoubleType)))))

  test("covariance: exact population moments on a hand-checked frame") {
    import graft.pipeline.Quantization
    // cols x={1,3}, y={2,6}: var(x)=1, var(y)=4, cov=2 (population)
    val c = mk(0L -> Seq(1.0, 2.0), 1L -> Seq(3.0, 6.0))
    val got = Quantization.covariance(c, "vec")
      .orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, 1, 1.0), (1, 2, 2.0), (2, 2, 4.0)))
  }
}
