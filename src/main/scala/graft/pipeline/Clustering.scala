package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dot

/** Embedding-space clustering for training-data curation: spherical
  * k-means (Lloyd iterations with cosine affinity) and SemDeDup-style
  * semantic deduplication (cluster, then drop near-identical members
  * within each cluster — Abbas et al. 2023, arXiv:2303.09540).
  *
  * Distributed shape: centroids are metadata (k x dim doubles, kilobytes)
  * and live on the driver between iterations — they ride into each job as
  * broadcast literal arrays. Corpus vectors NEVER shuffle for assignment
  * (a per-row argmax over k affinity expressions); the centroid update is
  * one `posexplode` + partial aggregation per iteration, shipping only
  * k x dim partial sums per map task. That is the canonical Lloyd layout
  * at 100 TB: O(iters) scans, zero corpus shuffles, driver state O(k·dim).
  *
  * Cross-engine determinism (the oracle recomputes every step in DuckDB):
  * float inputs are QUANTIZED to integers (`floor(x·1e6 + 0.5)`), and —
  * crucially — CENTROIDS ARE INTEGER-MICRO TOO (each updated component is
  * `floor(sum/count + 0.5)`, a long). Every dot product and squared norm
  * in an assignment is therefore a sum of exact integers (|q·cq| ≤ 1e12
  * per term, ≤ ~1e14 per vector — far under 2^53), which is identical
  * under ANY accumulation order — sequential fold, pairwise, SIMD — so no
  * step depends on an implementation-defined reduction (DuckDB's
  * `list_dot_product` accumulator width, the r10 hazard). The affinity a
  * vector is ranked on is the micro-quantized cosine
  * `floor(dotI/(sqrt(dotI_aa)·sqrt(dotI_bb))·1e6 + 0.5)` — single
  * correctly-rounded IEEE ops over identical integer operands, bit-equal
  * on every engine; ties take the smaller cluster id. `floor(x·1e6+0.5)`
  * is used instead of `round` because the engines disagree on half-way
  * rounding modes, while the double arithmetic feeding `floor` is
  * bit-identical.
  */
object Clustering {

  private val Scale = 1e6

  /** Quantized integer vector: `floor(x·1e6 + 0.5)` per component.
    * Native codegen kernel (r15) — see [[graft.functions.QuantizeExpr]];
    * identical values to the transform(...) form it replaced. */
  def quantize(vec: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.QuantizeExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(
          vec.cast("array<double>")), asLong = true))

  /** (id, __q long vector, __e = __q as exact doubles, __n = micro-norm
    * `sqrt(Σ q²)`). `__e` carries the INTEGER micro values (not /1e6):
    * every downstream dot over it is an exact order-free integer sum, and
    * cosine is scale-invariant so affinities are unchanged. */
  private def prepared(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    // __e via the native double-quantize kernel rather than an interpreted
    // transform over __q — identical values (floor output < 2^53 is exact
    // in double), one codegen pass each
    df.select(col(idCol), quantize(col(vecCol)).as("__q"),
        graft.functions.VectorFunctions.microVec(col(vecCol)).as("__e"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))

  /** Argmax-affinity assignment against driver-held INTEGER-MICRO
    * centroids: a struct max over k unrolled codegen'd expressions — no
    * explode, no shuffle. The ranked affinity is the micro-quantized
    * cosine (exact integer dot, two sqrt, one divide, one floor — the
    * `dCosMicroI` oracle spelling), so the argmax is engine-proof by
    * construction. Ties take the smallest cluster id (the `-cid` struct
    * field). Centroid norms are pre-folded on the driver — an exact
    * integer sum, so the fold order is immaterial. */
  private def assignOnce(x: DataFrame, idCol: String,
      cents: Seq[(Int, Seq[Long])]): DataFrame = {
    val affs = cents.map { case (cid, cq) =>
      val cn = math.sqrt(cq.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
      val aff = floor(dot(col("__e"), array(cq.map(v => lit(v.toDouble)): _*))
        / (col("__n") * lit(cn)) * lit(Scale) + lit(0.5)).cast("long")
      struct(aff.as("aff"), lit(-cid).as("nc"))
    }
    x.withColumn("__m", greatest(affs: _*))
      .withColumn("cluster", (-col("__m.nc")).cast("int"))
      .drop("__m")
  }

  /** One Lloyd update: exact integer sums per (cluster, dimension) —
    * `posexplode` + map-side-combining aggregation, k·dim result rows —
    * then each centroid component RE-QUANTIZED to integer micro-units as
    * `floor(sum/count + 0.5)` (the identical double division + floor the
    * oracle performs), so the next assignment round stays all-integer. */
  private def updateCentroids(assigned: DataFrame): Seq[(Int, Seq[Long])] = {
    val rows = assigned
      .select(col("cluster"), posexplode(col("__q")).as(Seq("d", "qd")))
      .groupBy("cluster", "d")
      .agg(sum("qd").as("s"), count(lit(1)).as("n"))
      .collect() // k x dim rows: cluster metadata, not data
    rows.groupBy(_.getAs[Int]("cluster")).toSeq.sortBy(_._1)
      .map { case (cid, rs) =>
        // an emptied cluster simply has no rows here and drops out of the
        // candidate set, exactly as a GROUP BY over members would
        cid -> rs.sortBy(_.getAs[Int]("d"))
          .map(r => math.floor(
            r.getAs[Long]("s").toDouble / r.getAs[Long]("n").toDouble + 0.5)
            .toLong)
          .toSeq
      }
  }

  /** Initial centroids: the k members with the smallest ids, quantized to
    * integer micro-units — deterministic (no RNG), reproducible by any
    * engine. */
  private def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Seq[Long])] =
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .orderBy(col(idCol)).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getAs[scala.collection.Seq[Double]]("__v")
          .iterator.map(x => math.floor(x * Scale + 0.5).toLong).toSeq
      }
      .toSeq

  /** Spherical k-means assignments after `iters` Lloyd iterations.
    * Returns (idCol, cluster). `iters = 0` assigns against the seed
    * centroids only. Requires nonzero-norm vectors (a zero-norm vector
    * has no direction — filter upstream). */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansFit(df, idCol, vecCol, k, iters)._1

  /** [[kmeansAssign]] plus the FITTED centroids — the model artifact an
    * ANN index needs at query time (the assignments alone suffice for
    * clustering queries). Centroids are k·dim driver metadata, in
    * INTEGER MICRO-UNITS (divide by 1e6 for the real-valued centroid —
    * consumers ranking by cosine never need to, since cosine is
    * scale-invariant and the integer form keeps their dots exact). */
  def kmeansFit(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): (DataFrame, Seq[(Int, Seq[Long])]) =
    kmeansFitSeeded(df, idCol, vecCol,
      seedCentroids(df, idCol, vecCol, k), iters)

  /** [[kmeansFit]] with caller-supplied integer-micro seed centroids —
    * the hook for better-than-lowest-ids seeding (e.g.
    * [[farthestPointSeeds]], whose spread seeds avoid the all-in-one-
    * cluster start a clustered corpus gives the default seeding). */
  def kmeansFitSeeded(df: DataFrame, idCol: String, vecCol: String,
      seeds: Seq[(Int, Seq[Long])], iters: Int)
      : (DataFrame, Seq[(Int, Seq[Long])]) = {
    // r16: with iters >= 1 the prepared frame is read by the per-iter
    // centroid-update collect AND the final assignment's consumers —
    // separate actions that each re-executed the scan/spread/quantize
    // pipeline; checkpoint once (r15 declined this for the solo
    // one-consumer case; with >= 2 actions it measured a win). iters=0
    // keeps the plain pipeline: one consumer, the checkpoint job would
    // cost more than the single re-scan it saves (the r15 measurement).
    val x0 = prepared(df, idCol, vecCol)
    val x = if (iters >= 1) x0.localCheckpoint() else x0
    var cents = seeds
    var assigned = assignOnce(x, idCol, cents)
    for (_ <- 0 until iters) {
      cents = updateCentroids(assigned)
      assigned = assignOnce(x, idCol, cents)
    }
    (assigned.select(col(idCol), col("cluster")), cents)
  }

  /** Gonzalez farthest-point traversal (the classic 2-approximation for
    * k-center, and the deterministic alternative to k-means++ seeding):
    * start at the smallest id, then k−1 times pick the vector whose
    * MAXIMUM cosine to any already-chosen seed is MINIMUM — the point
    * farthest from the chosen set in angular distance, ties to the
    * smallest id. Better-spread seeds than lowest-k-ids when the corpus
    * is clustered (lowest ids can all land in one cluster).
    *
    * Determinism: the ranked value is the micro-quantized cosine over
    * integer-micro vectors (the [[assignOnce]] / `dCosMicroI` spelling),
    * so every round's argmin is engine-proof; no RNG anywhere.
    * Scale shape: k−1 rounds, each ONE corpus scan with the chosen seeds
    * inlined as broadcast literal expressions and a single
    * min(struct(aff, id)) partial aggregate — zero corpus shuffles,
    * driver state = k·dim longs (the kmeansFit cost model with an argmin
    * in place of the centroid update). Returns (rank, idCol,
    * max_cos_micro) — max_cos_micro is NULL for the rank-1 start and the
    * chosen point's coverage cosine afterwards (monotonically
    * non-decreasing: the k-center radius curve).
    * Requires nonzero-norm vectors, like every cosine path here. */
  def farthestPointSeeds(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    // r16: the Gonzalez traversal runs k driver-barrier rounds, each a
    // separate ACTION that re-executed the scan/spread/quantize pipeline;
    // checkpoint the prepared frame once when more than one round will
    // read it (intra-query intermediate; executor-loss trade-off: see
    // DocDedup.ngramJaccardPairs)
    val x0 = prepared(df, idCol, vecCol)
    val x = if (k > 1) x0.localCheckpoint() else x0
    // the chosen point's VECTOR rides the argmin struct (r15): the struct
    // min is decided entirely by (mx, id) — ids are unique, so the
    // trailing __q field never participates in an ordering decision and
    // the selected row is unchanged — and carrying it out of the same
    // aggregate removes the separate filter(id)+head() corpus scan each
    // round previously paid to fetch the winner's vector (2 jobs/round →
    // 1 job/round, at any scale).
    def decode(row: Row): (Long, Long, Seq[Long]) =
      (row.getLong(0), row.getLong(1),
        row.getAs[scala.collection.Seq[Long]](2).toSeq)
    // isNotNull first (r16 advice): the struct-min sorts null ids FIRST
    // (unlike the pre-r15 agg(min(idCol)), which ignored nulls), so
    // without the filter a corpus containing null ids would either pick
    // a null-id seed or trip the emptiness require below. No-op for the
    // non-null vec_id corpora this engine ships.
    val firstRow = x
      .filter(col(idCol).isNotNull)
      .select(struct(col(idCol).as("id"), col("__q")).as("s"))
      .agg(min(col("s")).as("m"))
      .select(col("m.id"), col("m.id"), col("m.__q")).head()
    require(!firstRow.isNullAt(0),
      s"farthestPointSeeds: empty corpus (no non-null '$idCol' rows) — cannot seed k=$k")
    val (firstId, _, firstVec) = decode(firstRow)
    var chosen: Seq[(Long, Seq[Long])] = Seq(firstId -> firstVec)
    var out: Seq[(Int, Long, Option[Long])] = Seq((1, firstId, None))
    for (r <- 2 to k) {
      val affs = chosen.map { case (_, cq) =>
        val cn = math.sqrt(cq.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))
        floor(dot(col("__e"), array(cq.map(v => lit(v.toDouble)): _*))
          / (col("__n") * lit(cn)) * lit(Scale) + lit(0.5)).cast("long")
      }
      val maxAff = if (affs.size == 1) affs.head else greatest(affs: _*)
      val pickRow = x.filter(!col(idCol).isin(chosen.map(_._1): _*))
        .select(struct(maxAff.as("mx"), col(idCol).as("id"), col("__q")).as("s"))
        .agg(min(col("s")).as("m"))
        .select(col("m.id"), col("m.mx"), col("m.__q")).head()
      require(!pickRow.isNullAt(0),
        s"farthestPointSeeds: k=$k exceeds corpus size ${chosen.size} — " +
          "candidate set exhausted at rank " + r)
      val (pid, pmx, pvec) = decode(pickRow)
      chosen = chosen :+ (pid -> pvec)
      out = out :+ ((r, pid, Some(pmx)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.map { case (r, id, mx) =>
        Row(r, id, mx.map(Long.box).orNull) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("max_cos_micro",
          org.apache.spark.sql.types.LongType, nullable = true))))
  }

  /** Product quantization (Jégou et al. 2011): split each vector into
    * `m` contiguous subspaces and k-means each subspace independently;
    * a vector's code is its m per-subspace centroid ids — `m·log2(k)`
    * bits instead of `dim·32`, the codebook layout behind IVF-PQ ANN
    * indexes. Returns (idCol, code_0 … code_{m-1}).
    *
    * Each subspace runs the same deterministic spherical k-means as
    * [[kmeansAssign]] (seeded by the k lowest ids, integer-quantized
    * sums), so codes are engine-reproducible. Scale shape: m independent
    * Lloyd runs, each zero-corpus-shuffle (centroids are driver
    * metadata); the final assembly joins m skinny (id, int) frames on the
    * id — m is small (4–16) by construction. The one-row `first()` probe
    * only reads the vector WIDTH (a schema-level fact not present in the
    * array type), not data. */
  def productQuantize(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 1): DataFrame =
    pqFit(df, idCol, vecCol, m, k, iters)._1

  /** [[productQuantize]] plus the per-subspace codebooks
    * `(subspace j, code c, centroid)` — what an ADC scorer
    * ([[Similarity.pqTopK]]) builds its distance tables from.
    * Codebooks are m·k·(dim/m) = k·dim driver metadata, in integer
    * micro-units like [[kmeansFit]]'s centroids. */
  def pqFit(df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 1)
      : (DataFrame, Seq[(Int, Int, Seq[Long])]) = {
    // r16: materialize the vector frame ONCE per fit. The m subspace
    // fits each run seed-collect + per-iter update-collect + final
    // assignment actions, and every ACTION re-executed the upstream
    // scan/spread/cast (profiled at sf0.1: the embeddings exchange ran
    // 8+ times per pqFit query). One eager checkpoint turns ~3·m scans
    // into one; the frame is the fit's own input, an intra-query
    // intermediate recomputed from parquet on every invocation.
    // localCheckpoint executor-loss trade-off: see
    // DocDedup.ngramJaccardPairs (r16).
    val v = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint()
    val dim = v.select(size(col("__v"))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // the m subspace fits are independent, but each Lloyd iteration has
    // two DRIVER BARRIERS (seed + centroid-update collects); run them as
    // concurrent Spark jobs so the barriers overlap instead of chaining
    // m·iters round-trips — results are identical (Future.sequence keeps
    // subspace order; each fit is deterministic on its own)
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration.DurationInt
    implicit val ec: ExecutionContext = ExecutionContext.global
    // blocking{} keeps the CPU-sized global pool from starving while m
    // threads wait on Spark barriers; the deadline is a generous backstop
    // so a wedged job surfaces as an error instead of a silent hang
    val fits = Await.result(Future.sequence((0 until m).map { j =>
      Future {
        blocking {
          val (assigned, cents) = kmeansFit(v.select(col(idCol),
              slice(col("__v"), j * sub + 1, sub).as("__s")),
            idCol, "__s", k, iters)
          (assigned.withColumnRenamed("cluster", s"code_$j"),
            cents.map { case (c, ce) => (j, c, ce) })
        }
      }
    }), 4.hours)
    (fits.map(_._1).reduce(_.join(_, Seq(idCol))), fits.flatMap(_._2))
  }

  /** SemDeDup: cluster the corpus, then within each cluster drop every
    * member that has a LOWER-id member with cosine >= `threshold` (the
    * greedy keep-first rule every dedup family member here uses). Returns
    * (idCol, cluster, kept).
    *
    * The quadratic pair expansion is bounded per cluster — k is the knob:
    * size it so corpus/k members fit a task (SemDeDup's own regime is
    * k ~ sqrt(n) on web-scale corpora). One shuffle on the cluster key
    * for the self-join; vectors and norms computed once below it. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double, iters: Int = 0): DataFrame = {
    val x = prepared(df, idCol, vecCol)
    // zero-norm vectors (incl. vectors whose every component quantizes
    // to zero) have no direction: they cannot seed, join, or match a
    // cluster — under Spark 4's default ANSI mode their affinity
    // division would kill the whole job with DIVIDE_BY_ZERO. They sit
    // out the clustering under cluster -1 and are always kept (nothing
    // is cosine-near a directionless vector).
    val live = x.filter(col("__n") =!= 0.0)
    val liveDf = df.join(live.select(col(idCol)), Seq(idCol), "left_semi")
    var cents = seedCentroids(liveDf, idCol, vecCol, k)
    for (_ <- 0 until iters) {
      cents = updateCentroids(assignOnce(live, idCol, cents))
    }
    val assigned = assignOnce(live, idCol, cents)
    val slim = assigned.select(col(idCol), col("cluster"), col("__e"), col("__n"))
    // micro-quantized membership over EXACT integer dots: __e carries
    // integer micro values, so dot/(n·n) is single IEEE ops over
    // identical operands on any engine and the quantized `cos >= t`
    // verdict cannot sit on a 1-ulp cross-engine knife edge — and the
    // cluster ASSIGNMENT feeding it is the same all-integer discipline
    // (see [[assignOnce]]), so no step here is implementation-defined.
    val dropped = slim.as("a").join(slim.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(Similarity.micro(
        dot(col("a.__e"), col("b.__e")) / (col("a.__n") * col("b.__n"))) >=
        math.rint(threshold * 1e6))
      .select(col(s"b.$idCol").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    val zeroNorm = x.filter(col("__n") === 0.0)
      .select(col(idCol), lit(-1).cast("int").as("cluster"),
        lit(true).as("kept"))
    assigned.join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(!col("__dropped"), lit(true)).as("kept"))
      .unionByName(zeroNorm)
  }

  /** Label-centroid separability matrix: the pairwise cosine between the
    * per-label mean embeddings — the first audit run on a labeled
    * embedding corpus (near-1 off-diagonal cosines mean the labels are
    * not linearly separable and a probe/classifier trained on them will
    * confuse those classes). Returns the strict upper triangle
    * (label_a < label_b, cos) plus each label's member count.
    *
    * Exactness: cosine is scale-invariant, so it is computed over the
    * per-label per-dimension SUMS of the micro-quantized coordinates —
    * never the means — and those sums are exact order-free integer
    * aggregates (decimal(38,0), so a 100 TB label's sum cannot silently
    * overflow a long). cos(sum_a, sum_b) == cos(mean_a, mean_b) exactly,
    * and the final value is one IEEE divide of identical operands on any
    * engine.
    *
    * Scale shape: one posexplode + groupBy(label, dim) REDUCES the corpus
    * to an (L·dim)-row frame (metadata-sized for any real label count);
    * the pairwise stage only ever sees that frame. Zero-sum labels (all
    * members quantize to the zero vector) have no direction and are
    * excluded from the pair output rather than dividing by zero. */
  def labelCentroidCosines(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val q = df.select(col(labelCol).as("__lbl"),
      quantize(col(vecCol)).as("__q"))
    // member counts ride the SAME (label, dim) aggregate (count per dim,
    // then max over the metadata-sized frame) — a separate
    // q.groupBy(label).count() would rescan the whole corpus. The
    // aggregate output is L·dim rows (metadata-sized), and it is
    // referenced FIVE times downstream (pair sides, norms, counts):
    // an eager localCheckpoint materializes it once so the corpus scan
    // runs exactly once instead of once per reference (the MMR /
    // connectedComponents discipline for driver-sized frames)
    val sums = q
      .select(col("__lbl"), posexplode(col("__q")).as(Seq("__d", "__x")))
      .groupBy(col("__lbl"), col("__d"))
      .agg(sum(col("__x").cast("decimal(38,0)")).as("__s"),
        count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val counts = sums.groupBy(col("__lbl")).agg(max(col("__cnt")).as("__n"))
    val norms = sums.groupBy(col("__lbl"))
      .agg(sum(col("__s") * col("__s")).as("__nsq"))
    val slim = sums.select(col("__lbl"), col("__d"), col("__s"))
    val a = slim.toDF("__la", "__d", "__sa")
    val b = slim.toDF("__lb", "__d", "__sb")
    a.join(b, Seq("__d")).filter(col("__la") < col("__lb"))
      .groupBy(col("__la"), col("__lb"))
      .agg(sum(col("__sa") * col("__sb")).as("__dot"))
      .join(norms.select(col("__lbl").as("__la"), col("__nsq").as("__na")), "__la")
      .join(norms.select(col("__lbl").as("__lb"), col("__nsq").as("__nb")), "__lb")
      .filter(col("__na") =!= 0 && col("__nb") =!= 0)
      .join(counts.select(col("__lbl").as("__la"), col("__n").as("n_a")), "__la")
      .join(counts.select(col("__lbl").as("__lb"), col("__n").as("n_b")), "__lb")
      .select(col("__la").as("label_a"), col("__lb").as("label_b"),
        col("n_a"), col("n_b"),
        round(col("__dot").cast("double") /
          (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))),
          6).as("cos"))
  }
}
