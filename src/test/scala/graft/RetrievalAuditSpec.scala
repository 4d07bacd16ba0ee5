package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Clustering, DocDedup, Quantization, Ranking}

/** Multi-query retrieval, sketch-accuracy and embedding-audit operators
  * (round 10): bm25MultiQuery, minHashEstimateAudit, labelCentroidCosines,
  * pearsonExact. */
class RetrievalAuditSpec extends SparkSpec {
  import spark.implicits._

  test("bm25MultiQuery equals per-query bm25, incl. duplicate query terms") {
    val docs = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma gamma gamma gamma"),
      (3L, "delta delta beta")).toDF("doc_id", "text")
    val queries = Seq(
      "qa" -> Seq("alpha", "beta"),
      "qb" -> Seq("delta"),
      "qc" -> Seq("beta", "beta")) // duplicate terms must not double-count
    val multi = Ranking.bm25MultiQuery(docs, "doc_id", "text", queries)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((q, ts) <- queries) {
      val single = Ranking.bm25(docs, "doc_id", "text", ts.distinct)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val got = multi.collect { case ((`q`, id), s) => id -> s }.toMap
      assert(got == single, s"query $q: multi=$got single=$single")
    }
    // a doc matching no term of a query is absent for THAT query only
    assert(!multi.contains(("qb", 1L)) && multi.contains(("qa", 1L)))
  }

  test("minHashEstimateAudit: exact dups estimate 1.0; estimate replays " +
      "the signature agreement; disjoint docs absent") {
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // exact duplicate of 1
      (3L, base + " t0 t1 t2"), // near-dup of 1/2
      (4L, (0 until 30).map(i => s"z$i").mkString(" "))) // disjoint
      .toDF("doc_id", "text")
    val p = DocDedup.MinHashParams(numPerms = 32, bands = 16)
    val out = DocDedup
      .minHashEstimateAudit(docs, "doc_id", "text", n = 3, threshold = 0.5, p)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.contains((1L, 2L)))
    val (est12, jac12, err12) = out((1L, 2L))
    assert(est12 == 1.0 && jac12 == 1.0 && err12 == 0.0)
    assert(!out.keys.exists { case (a, b) => a == 4L || b == 4L })
    // independent replay: estimate == fraction of agreeing signature mins
    val sigs = DocDedup.signatures(docs, "doc_id", "text", 3, p)
      .collect().map(r => r.getLong(0) ->
        (0 until p.numPerms).map(i => r.getLong(i + 1))).toMap
    for (((a, b), (est, jac, err)) <- out) {
      val agree = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }
      assert(est == agree.toDouble / p.numPerms, s"pair ($a,$b)")
      assert(err == math.abs(est - jac))
    }
  }

  test("lshSCurveAudit: theory replays the squaring chain, exact dups " +
      "collide with p=1, power-of-two bands enforced") {
    val base = (0 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),          // exact dups: j = 1
      (3L, base + " t0 t1 t2 t3 t4"))  // near-dup: j < 1
      .toDF("doc_id", "text")
    val p = DocDedup.MinHashParams(numPerms = 32, bands = 16)
    val out = DocDedup
      .lshSCurveAudit(docs, "doc_id", "text", n = 3, threshold = 0.5, p)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    val (j12, p12, c12) = out((1L, 2L))
    assert(j12 == 1.0 && p12 == 1.0 && c12)
    // replay the exact squaring chain for a j < 1 pair
    for (((_, _), (j, tp, _)) <- out if j < 1.0) {
      var x = 1.0 - j * j
      for (_ <- 1 to 4) x = x * x
      assert(tp == 1.0 - x)
    }
    intercept[IllegalArgumentException] {
      DocDedup.lshSCurveAudit(docs, "doc_id", "text", 3, 0.5,
        DocDedup.MinHashParams(numPerms = 30, bands = 15))
    }
  }

  test("labelCentroidCosines: exact hand-checked cosines, counts, and " +
      "zero-sum label exclusion") {
    val df = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(0.0f, 2.0f)),
      (2, Seq(3.0f, 3.0f)),
      (3, Seq(0.0f, 0.0f))) // zero vector: no direction, excluded
      .toDF("label", "embedding")
    val out = Clustering.labelCentroidCosines(df, "label", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val sq2 = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((0, 1)) == ((2L, 1L, 0.0)))
    assert(out((0, 2)) == ((2L, 1L, sq2)))
    assert(out((1, 2)) == ((1L, 1L, sq2)))
    assert(!out.keys.exists { case (a, b) => a == 3 || b == 3 })
    assert(out.size == 3)
  }

  test("ivfTopKIndexed over a parquet round-tripped ivfIndex equals the " +
      "one-shot ivfTopK") {
    import graft.pipeline.Similarity
    import graft.functions.{VectorFunctions => VF}
    val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))
      .withColumn("embedding", VF.microVec(col("embedding")))
    val cents = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.ivfIndex(emb, cents, microRank = true)
      .write.mode("overwrite").parquet(dir)
    val fromDisk = Similarity.ivfTopKIndexed(spark.read.parquet(dir), cents,
        q, k = 5, nprobe = 3, microRank = true)
      .orderBy("q_id", "rank").collect().toSeq
    val oneShot = Similarity.ivfTopK(emb, cents, q, k = 5, nprobe = 3,
        microRank = true)
      .orderBy("q_id", "rank").collect().toSeq
    assert(fromDisk == oneShot && fromDisk.nonEmpty)
  }

  test("misraGries: exact when capacity covers the vocabulary, classic " +
      "decrement below it, and the undercount guarantee holds") {
    import graft.functions.HeavyHitters
    val mg = new HeavyHitters.MisraGries(2)
    // single ordered stream, k=2: "a a b c" -> c triggers the decrement
    val s = Seq("a", "a", "b", "c").foldLeft(mg.zero)(mg.reduce)
    assert(s == Map("a" -> 1L))
    // merge tie wipe-out is legal MG: every estimate may undercount by
    // at most N/(k+1)
    assert(mg.merge(Map("a" -> 5L, "b" -> 5L), Map("c" -> 5L)) == Map.empty)

    // distributed exact regime: capacity >= distinct keys -> plain counts
    val toks = (0 until 400).map(i => s"t${i % 7}")
    val df = toks.toDF("tok").repartition(8)
    val got = df.agg(HeavyHitters.misraGries(16)(col("tok")).as("hh"))
      .select(explode(col("hh"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exact)

    // guarantee below capacity: est <= true, true - est <= N/(k+1), and
    // every item with freq > N/(k+1) survives
    val skew = (0 until 300).map(_ => "hot") ++ (0 until 100).map(i => s"c$i")
    val k = 5
    val res = skew.toDF("tok").repartition(4)
      .agg(HeavyHitters.misraGries(k)(col("tok")).as("hh"))
      .select(explode(col("hh"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = skew.size
    val trueCounts = skew.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(res.size <= k)
    for ((t, est) <- res) {
      assert(est <= trueCounts(t))
      assert(trueCounts(t) - est <= n / (k + 1))
    }
    assert(res.contains("hot"), s"freq 300 > ${n / (k + 1)} must survive")
  }

  test("rrfFuse: hand-checked reciprocal-rank sums, both-list items " +
      "outrank single-list items, ties break by id") {
    import graft.pipeline.Similarity
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("q_id", "doc_id", "rank")
    val sem = Seq((0L, 11L, 1), (0L, 12L, 2)).toDF("q_id", "doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(lex, sem), "q_id", "doc_id", "rank",
        k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    // micro contributions: rank 1 -> floor(1e6/61 + .5) = 16393,
    // rank 2 -> floor(1e6/62 + .5) = 16129
    assert(out == Seq(
      (11L, (16393L + 16129L) / 1e6, 1), // in both lists
      (10L, 16393L / 1e6, 2),            // rank-1 in one list
      (12L, 16129L / 1e6, 3)))
  }

  test("pearsonExact: perfect +/- correlation and a hand-computed case") {
    def r(rows: Seq[(Long, Long)]): Double =
      Quantization.pearsonExact(rows.toDF("x", "y"), "x", "y")
        .collect().head.getDouble(1)
    assert(r(Seq((1L, 2L), (2L, 4L), (3L, 6L))) == 1.0)
    assert(r(Seq((1L, 5L), (2L, 3L), (3L, 1L))) == -1.0)
    // x=(1,2,3), y=(1,3,2): n*sxy - sx*sy = 3*13 - 6*6 = 3;
    // both variance terms are 3*14 - 36 = 6 -> r = 3/6 = 0.5
    assert(r(Seq((1L, 1L), (2L, 3L), (3L, 2L))) == 0.5)
  }
}
