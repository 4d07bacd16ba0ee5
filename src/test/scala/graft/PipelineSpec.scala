package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.pipeline.{DocDedup, Multimodal, Sampling, Similarity}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = graft.sources.Tables.documents(spark, sf("sf0.001"))
  lazy val emb = graft.sources.Tables.embeddings(spark, sf("sf0.001"))

  test("binarySign + hammingTopK: 32-per-word packing, short final word, " +
      "exact integer distances") {
    // dim 3: bits set where x >= 0 (positions 0 and 2) -> word 0b101 = 5
    val tiny = Seq((1L, Seq(1.0f, -2.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.binarySign(tiny, "vec_id", "embedding")
      .select($"bits").as[Seq[Long]].head() == Seq(5L))
    // dim 40 -> two words; dims 32..39 land in word 1 bits 0..7
    val wide = Seq((1L, (0 until 40).map(i =>
      if (i == 35 || i < 2) 1.0f else -1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.binarySign(wide, "vec_id", "embedding")
      .select($"bits").as[Seq[Long]].head() == Seq(3L, 8L))
    // an empty vector has NO signature (not a spurious [0, -1]-shaped one)
    val empty = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    assert(Similarity.binarySign(empty, "vec_id", "embedding")
      .select($"bits").as[Seq[Long]].head().isEmpty)
    // hamming ranking: distances exact, ascending, ties by id
    val corpus = Similarity.binarySign(Seq(
      (10L, Seq(1.0f, 1.0f, -1.0f, -1.0f)),  // bits 0011
      (11L, Seq(1.0f, -1.0f, -1.0f, -1.0f)), // bits 0001
      (12L, Seq(-1.0f, -1.0f, 1.0f, 1.0f))   // bits 1100
    ).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val q = Similarity.binarySign(Seq((1L, Seq(1.0f, 1.0f, -1.0f, 1.0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding")
      .select($"vec_id".as("q_id"), $"bits".as("q_bits")) // bits 1011
    val out = Similarity.hammingTopK(corpus, q, k = 3)
      .orderBy("rank").as[(Long, Int, Long, Int)].collect().toSeq
    assert(out == Seq((1L, 1, 10L, 1), (1L, 2, 11L, 2), (1L, 3, 12L, 3)))
  }

  test("text functions: tokens, shingles, quality, fingerprint") {
    val df = Seq((1L, "The quick  Brown fox! 42 jumps."), (2L, "")).toDF("id", "text")
    val row = df.filter($"id" === 1).select(
      TF.tokenCount($"text").as("n"),
      TF.shingles($"text", 2).as("sh"),
      TF.punctRatio($"text").as("pr"),
      TF.stopwordRatio($"text").as("sr"),
      TF.fingerprint($"text").as("fp")).head()
    assert(row.getAs[Int]("n") == 6)
    assert(row.getSeq[String](row.fieldIndex("sh")).contains("the quick"))
    assert(row.getAs[Double]("pr") > 0)
    assert(row.getAs[Double]("sr") > 0)
    // fingerprint is stable
    val fp2 = Seq("the quick  brown FOX! 42 jumps.").toDF("text")
      .select(TF.fingerprint($"text")).head().getLong(0)
    assert(row.getAs[Long]("fp") == fp2)
  }

  test("gopher rule helpers: symbol ratio, alpha fraction, stopword count") {
    val df = Seq(
      (1L, "the cat sat # on... the mat with a dog"),
      (2L, "1 2 3 4 5"),
      (3L, "")).toDF("id", "text")
    val rows = df.select($"id",
        TF.symbolWordRatio($"text").as("sym"),
        TF.alphaTokenFraction($"text").as("alpha"),
        TF.gopherStopCount($"text").as("stops"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getInt(3))).toMap
    val (sym1, alpha1, stops1) = rows(1L)
    assert(sym1 == 2.0 / 10.0, "# and ... each count once over 10 tokens")
    assert(alpha1 == 9.0 / 10.0, "only the bare # token carries no letters")
    assert(stops1 == 3, "the, the, with")
    val (sym2, alpha2, stops2) = rows(2L)
    assert(sym2 == 0.0 && alpha2 == 0.0 && stops2 == 0)
    val (_, alpha3, _) = rows(3L)
    assert(alpha3 == 0.0, "empty text never divides by zero")
  }

  test("bm25: idf favors rare terms, length normalization, absent-term docs") {
    import graft.pipeline.Ranking
    val docs = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma gamma gamma gamma gamma gamma gamma gamma gamma"),
      (3L, "delta delta delta")).toDF("doc_id", "text")
    val out = Ranking.bm25(docs, "doc_id", "text", Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L), "doc matching no query term is absent")
    // doc 1: rare term beta (df=1) twice + alpha; doc 2: only the common
    // alpha (df=2) in a longer doc -> strictly smaller score
    assert(out(1L) > out(2L))
    // hand-check doc 2: tf=1, df=2, N=3, dl=10, avgdl=16/3
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1)
    val expected = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 10.0 / (16.0 / 3)))
    // per-term micro-quantized contributions: agree to 1e-6, not the ulp
    assert(math.abs(out(2L) - expected) < 1e-6)
  }

  test("tfidf: sublinear tf, idf, exact micro-quantized sums") {
    import graft.pipeline.Ranking
    val docs = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma"),
      (3L, "delta")).toDF("doc_id", "text")
    val out = Ranking.tfidf(docs, "doc_id", "text", Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(3L))
    def q(c: Double): Long = math.floor(c * 1e6 + 0.5).toLong
    // doc 1: alpha tf=1 df=2 + beta tf=2 df=1; N=3
    val d1 = (q((1 + math.log(1)) * math.log(3.0 / 2)) +
      q((1 + math.log(2)) * math.log(3.0 / 1))).toDouble / 1e6
    val d2 = q((1 + math.log(1)) * math.log(3.0 / 2)).toDouble / 1e6
    assert(out(1L) == d1 && out(2L) == d2)
  }

  test("bpePairCandidates: vocab-weighted pair counts, bounded top-N") {
    import graft.pipeline.LanguageModel
    // "aa ab aa" -> vocab {aa:2, ab:1}; pairs: "a a"x2, "a b"x1
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val got = LanguageModel.bpePairCandidates(docs, "text", topN = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a a", 2L), ("a b", 1L)))
    // single-char words contribute nothing; ties order by pair asc
    val t = LanguageModel.bpePairCandidates(
      Seq((1L, "x yz ab")).toDF("doc_id", "text"), "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(t == Seq(("a b", 1L), ("y z", 1L)))
  }

  test("keyphrases: rare terms outrank common, short terms excluded") {
    import graft.pipeline.Ranking
    val docs = Seq(
      (1L, "common common common unique1 unique1 word"),
      (2L, "common word other"),
      (3L, "common word misc")).toDF("doc_id", "text")
    val got = Ranking.keyphrases(docs, "doc_id", "text", topK = 2)
      .select($"doc_id", $"rank", $"term").as[(Long, Int, String)]
      .collect().toSeq.sortBy(t => (t._1, t._2))
    // doc 1: unique1 (df=1) beats common (df=3) despite lower tf
    val d1 = got.filter(_._1 == 1L).map(_._3)
    assert(d1.head == "unique1", s"got $d1")
    // terms shorter than 4 chars never appear
    assert(got.forall(_._3.length >= 4))
    // ranks dense from 1
    assert(got.filter(_._1 == 2L).map(_._2) == Seq(1, 2))
  }

  test("bigram LM log-loss: hand-checked smoothing, short docs absent") {
    import graft.pipeline.LanguageModel
    val df = Seq((1L, "a b a b"), (2L, "a a"), (3L, "x")).toDF("doc_id", "text")
    val out = LanguageModel.bigramLogLoss(df, "doc_id", "text")
      .select($"doc_id", $"n_bigrams", $"bits_per_bigram")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: c(a)=4, c(b)=2, c(x)=1, V=3; bigrams "a b"x2 "b a"x1 "a a"x1
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    // doc1: two P(b|a) = 2.5/5.5 and one P(a|b) = 1.5/3.5
    // (per-term micro-bit quantization: agree to ~1e-6, not to the ulp)
    val d1 = -(2 * lg2(2.5 / 5.5) + lg2(1.5 / 3.5)) / 3
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - d1) < 1e-5)
    // doc2: P(a|a) = 1.5/5.5
    assert(math.abs(out(2L)._2 + lg2(1.5 / 5.5)) < 1e-5)
    assert(!out.contains(3L), "a 1-token doc has no defined loss")
  }

  test("garbage audit: control chars, non-ascii share, consonant runs") {
    val df = Seq(
      (1L, "normal english text here"),
      (2L, "bad\u0001\u0002 bytes"),
      (3L, "zxcvbnmqwrtp scanner noise"),
      (4L, "")).toDF("id", "text")
    val out = df.select($"id",
        TF.controlCharRatio($"text").as("c"),
        TF.nonAsciiRatio($"text").as("na"),
        TF.maxConsonantRun($"text").as("run"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getInt(3)))
      .toMap
    assert(out(1L)._1 == 0.0 && out(1L)._2 == 0.0)
    assert(out(2L)._1 == 2.0 / 11 && out(2L)._3 == 1) // two C0 bytes
    assert(out(3L)._3 == 12, "the full garble run is measured")
    assert(out(4L) == ((0.0, 0.0, 0))) // empty text is length-guarded
  }

  test("sourceOverlap: exact shared-shingle counts and jaccard per pair") {
    val df = Seq(
      (1L, "a", "one two three four"),   // shingles: {one two three, two three four}
      (2L, "b", "one two three"),        // {one two three}
      (3L, "c", "five six seven eight")) // disjoint
      .toDF("doc_id", "src", "text")
    val out = DocDedup.sourceOverlap(df, "src", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // only (a, b) share anything: 1 of (2 + 1 - 1) = 0.5
    assert(out.keySet == Set(("a", "b")))
    assert(out(("a", "b")) == ((2L, 1L, 1L, 0.5)))
  }

  test("Kneser-Ney bigram score: hand-checked discount + continuation") {
    import graft.pipeline.LanguageModel
    val df = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w"))
      .toDF("doc_id", "text")
    val out = LanguageModel.knBigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // types: "x y"(c=2), "x z"(c=1); B=2; ctx x: c1=3, n1f=2;
    // cont y/z: n1r=1 each. P(y|x) = 1.25/3 + (0.75*2/3)*(1/2);
    // P(z|x) = 0.25/3 + (0.75*2/3)*(1/2); quantization error < 1e-6
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val py = 1.25 / 3 + (0.75 * 2 / 3) * 0.5
    val pz = 0.25 / 3 + (0.75 * 2 / 3) * 0.5
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 + lg2(py)) < 2e-6)
    assert(math.abs(out(3L)._2 + lg2(pz)) < 2e-6)
    assert(!out.contains(4L), "a 1-token doc has no defined loss")
    // the continuation term makes the rarer successor strictly costlier
    assert(out(3L)._2 > out(1L)._2)
  }

  test("DSIR weights: target-domain tokens score positive, others negative") {
    import graft.pipeline.LanguageModel
    val df = Seq(
      (1L, "tea tea tea", "en"), (2L, "tea tea tea", "en"),
      (3L, "rock rock rock", "de"), (4L, "tea rock tea", "de"))
      .toDF("doc_id", "text", "lang")
    val out = LanguageModel.dsirWeights(df, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 16)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    // "tea" appears 8/6 times raw/target, "rock" 4/0: tea-buckets have
    // higher target share than raw share -> positive log-ratio
    assert(out(1L)._2 > 0 && out(1L)._3)
    assert(out(3L)._2 < 0 && !out(3L)._3)
    assert(out(1L)._1 == 3L)
    // the mixed doc sits between the pure ones
    assert(out(4L)._2 > out(3L)._2 && out(4L)._2 < out(1L)._2)
    // a target-domain doc and an identical raw doc score identically
    assert(out(1L)._2 == out(2L)._2)
  }

  test("budgetSelect equals the naive quality-ordered prefix") {
    import graft.pipeline.Sampling
    // ties across and inside rounding buckets, varied token counts
    val rows = (1 to 40).map(i =>
      (i.toLong, (i % 7) / 10.0 + 0.01 * (i % 3), 5L + i % 4))
    val naive = rows.sortBy { case (id, q, _) => (-q, id) }
    def naiveIds(budget: Long): Set[Long] = {
      var cum = 0L
      naive.flatMap { case (id, _, n) =>
        cum += n; if (cum <= budget) Some(id) else None
      }.toSet
    }
    val df = rows.toDF("id", "q", "n")
    for (budget <- Seq(0L, 37L, 100L, 1000L)) {
      val got = Sampling.budgetSelect(df, "id", "q", "n", budget)
        .select("id").as[Long].collect().toSet
      assert(got == naiveIds(budget), s"budget=$budget")
    }
    // untouched columns survive selection
    assert(Sampling.budgetSelect(df, "id", "q", "n", 1000L).columns.toSeq ==
      Seq("id", "q", "n"))
  }

  test("perplexityBuckets equals the naive per-stratum tercile rank") {
    import graft.pipeline.LanguageModel
    // scores engineered to tie inside AND straddle coarse buckets, two
    // strata of different sizes (10 and 7 -> cuts 4/7 and 3/5)
    val rows = (1 to 10).map(i => (i.toLong, "en", (i % 4) / 2.0 + 0.001 * i)) ++
      (1 to 7).map(i => (100L + i, "de", (i % 3) * 1.0))
    def naive(rs: Seq[(Long, String, Double)]): Map[Long, String] =
      rs.groupBy(_._2).flatMap { case (_, g) =>
        val sorted = g.sortBy { case (id, _, s) => (s, id) }
        val n = sorted.size
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          val rk = i + 1
          id -> (if (rk <= (n + 2) / 3) "head"
                 else if (rk <= (2 * n + 2) / 3) "middle" else "tail")
        }
      }
    val want = naive(rows)
    val got = LanguageModel
      .perplexityBuckets(rows.toDF("id", "lang", "s"), "id", "lang", "s")
      .select($"id", $"bucket").as[(Long, String)].collect().toMap
    assert(got == want)
    // a stratum smaller than 3 still labels every row
    val tiny = Seq((1L, "x", 1.0), (2L, "x", 2.0)).toDF("id", "lang", "s")
    val t = LanguageModel.perplexityBuckets(tiny, "id", "lang", "s")
      .select($"id", $"bucket").as[(Long, String)].collect().toMap
    assert(t == Map(1L -> "head", 2L -> "middle"))
  }

  test("rebalance: exact-hash membership matches the formula replay") {
    import graft.pipeline.Sampling
    import graft.functions.TextFunctions
    val rows = ((1 to 200).map(i => (i.toLong, "en")) ++
      (1 to 50).map(i => (1000L + i, "de")) ++
      (1 to 30).map(i => (2000L + i, "xx"))).toDF("id", "lang")
    val shares = Map("en" -> 600000L, "de" -> 400000L)
    val got = Sampling.rebalance(rows, "lang", "id", shares)
      .select($"id", $"lang").as[(Long, String)].collect()
    assert(got.forall(_._2 != "xx"), "unlisted strata are dropped")
    // replay: T = min(200/.6, 50/.4) = min(333, 125) = 125
    val t = 125L
    val hdf = rows.select($"id", $"lang",
      org.apache.spark.sql.functions.pmod(
        TextFunctions.hash60($"id".cast("string")),
        org.apache.spark.sql.functions.lit(1000000L)).as("h"))
      .as[(Long, String, Long)].collect()
    val want = hdf.collect {
      case (id, "en", h) if h * 200L < 600000L * t => id
      case (id, "de", h) if h * 50L < 400000L * t => id
    }.toSet
    assert(got.map(_._1).toSet == want)
    // binding stratum (de) keeps ~all: threshold 400000*125/50 = 1e6 ppm
    assert(got.count(_._2 == "de") == 50)
  }

  test("temperatureMix: α=1/2 flattening — hand-checked boosts, " +
      "low-resource up, high-resource down") {
    // counts 9/16/25 -> √ = 3/4/5 exactly, so every share is checkable
    // by hand: q = (3,4,5)/12, p = (9,16,25)/50, boost = q/p
    val rows = Seq.fill(9)("a") ++ Seq.fill(16)("b") ++ Seq.fill(25)("c")
    val got = Sampling.temperatureMix(rows.toDF("lang"), "lang")
      .orderBy("lang")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 9L, 0.18, 0.25, 1.388889),
      ("b", 16L, 0.32, 0.333333, 1.041667),
      ("c", 25L, 0.5, 0.416667, 0.833333)))
  }

  test("unimaxMix: capped strata get full capacity, the rest an even " +
      "floor split; all-capped and none-capped edges hold") {
    // counts 2/3/10, cap 2 -> capacities 4/6/20; budget 18:
    //   k=1 (a,4): 4*3=12 <= 18        -> capped, alloc 4
    //   k=2 (b,6): 6*2=12 <= 18-4=14   -> capped, alloc 6
    //   k=3 (c,20): 20*1=20 <= 14-6=8? no -> alloc (18-10) div 1 = 8
    val rows = Seq.fill(2)("a") ++ Seq.fill(3)("b") ++ Seq.fill(10)("c")
    val got = Sampling.unimaxMix(rows.toDF("lang"), "lang",
        budget = 18L, capEpochs = 2)
      .orderBy("lang")
      .as[(String, Long, Long, Boolean, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 4L, true, 4L, 2.0),
      ("b", 3L, 6L, true, 6L, 2.0),
      ("c", 10L, 20L, false, 8L, 0.8)))
    // budget >= total capacity: everyone capped at capEpochs
    val allCap = Sampling.unimaxMix(rows.toDF("lang"), "lang",
        budget = 100L, capEpochs = 2)
      .as[(String, Long, Long, Boolean, Long, Double)].collect()
    assert(allCap.forall(r => r._4 && r._5 == r._3 && r._6 == 2.0))
    // tiny budget: nobody capped, even floor split
    val noneCap = Sampling.unimaxMix(rows.toDF("lang"), "lang",
        budget = 9L, capEpochs = 2)
      .as[(String, Long, Long, Boolean, Long, Double)].collect()
    assert(noneCap.forall(r => !r._4 && r._5 == 3L))
  }

  test("weightedJaccardPairs: boilerplate-only overlap scores below a " +
      "content duplicate pair") {
    import graft.pipeline.DocDedup
    val boiler = "all rights reserved contact us terms of service apply here"
    // 1 & 2: same content + boilerplate (true near-dups); 3 shares ONLY
    // the boilerplate with them; 4 is unrelated filler
    val docs = Seq(
      (1L, s"the quick brown fox jumps over the lazy dog $boiler"),
      (2L, s"the quick brown fox jumps over the lazy dog $boiler again"),
      (3L, s"completely different subject matter entirely $boiler"),
      (4L, "unrelated text about databases and distributed query engines"))
      .toDF("doc_id", "text")
    val all = DocDedup.weightedJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(all((1L, 2L)) > all((1L, 3L)),
      s"content dup must outscore boilerplate-only overlap: $all")
    assert(all((1L, 2L)) > 0.5 && all((1L, 3L)) < 0.5, s"$all")
    // thresholding keeps only the content pair
    val kept = DocDedup.weightedJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5).select($"id1", $"id2")
      .as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L)), kept)
  }

  test("shardManifest: fingerprint is order/partition-invariant and " +
      "flips on any membership change") {
    import graft.pipeline.Packing
    val rows = (1L to 20L).map(i => ("a", i, 10L + i % 3))
    val base = Packing.shardManifest(rows.toDF("g", "id", "n"),
        Seq("g"), "id", "n", shards = 3)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSet
    // a different input order and partitioning yields identical manifests
    val shuffled = Packing.shardManifest(
        scala.util.Random.shuffle(rows).toDF("g", "id", "n").repartition(7),
        Seq("g"), "id", "n", shards = 3)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(base == shuffled)
    assert(base.map(_._2) == Set(0, 1, 2))
    assert(base.toSeq.map(_._3).sum == 20L)
    // substituting one member changes its shard's fingerprint
    val swapped = Packing.shardManifest(
        rows.map { case (g, i, n) => (g, if (i == 20L) 99L else i, n) }
          .toDF("g", "id", "n"),
        Seq("g"), "id", "n", shards = 3)
      .as[(String, Int, Long, Long, Long, Long, Long)].collect().toSet
    assert(base.map(_._7) != swapped.map(_._7))
  }

  test("coverageSelect: greedy marginal-gain picks with ties to the " +
      "smallest id; exhaustion stops early") {
    import graft.pipeline.Sampling
    // 3-shingle docs 1/2 tie round 1 (id asc -> 1); doc 2's two
    // uncovered shingles tie doc 3's round 2 (id asc -> 2)
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "p q r s"))
      .toDF("doc_id", "text")
    val got = Sampling.coverageSelect(docs, "doc_id", "text", n = 3, k = 5)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 1L, 3L, 3L),
      (2, 2L, 2L, 5L),
      (3, 3L, 2L, 7L)),
      s"got $got")
    // k beyond exhaustion returned only 3 rows (everything covered)
    assert(got.size == 3)
  }

  test("bpeMergeRounds: greedy argmax merges with back-to-back " +
      "occurrences and tie-breaking, hand-checked") {
    import graft.pipeline.LanguageModel
    // vocab: "aaab" x2 -> "a a a b", "ab" x3 -> "a b"
    // r1: pairs (a a):4, (a b):5 -> merge "a b" (5)
    // r2: (a a):2 ties (a ab):2 -> pair-asc picks "a a" (2)
    // r3: only (aa ab):2 -> "aaab" fully merged
    val docs = (Seq.fill(2)("aaab") ++ Seq.fill(3)("ab")).toDF("text")
    val got = LanguageModel.bpeMergeRounds(docs, "text", rounds = 3)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "a b", "ab", 5L),
      (2, "a a", "aa", 2L),
      (3, "aa ab", "aaab", 2L)))
    // back-to-back occurrences all merge (the double-pass replace):
    // "abababab" chars -> 4 non-overlapping (a b) merges in round 1
    val chain = Seq("abababab").toDF("text")
    val r1 = LanguageModel.bpeMergeRounds(chain, "text", rounds = 2)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(r1.head == (1, "a b", "ab", 4L), r1)
    assert(r1(1) == (2, "ab ab", "abab", 3L), r1)
  }

  test("madOutliers equals the naive lower-median MAD rule") {
    import graft.pipeline.Sampling
    // one stratum with a fat tail, one tiny stratum; scores straddle
    // coarse 2-decimal buckets
    val rows = ((1 to 20).map(i => (i.toLong, "a", 0.5 + 0.001 * (i % 5))) ++
      Seq((21L, "a", 9.9), (22L, "a", -3.0)) ++
      (1 to 3).map(i => (100L + i, "b", i * 1.0)))
    def naiveMed(vs: Seq[Double]): Double =
      vs.sorted.apply((vs.size + 1) / 2 - 1)
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      val med = naiveMed(g.map(_._3))
      val devs = g.map { case (id, _, v) => (id, math.abs(v - med)) }
      val mad = naiveMed(devs.map(_._2))
      devs.map { case (id, dv) => id -> (dv > 3.0 * 1.4826 * mad) }
    }
    val got = Sampling.madOutliers(rows.toDF("id", "lang", "v"),
        "id", "lang", "v")
      .select($"id", $"outlier").as[(Long, Boolean)].collect().toMap
    assert(got == want)
    assert(got(21L) && got(22L), "planted outliers flagged")
    assert(!got(1L), "bulk rows pass")
  }

  test("native hash60 is bit-identical to the composed md5/conv form") {
    val samples = Seq("", "a", "hello world", "ünïcødé ∆", "x" * 500,
      "the quick brown fox")
    val df = samples.toDF("s")
    val got = df.select(TF.hash60($"s")).as[Long].collect().toSeq
    val ref = df.select(
      conv(substring(md5($"s".cast("string")), 1, 15), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(got == ref)
  }

  test("shingles: 0/1/2-token documents yield empty arrays, not errors") {
    val df = Seq((0L, ""), (1L, "solo"), (2L, "two tokens"), (3L, "now three tokens"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", TF.shingles($"text", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(0L).isEmpty && got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L) == Seq("now three tokens"))
    // downstream ops survive short docs too
    val sigs = DocDedup.signatures(df, "doc_id", "text", n = 3,
      DocDedup.MinHashParams(numPerms = 4, bands = 2))
    assert(sigs.count() == 4)
  }

  test("langId picks the language with most marker words") {
    val df = Seq(
      "the cat and the dog went to the store",
      "der hund und die katze ist nicht hier",
      "el perro y la casa es en la calle",
      "le chien est pour la maison avec une porte",
      "xyzzy plugh").toDF("text")
    val got = df.select(TF.langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "und"))
  }

  test("exact dedup keeps one representative per duplicate group") {
    val df = Seq((1L, "same text"), (2L, "Same  TEXT"), (3L, "other")).toDF("doc_id", "text")
    val out = DocDedup.exactDedup(df, "doc_id", "text")
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("minhash LSH finds the planted near-dup pairs (vs exact jaccard)") {
    val p = DocDedup.MinHashParams(numPerms = 32, bands = 16)
    val approx = DocDedup.minHashDedupPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.7, p)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val exact = DocDedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(approx == exact)
  }

  test("hot-shingle df cap: bounded expansion, still exact for emitted pairs") {
    // 60 docs all share one corpus-hot trigram ("the common header"); two
    // planted near-dup pairs differ in the tail. With maxShingleDf=10 the
    // hot bucket (df=60 > 10) is excluded from pair counting; both ends of
    // every candidate are marked hot, so the exact re-verify path computes
    // the full Jaccard INCLUDING the hot shingle's contribution.
    val body = (1 to 6).map(i => s"w$i").mkString(" ")
    val rows = (1L to 56L).map(i =>
      (i, s"the common header doc$i $body unique$i tail$i")) ++ Seq(
      (100L, s"the common header $body alpha beta gamma"),
      (101L, s"the common header $body alpha beta gamma"),    // dup of 100
      (102L, s"the common header $body delta epsilon zeta"),
      (103L, s"the common header $body delta epsilon zzz"))   // near 102
    val df = rows.toDF("doc_id", "text")
    val got = DocDedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        threshold = 0.5, maxShingleDf = 10)
      .select($"id1", $"id2", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(got.contains((100L, 101L)) && got((100L, 101L)) == 1.0)
    // exact jaccard for (102,103): 10 trigrams each, 9 shared -> 9/11
    // (hot shingles INCLUDED via re-verify despite the capped index)
    assert(got((102L, 103L)) == math.round(9.0 / 11.0 * 1e6) / 1e6)
    // and the result agrees with the uncapped run above threshold
    val uncapped = DocDedup.ngramJaccardPairs(df, "doc_id", "text", n = 3,
        threshold = 0.5, maxShingleDf = Int.MaxValue)
      .select($"id1", $"id2", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(got == uncapped)
  }

  test("cosine near-dup LSH drops degenerate buckets beyond maxBucket") {
    val vecs = (1L to 20L).map(i => (i, Array(1.0f, 0.01f * i))) // one bucket
    val df = vecs.toDF("vec_id", "embedding")
    val planes = Similarity.lshPlanes(4, 2)
    val all = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      planes, threshold = 0.9)
    assert(all.count() > 0)
    val guarded = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      planes, threshold = 0.9, maxBucket = 5)
    assert(guarded.count() == 0) // every bucket over the cap was dropped
  }

  test("quantized cosine-threshold membership: micro/1e6 exposure, " +
      "half-micro rounding at the boundary, zero-norm vectors survive") {
    import graft.pipeline.{Clustering, Sampling}
    // orthogonal-ish fixture: pair (1,2) cos == 0.6 exactly (3-4-5),
    // pair (1,3) cos == 0; all vectors share one LSH bucket via planes
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.6f, 0.8f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(0.0f, 0.0f)) // zero-norm: must not kill the job (ANSI)
    ).toDF("vec_id", "embedding")
    val planes = Seq(Seq(1.0, 1.0)) // everything non-negative collides
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
        planes, threshold = 0.6)
      .as[(Long, Long, Double)].collect().map(p => ((p._1, p._2), p._3)).toMap
    // 0.6 lands exactly on the threshold -> member; exposed as micro/1e6
    assert(pairs.keySet == Set((1L, 2L), (2L, 3L)), pairs)
    assert(pairs((1L, 2L)) == 0.6 && pairs((2L, 3L)) == 0.8)
    // semanticDedup with a zero-norm member: no DIVIDE_BY_ZERO, the
    // zero vector pairs score NULL and it is kept
    val sd = Clustering.semanticDedup(df, "vec_id", "embedding",
        k = 2, threshold = 0.5)
      .select($"vec_id", $"kept").as[(Long, Boolean)].collect().toMap
    assert(sd(4L), "zero-norm member survives (sits out clustering, kept)")
    // seeds: c0 = v1, c1 = v2; v3 joins c1 (cos 0.8) and is dropped by
    // the in-cluster pair (2,3); the cross-cluster pair (1,2) is never
    // compared — SemDeDup's cluster-bounded contract
    assert(sd(1L) && sd(2L) && !sd(3L), sd)
    // decontaminateSemantic against a zero-norm benchmark row: guarded
    val dec = Sampling.decontaminateSemantic(
        df.filter($"vec_id" <= 2), df.filter($"vec_id" >= 3),
        "vec_id", "embedding", threshold = 0.5)
      .select($"vec_id", $"contaminated").as[(Long, Boolean)].collect().toMap
    // vec 2 vs benchmark vec 3: cos = 0.8 -> contaminated; vec 1 vs 3: 0
    assert(dec == Map(1L -> false, 2L -> true), dec)
  }

  test("simhash: near-identical docs collide, distinct docs don't") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "totally different words entirely unrelated content here now")).toDF("doc_id", "text")
    val sigs = df.select($"doc_id", DocDedup.simHash($"text").as("sig"))
      .as[(Long, Long)].collect().toMap
    val d12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val d13 = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(d12 < d13)
    val pairs = DocDedup.simHashPairs(df, "doc_id", "text", maxHamming = 15)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("vector functions: dot/norm/cosine") {
    val df = Seq((Array(1.0f, 0f, 0f), Array(0f, 1f, 0f)), (Array(1f, 1f, 0f), Array(1f, 1f, 0f)))
      .toDF("a", "b")
    val got = df.select(round(VF.cosine($"a", $"b"), 6)).as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0))
  }

  test("brute-force topk is exact and ivf with all probes matches it") {
    val queries = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("q_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val centroids = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val nlist = centroids.count().toInt
    val ivfAll = Similarity.ivfTopK(emb, centroids, queries, k = 5, nprobe = nlist)
      .select("q_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(bf == ivfAll)
    assert(bf.size == 10)
  }

  test("pq ADC top-k scores equal the driver-side table-lookup sums") {
    import graft.pipeline.{Clustering, Similarity}
    val vecs = (0L until 12L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat / 10f)))
    val df = vecs.toDF("vec_id", "embedding")
    val (codes, cb) = Clustering.pqFit(df, "vec_id", "embedding",
      m = 2, k = 2, iters = 1)
    val queries = df.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Similarity.pqTopK(codes, cb, queries, k = 5)
      .select($"q_id", $"neighbor_id", $"score", $"rank")
      .as[(Long, Long, Double, Int)].collect()
    // replay: dt[j][c] = <micro(q_j), cb[j][c]> (exact integer dot —
    // codebooks arrive in integer micro-units); score = sum/1e12
    val codeRows = codes.select($"vec_id", $"code_0", $"code_1")
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val cbMap = cb.map { case (j, c, cq) => (j, c) -> cq }.toMap
    def score(q: Array[Float], codes: (Int, Int)): Double = {
      def dt(j: Int, c: Int): Long = {
        val sub = q.slice(j * 2, j * 2 + 2)
          .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
        val cq = cbMap((j, c))
        sub.zip(cq).foldLeft(0L) { case (a, (x, y)) => a + x * y }
      }
      (dt(0, codes._1) + dt(1, codes._2)).toDouble / 1e12
    }
    val qMap = vecs.toMap
    got.foreach { case (qid, nid, s, _) =>
      assert(s == score(qMap(qid), codeRows(nid)), s"q=$qid n=$nid")
      assert(nid != qid, "self excluded")
    }
    assert(got.count(_._1 == 0L) == 5 && got.count(_._1 == 1L) == 5)
    // ranks are dense per query, ties broken by ascending id
    val r0 = got.filter(_._1 == 0L).sortBy(_._4)
    assert(r0.map(_._4).toSeq == (1 to 5))
    assert(r0.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._2 < b._2) })
  }

  test("ensemblePairs: detector families vote, byte dup sweeps all three") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base), // byte dup -> exact + jaccard + simhash
      (3L, base + " extra"), // near dup -> jaccard (+ simhash, tokens ~same)
      (4L, "completely unrelated content about databases and query engines ok"))
      .toDF("doc_id", "text")
    val got = DocDedup.ensemblePairs(docs, "doc_id", "text")
      .orderBy("id1", "id2")
      .as[(Long, Long, Long, String)].collect().toSeq
    val m = got.map { case (a, b, v, s) => ((a, b), (v, s)) }.toMap
    assert(m((1L, 2L)) == ((3L, "exact,jaccard,simhash")))
    assert(m.get((1L, 3L)).exists(_._2.contains("jaccard")))
    assert(!m.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated doc nominated by no detector")
  }

  test("fixedSizeSample: exact count per stratum, repartition-invariant") {
    val docs = (1 to 200).map(i => (if (i % 2 == 0) "en" else "de", i.toLong))
      .toDF("lang", "doc_id")
    val a = Sampling.fixedSizeSample(docs, "lang", "doc_id", n = 7)
      .orderBy("lang", "draw").as[(String, Int, Long)].collect().toSeq
    assert(a.count(_._1 == "en") == 7 && a.count(_._1 == "de") == 7)
    val b = Sampling.fixedSizeSample(docs.repartition(13), "lang", "doc_id", 7)
      .orderBy("lang", "draw").as[(String, Int, Long)].collect().toSeq
    assert(a == b, "the draw is a pure content function")
    // a stratum smaller than n yields the whole stratum
    val tiny = Sampling.fixedSizeSample(docs.filter($"doc_id" <= 4), "lang",
      "doc_id", 7)
    assert(tiny.count() == 4)
  }

  test("ngramPrecision: clipped counts, absent grams clip to 0, empty -> NULL") {
    import graft.pipeline.Ranking
    val cand = Seq((1L, "a a b c"), (2L, "x y z"), (3L, "")).toDF("doc_id", "text")
    val ref = Seq((10L, "a b b q"), (11L, "a q")).toDF("doc_id", "text")
    val got = Ranking.ngramPrecision(cand, ref, "doc_id", "text", 1)
      .orderBy("doc_id")
      .select($"doc_id", $"clipped", $"total", $"precision")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // doc 1: tf {a:2, b:1, c:1}; ref tf {a:2, b:2, q:2} ->
    //   clipped = min(2,2) + min(1,2) + 0 = 3 of 4
    assert(got(0) == ((1L, 3L, 4L, Some(0.75))))
    assert(got(1) == ((2L, 0L, 3L, Some(0.0))), "fully novel doc scores 0")
    assert(got(2)._4.isEmpty, "gram-less doc surfaces NULL, not a div error")
  }

  test("mmrRerank: a duplicate of the first pick defers to a diverse doc") {
    import graft.pipeline.Similarity
    // a and b are identical (a dup pair); c is relevant but diverse.
    // Pure top-k orders a, b, c; MMR at lambda=1/2 must interleave c
    // before the duplicate b, and round 1 must tie-break a over b by id.
    val vecs = Seq(
      (1L, Array(0.99f, 0.1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f, 0f)),
      (3L, Array(0.6f, 0f, 0.8f, 0f))).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("q_id", "q_vec")
    val got = Similarity.mmrRerank(vecs, q, n = 3, k = 3)
      .orderBy("rank").select($"rank", $"neighbor_id")
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 1L), (2, 3L), (3, 2L)))
    val plain = Similarity.bruteForceTopK(vecs, q, k = 3)
      .orderBy("rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L, 3L), "pure relevance keeps the dup adjacent")
  }

  test("hardNegatives: same-cluster and self candidates are pruned") {
    import graft.pipeline.Similarity
    // two obvious clusters on a line; queries from cluster 0
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.95f, 0f)),
      (10L, Array(0f, 1f)), (11L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val clusters = Seq((0L, 0), (1L, 0), (2L, 0), (10L, 1), (11L, 1))
      .toDF("vec_id", "cluster")
    val q = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = Similarity.hardNegatives(vecs, clusters, q, k = 10)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(got == Set(10L, 11L), s"got $got — in-cluster rows must be pruned")
  }

  test("semiHardTriplets: negative sits strictly below the positive; " +
      "anchors with no semi-hard negative are dropped") {
    import graft.pipeline.Similarity
    val vecs = Seq(
      // anchor 0 (label 0): positive must be 1 (cos .9939), not 2 (.6)
      (0L, Array(1f, 0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.6f, 0.8f), 0),
      // label-1 candidates: 10 is HARDER than the positive (cos .9987 >
      // .9939 — outside the semi-hard band), 12 (.8) beats 11 (.7071)
      (10L, Array(0.95f, 0.05f), 1), (11L, Array(0.7f, 0.7f), 1),
      (12L, Array(0.8f, 0.6f), 1),
      // anchor 30 (label 3): its only positive is the WORST match in the
      // corpus (cos -1), so no negative is strictly below it -> dropped
      (30L, Array(-1f, 0f), 3), (31L, Array(1f, 0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val anchors = vecs.filter($"vec_id" === 0L || $"vec_id" === 30L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"label".as("q_label"))
    val got = Similarity.semiHardTriplets(vecs, anchors)
      .select($"q_id", $"pos_id", $"neg_id").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((0L, 1L, 12L)),
      s"got $got — expected pos=1, semi-hard neg=12, anchor 30 dropped")
  }

  test("duplicationRank: star center out-ranks chain middle; exact " +
      "integer masses after 3 rounds") {
    // star 0-{1,2,3} and chain 10-11-12: hand-unrolled integer recurrence
    // (m div deg shares, 150000 + 85%*inc div 100 re-damp)
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (10L, 11L), (11L, 12L))
      .toDF("id1", "id2")
    val got = DocDedup.duplicationRank(pairs, iters = 3)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 2483250L), (1L, 1L, 505583L), (2L, 1L, 505583L),
      (3L, 1L, 505583L), (10L, 1L, 629187L), (11L, 2L, 1741625L),
      (12L, 1L, 629187L)), s"got $got")
  }

  test("topComponent: power iteration recovers a known dominant direction") {
    import graft.pipeline.Quantization
    // y = 0.01·x exactly: covariance is rank-1 with direction (1, 0.01),
    // so the max-norm-normalized loading must be exactly (1.0, 0.01)
    // after one round (and stay there under more rounds)
    val vecs = Seq(1f, -1f, 2f, -2f).zipWithIndex
      .map { case (x, i) => (i.toLong, Array(x, 0.01f * x)) }
      .toDF("vec_id", "embedding")
    val got = Quantization.topComponent(vecs, "embedding", iters = 3)
      .orderBy("dim").select($"loading").as[Double].collect().toSeq
    assert(got.head == 1.0, s"dominant dim must peak at 1.0, got $got")
    assert(math.abs(got(1) - 0.01) < 2e-6,
      s"off-axis loading must be ~0.01, got $got")
  }

  test("filteredTopKIndexed: predicate prunes the index BEFORE scoring; " +
      "carryCols rides attributes into the index") {
    import graft.pipeline.Similarity
    val vecs = Seq(
      (1L, Array(1f, 0f), "A"), (2L, Array(0.99f, 0.01f), "B"),
      (3L, Array(0.9f, 0.1f), "A"),
      (10L, Array(0f, 1f), "A"), (11L, Array(0.1f, 0.9f), "B")
    ).toDF("vec_id", "embedding", "label")
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("c_id", "c_vec")
    val index = Similarity.ivfIndex(vecs, cents, carryCols = Seq("label"))
    assert(index.columns.contains("label"), "carryCols must reach the index")
    val q = Seq((100L, Array(1f, 0f))).toDF("q_id", "q_vec")
    // unfiltered rank-2 is id 2 (label B); the filter must drop it and
    // fill k from the remaining label-A rows of the probed list
    val got = Similarity.filteredTopKIndexed(index, cents, q,
        $"label" === "A", k = 3, nprobe = 1)
      .orderBy("rank").select($"neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L),
      s"got $got — only label-A members of the probed list, ranked")
  }

  test("zero-norm vectors (null cosine) are dropped, not a crash") {
    // x / 0.0 is NULL in Spark SQL even for doubles; a null score used to
    // hit TopK's non-nullable input encoder at runtime
    val corpus = Seq(
      (1L, Array(1.0f, 0f)), (2L, Array(0f, 1f)), (3L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 1f))).toDF("q_id", "q_vec")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // zero-norm id 3 ranked out, same as window form
  }

  test("connected components: chains merge transitively, cliques keep min id") {
    // A~B, B~C (A and C never paired) must land in ONE cluster; D~E apart
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L))
      .toDF("id1", "id2")
    val got = DocDedup.connectedComponents(pairs)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("connected components: long chain needs multiple propagation rounds") {
    // a 40-node path: min-label must travel the whole diameter
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = DocDedup.connectedComponents(pairs)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 40)
    assert(got.forall { case (_, c, n) => c == 1L && n == 40L })
    // under-capped iterations leave the far end unconverged (bounded, no hang)
    val capped = DocDedup.connectedComponents(pairs, maxIter = 2)
      .as[(Long, Long, Long)].collect()
    assert(capped.exists(_._2 != 1L))
  }

  test("repetition: dup bigram ratio and ngrams multiplicity") {
    val df = Seq(
      (1L, "spam spam spam spam"),      // bigrams: 3x "spam spam" -> 2/3 dup
      (2L, "all words are different here"),
      (3L, "x")).toDF("doc_id", "text") // no bigrams -> 0
    val got = df.select($"doc_id",
      TF.ngrams($"text", 2).as("bg"),
      round(TF.dupNgramRatio($"text", 2), 6).as("r"))
      .as[(Long, Seq[String], Double)].collect().sortBy(_._1)
    assert(got(0)._2 == Seq("spam spam", "spam spam", "spam spam"))
    assert(got(0)._3 == math.rint((1.0 - 1.0 / 3.0) * 1e6) / 1e6)
    assert(got(1)._3 == 0.0 && got(2)._3 == 0.0)
  }

  test("sampling: deterministic membership nests across rates; strata rates apply") {
    import graft.pipeline.Sampling
    val docs = (1L to 500L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr", s"doc $i"))
      .toDF("doc_id", "lang", "text")
    val s10 = Sampling.deterministicSample(docs, "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    val s50 = Sampling.deterministicSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    // hash-bucket membership NESTS: raising the rate only adds rows —
    // the property rand()-sampling lacks and re-runs rely on
    assert(s10.subsetOf(s50))
    assert(s10.nonEmpty && s50.size > s10.size && s50.size < 500)
    // same call twice = same rows (stable across runs)
    assert(Sampling.deterministicSample(docs, "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet == s10)
    // stratified: en downsampled hard, fr kept fully
    val strat = Sampling.stratifiedSample(docs, "lang", "doc_id",
      rates = Map("en" -> 5, "de" -> 50), defaultKeep = 100)
    val byLang = strat.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") == docs.filter($"lang" === "fr").count())
    assert(byLang.getOrElse("en", 0L) < byLang("de"))
  }

  test("decontamination: benchmark members are fully contaminated, disjoint docs are clean") {
    import graft.pipeline.Sampling
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over a sleeping cat"), // shares a prefix
      (3L, "entirely different words with no overlap at all"),
      (4L, "tiny")). // no 3-gram shingles
      toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val out = Sampling.decontaminate(docs, bench, "doc_id", "text",
        n = 3, threshold = 0.2)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_overlap", "overlap", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(out(0) == ((1L, 7L, 7L, 1.0, true))) // the benchmark doc itself
    assert(out(1)._5) // shares "the quick brown"... prefix: contaminated
    assert(out(1)._3 > 0 && out(1)._3 < out(1)._2)
    assert(out(2) == ((3L, 6L, 0L, 0.0, false))) // disjoint: clean
    assert(out(3) == ((4L, 0L, 0L, 0.0, false))) // shingle-less: present, clean
  }

  test("multimodal plumbing: features and frames are deterministic") {
    val assets = Multimodal.syntheticAssets(spark, docs.limit(30))
    val feats = Multimodal.extractImageFeatures(assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => math.abs(f.feature.sum - 1.0) < 1e-3))
    val frames = Multimodal.sampleVideoFrames(assets, 4).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.asset_id).values.forall(_.length <= 4))
    val resized = Multimodal.resizeImages(assets, 32, 32).collect()
    assert(resized.filter(_.media_type == "image")
      .forall(a => a.width.contains(32) && a.content.length == 32 * 32 / 64))
    assert(resized.filter(_.media_type != "image")
      .forall(a => a.width.forall(_ != 32) || true)) // non-images untouched
    // determinism
    val feats2 = Multimodal.extractImageFeatures(assets).collect()
    assert(feats.map(_.feature.toSeq).toSet == feats2.map(_.feature.toSeq).toSet)
  }

  test("weighted sampling: zero weight drops all, full weight+rate=1 keeps all, monotone in weight") {
    import graft.pipeline.Sampling
    val rows = (1L to 400L).map(i => (i, 0.5)).toDF("doc_id", "w")
    assert(Sampling.weightedSample(rows.withColumn("w", lit(0.0)),
      "doc_id", "w", 1, 1).count() == 0)
    assert(Sampling.weightedSample(rows.withColumn("w", lit(1.0)),
      "doc_id", "w", 1, 1).count() == 400)
    val lo = Sampling.weightedSample(rows.withColumn("w", lit(0.2)),
      "doc_id", "w", 1, 1).select("doc_id").as[Long].collect().toSet
    val hi = Sampling.weightedSample(rows.withColumn("w", lit(0.8)),
      "doc_id", "w", 1, 1).select("doc_id").as[Long].collect().toSet
    // same hash, bigger acceptance region: membership NESTS in weight
    assert(lo.subsetOf(hi) && lo.nonEmpty && hi.size > lo.size && hi.size < 400)
    // rate scales acceptance the same way
    val rated = Sampling.weightedSample(rows.withColumn("w", lit(0.8)),
      "doc_id", "w", 1, 2).select("doc_id").as[Long].collect().toSet
    assert(rated.subsetOf(hi) && rated.size < hi.size)
  }

  test("mixEpochs: integer epochs exact, fractional epochs hash-split, zero drops") {
    import graft.pipeline.Sampling
    val rows = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "lang")
    val mixed = Sampling.mixEpochs(rows, "lang", "doc_id",
      Map("a" -> 2000000L, "b" -> 1500000L, "c" -> 0L))
    val byLang = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("a") == 200L) // exactly 2 epochs each
    assert(!byLang.contains("c")) // 0 epochs -> dropped entirely
    // 1.5 epochs: between 1x and 2x, and epoch ids are dense 0..n-1
    assert(byLang("b") > 100L && byLang("b") < 200L)
    val epochs = mixed.filter($"lang" === "a").groupBy("doc_id")
      .agg(collect_list("epoch").as("es")).select("es")
      .as[Seq[Long]].collect()
    assert(epochs.forall(_.sorted == Seq(0L, 1L)))
  }

  test("int8 quantization: range endpoints code to 0/255, degenerate dim to 0") {
    import graft.pipeline.Quantization
    val vecs = Seq(
      (1L, Array(0.0f, 10.0f, 7.0f)),
      (2L, Array(1.0f, 30.0f, 7.0f)),
      (3L, Array(0.5f, 20.0f, 7.0f))).toDF("vec_id", "embedding")
    val out = Quantization.quantizeInt8(spark, vecs, "vec_id", "embedding")
      .orderBy("vec_id").select("codes").as[Seq[Int]].collect()
    assert(out(0) == Seq(0, 0, 0))     // mins -> 0; degenerate dim -> 0
    assert(out(1) == Seq(255, 255, 0)) // maxes -> 255
    assert(out(2) == Seq(128, 128, 0)) // midpoint -> floor(127.5+0.5)
  }

  test("naive bayes: separable classes classify correctly, scores are exact longs") {
    import graft.pipeline.LanguageModel
    val train = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ran to the park"),
      (3L, "de", "der hund lief zum park"),
      (4L, "de", "die katze sass auf der matte"),
      (5L, "en", "the cat and the dog"),
      (6L, "de", "der hund und die katze")).toDF("doc_id", "lang", "text")
    val out = LanguageModel.naiveBayesClassify(train, "doc_id", "lang", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    // self-classification on separable vocab recovers every label
    assert(out.map(r => r._1 -> r._2).toMap ==
      Map(1L -> "en", 2L -> "en", 3L -> "de", 4L -> "de", 5L -> "en", 6L -> "de"))
    // repeated runs produce identical integer scores (exactness contract)
    val out2 = LanguageModel.naiveBayesClassify(train, "doc_id", "lang", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(out.toSeq == out2.toSeq)
  }

  test("incremental dedup finds exactly the cross-set pairs the batch self-dedup would") {
    val p = DocDedup.MinHashParams(numPerms = 32, bands = 16)
    val corpus = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val idx = DocDedup.lshIndex(corpus, "doc_id", "text", n = 3, p)
    val inc = DocDedup.incrementalNearDups(corpus, idx, batch,
        "doc_id", "text", n = 3, threshold = 0.7, p)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // ground truth: full-corpus pairs restricted to (corpus, batch) ends
    val all = DocDedup.minHashDedupPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.7, p)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val expected = all.collect {
      case (a, b) if a % 5 != 0 && b % 5 == 0 => (a, b)
      case (a, b) if b % 5 != 0 && a % 5 == 0 => (b, a)
    }
    assert(inc == expected)
    assert(inc.forall { case (a, b) => a % 5 != 0 && b % 5 == 0 })
  }

  test("product quantization: codes in range, deterministic, distinct subspaces") {
    import graft.pipeline.Clustering
    val out = graft.pipeline.Clustering.productQuantize(emb, "vec_id", "embedding",
      m = 4, k = 4, iters = 1)
    assert(out.columns.toSeq == Seq("vec_id", "code_0", "code_1", "code_2", "code_3"))
    val rows = out.orderBy("vec_id").collect()
    assert(rows.length == emb.count())
    for (j <- 0 to 3) {
      val codes = rows.map(_.getAs[Int](s"code_$j")).toSet
      assert(codes.forall(c => c >= 0 && c < 4))
      assert(codes.size > 1, s"subspace $j collapsed to one centroid")
    }
    val again = Clustering.productQuantize(emb, "vec_id", "embedding",
      m = 4, k = 4, iters = 1).orderBy("vec_id").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("winnowing: shared long runs always share a fingerprint; short docs covered") {
    val n = 3; val w = 4
    // two docs sharing a run of w+n-1 = 6 tokens amid distinct noise:
    // the Schleimer guarantee says at least one fingerprint must match
    val shared = "alpha beta gamma delta epsilon zeta"
    val two = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven")).toDF("doc_id", "text")
    val fps = DocDedup.winnowedFingerprints(two, "doc_id", "text", n, w)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) intersect fps(2L)).nonEmpty, "guarantee violated")
    // density: far fewer fingerprints than n-grams (expected 2/(w+1))
    val doc = (1 to 200).map(i => s"tok${i % 50}").mkString(" ")
    val nfp = DocDedup.winnowedFingerprints(Seq((1L, doc)).toDF("doc_id", "text"),
      "doc_id", "text", n, w).count()
    assert(nfp < 198 / 2, s"$nfp fingerprints for 198 n-grams is not sparse")
    // docs shorter than one window still emit exactly one fingerprint
    val short = DocDedup.winnowedFingerprints(
      Seq((1L, "just three words here")).toDF("doc_id", "text"),
      "doc_id", "text", n, w).count()
    assert(short == 1L)
    // disjoint docs share nothing
    val pairs = DocDedup.winnowPairs(two, "doc_id", "text", n, w, minShared = 1)
      .select("id1", "id2").collect()
    assert(pairs.nonEmpty) // the planted overlap surfaces as a pair
  }

  test("zipf fit: an exact power law recovers its exponent") {
    import graft.pipeline.Ranking
    // freq(rank) = 1000 / rank for 20 tokens => slope exactly -1
    val docs = (1 to 20).flatMap { r =>
      val freq = 1000 / r
      Seq.fill(freq)(s"tok${('a' + r).toChar}")
    }.mkString(" ")
    val fit = Ranking.zipfFit(Seq((1L, docs)).toDF("doc_id", "text"), "text",
      topN = 20).as[(Long, Double, Double)].head()
    assert(fit._1 == 20L)
    assert(math.abs(fit._2 - (-1.0)) < 0.02, s"slope ${fit._2}")
    assert(math.abs(fit._3 - math.log(1000.0)) < 0.05, s"intercept ${fit._3}")
  }
}
