package graft

import org.apache.spark.sql.functions._
import graft.pipeline.DocDedup

class DocDedupExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("repeatedSpans: maximal runs across and within documents, " +
      "minRun filter, clean docs emit nothing") {
    // docs 1 and 2 share the 9-token phrase "the quick brown fox jumps
    // over the lazy dog" (doc1 tokens 1-9, doc2 tokens 3-11); doc 3 is
    // clean; doc 4 repeats "a b c d" WITHIN itself (positions 1 and 6)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end one"),
      (2L, "prefix words the quick brown fox jumps over the lazy dog tail"),
      (3L, "completely different content with no repeats at all here"),
      (4L, "a b c d x a b c d y")).toDF("doc_id", "text")
    val spans = DocDedup.repeatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Long)].collect().toSeq
    // shared phrase -> ONE maximal island per doc (6 consecutive dup
    // 4-shingles = 9 tokens), not six length-1 spans
    assert(spans == Seq(
      (1L, 1, 9, 6L), (2L, 3, 11, 6L), (4L, 1, 4, 1L), (4L, 6, 9, 1L)))
    // the intra-doc repeat proves minOccurs counts OCCURRENCES, not docs
    assert(spans.count(_._1 == 4L) == 2)
    // minRun prunes short runs
    val long = DocDedup.repeatedSpans(docs, "doc_id", "text", k = 4,
      minRun = 2).orderBy("doc_id").as[(Long, Int, Int, Long)].collect()
    assert(long.map(_._1).toSeq == Seq(1L, 2L))
    // a k longer than any shared run finds nothing
    assert(DocDedup.repeatedSpans(docs, "doc_id", "text", k = 10)
      .count() == 0)
  }

  test("incrementalRepeatedSpans == full recompute restricted to the batch") {
    // for batch-doc positions the duplicated criterion is identical:
    // corpus∪batch occurrence count = index count + batch-window count
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the dam"),
      (11L, "unrelated corpus content sits here quietly")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "watch the quick brown fox jumps again"), // repeats vs corpus
      (2L, "p q r s p q r s"), // repeats wholly inside the batch doc
      (3L, "nothing shared with anything else")).toDF("doc_id", "text")
    val idx = DocDedup.spanShingleIndex(corpus, "doc_id", "text", k = 3)
    val inc = DocDedup.incrementalRepeatedSpans(idx, batch,
        "doc_id", "text", k = 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Long)].collect().toSeq
    val full = DocDedup.repeatedSpans(corpus.unionByName(batch),
        "doc_id", "text", k = 3)
      .filter($"doc_id" < 10).orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Long)].collect().toSeq
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.exists(_._1 == 1L) && inc.exists(_._1 == 2L)
      && !inc.exists(_._1 == 3L))
  }

  test("repeatedSpansKeepFirst: the first occurrence is the keeper; " +
      "only later copies become spans") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end one"),
      (2L, "prefix words the quick brown fox jumps over the lazy dog tail"),
      (4L, "a b c d x a b c d y")).toDF("doc_id", "text")
    val spans = DocDedup.repeatedSpansKeepFirst(docs, "doc_id", "text",
        k = 4)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int, Long)].collect().toSeq
    // doc 1 holds every shared shingle's first occurrence -> no spans;
    // doc 2's copy of the phrase and doc 4's SECOND "a b c d" excise
    assert(spans == Seq((2L, 3, 11, 6L), (4L, 6, 9, 1L)))
  }

  test("exciseRepeatedSpans: removes span tokens, keeps the clean rest") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog end one"),
      (2L, "prefix words the quick brown fox jumps over the lazy dog tail"),
      (3L, "completely different content with no repeats at all here"),
      (4L, "a b c d x a b c d y")).toDF("doc_id", "text")
    val out = DocDedup.exciseRepeatedSpans(docs, "doc_id", "text", k = 4)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 11L, 9L, "end one"),
      (2L, 12L, 9L, "prefix words tail"),
      (3L, 9L, 0L,
        "completely different content with no repeats at all here"),
      (4L, 10L, 8L, "x y")))
  }

  test("editDistanceVerify: bounded distance, NULL above the cap") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fax"), // dist 1
      (3L, "the quick browner foxes"), // dist 4 from doc 1 (+er, +es)
      (4L, "completely different text entirely")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val out = DocDedup.editDistanceVerify(docs, "doc_id", "text", pairs, cap = 6)
      .orderBy("id2")
      .select($"id2", $"dist", $"sim").as[(Long, Option[Long], Option[Double])]
      .collect()
    assert(out(0) == ((2L, Some(1L), Some(math.rint((1.0 - 1.0 / 19) * 1e6) / 1e6))))
    assert(out(1)._2.contains(4L), "within the cap")
    assert(out(2)._2.isEmpty && out(2)._3.isEmpty, "over-cap pair surfaces NULL")
  }

  test("editDistanceVerify normalizes whitespace/case before comparing") {
    val docs = Seq((1L, "  Hello   World "), (2L, "hello world")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val d = DocDedup.editDistanceVerify(docs, "doc_id", "text", pairs, cap = 3)
      .select("dist").as[Option[Long]].head()
    assert(d.contains(0L))
  }

  test("containmentPairs: a subset document scores 1.0 where jaccard ≈ small") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, "totally unrelated words here now"))
      .toDF("doc_id", "text")
    val out = DocDedup.containmentPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 1.0)), "every short-doc shingle is contained")
    val jac = DocDedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5).count()
    assert(jac == 0, "jaccard misses the same subset pair")
  }

  test("containmentPairs: over-cap shingles re-verify exactly for emitted pairs") {
    // the leading shingle is shared by all 4 docs; with cap 3 its bucket
    // is dropped from pair counting, every doc is "hot", and pairs that
    // still surface through in-cap shingles re-verify with the exact sets
    val common = "zeta eta theta"
    val docs = Seq(
      (1L, common + " a b c"), (2L, common + " a b d"),
      (3L, common + " x y z"), (4L, common + " p q r")).toDF("doc_id", "text")
    def run(cap: Int): Map[(Long, Long), Double] =
      DocDedup.containmentPairs(docs, "doc_id", "text",
          n = 3, threshold = 0.1, maxShingleDf = cap)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => ((a, b), c) }.toMap
    val capped = run(3)
    val exact = run(5000)
    // docs 1,2 share 3 of 4 shingles -> exact containment 0.75 — and the
    // capped run must report the SAME value (re-verified, not the 2-of-4
    // undercount the capped counting alone would produce)
    assert(capped.get((1L, 2L)).contains(0.75))
    for ((pair, c) <- capped)
      assert(exact(pair) == c, s"capped value drifted for $pair")
    // pairs linked ONLY through the over-cap shingle are a documented
    // recall loss of the cap, never a wrong value
    assert(!capped.contains((1L, 3L)) && exact((1L, 3L)) == 0.25)
  }

  test("hll: estimate tracks true cardinality; duplicates are free") {
    val keys = (1 to 20000).map(i => ("g", s"key-$i")).toDF("g", "k")
    val regs = DocDedup.hllRegisters(keys, "k", Seq("g"), p = 12)
    assert(regs.count() <= 4096, "register table is metadata-sized")
    val est = DocDedup.hllEstimate(regs, Seq("g"), p = 12)
      .select("est").as[Double].head()
    assert(math.abs(est - 20000) / 20000 < 0.05,
      s"raw HLL at p=12 should land within ~5%: $est")
    // max() idempotence: tripling every key changes nothing
    val dupRegs = DocDedup.hllRegisters(
      keys.union(keys).union(keys), "k", Seq("g"), p = 12)
    val dupEst = DocDedup.hllEstimate(dupRegs, Seq("g"), p = 12)
      .select("est").as[Double].head()
    assert(dupEst == est, "duplicates must not move the estimate")
  }

  test("readability: ttr, sentences, syllables, flesch hand-checked") {
    import graft.functions.{TextFunctions => TF}
    val df = Seq("The cat sat. The cat ran!", "word").toDF("text")
      .select(TF.typeTokenRatio(col("text")).as("ttr"),
        TF.sentenceCount(col("text")).as("sc"),
        TF.syllableCount(col("text")).as("sy"),
        TF.fleschReadingEase(col("text")).as("fl"))
      .as[(Double, Int, Int, Double)].collect()
    // "the cat sat. the cat ran!" -> 6 tokens, 4 distinct ("sat." != "ran!")
    assert(df(0)._1 == 4.0 / 6.0)
    assert(df(0)._2 == 2, "two terminator runs")
    assert(df(0)._3 == 6, "one vowel group per word")
    assert(df(1)._2 == 1, "no terminator floors at one sentence")
    val expect = 206.835 - 1.015 * (1.0 / 1.0) - 84.6 * (1.0 / 1.0)
    assert(math.abs(df(1)._4 - expect) < 1e-9)
  }

  test("segments: non-overlapping n-token windows, trailing partial kept") {
    val df = Seq(("a b c d e f g h"), ("x y"), ("")).toDF("text")
      .select(DocDedup.segments(col("text"), 3).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "d e f", "g h"))
    assert(rows(1) == Seq("x y"))
    assert(rows(2) == Nil, "empty text yields no segments")
  }

  test("stripCommonSegments removes corpus-common segments in order") {
    // segment width 2; "aa bb" appears in 3 docs -> boilerplate at minDocs=3
    val docs = Seq(
      (1L, "aa bb cc dd"),
      (2L, "aa bb ee ff"),
      (3L, "zz yy aa bb"), // segments ("zz yy", "aa bb") — aligned here too
      (4L, "qq rr ss")).toDF("doc_id", "text")
    val out = DocDedup.stripCommonSegments(docs, "doc_id", "text", n = 2, minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 1L, "cc dd")))
    assert(out(1) == ((2L, 2L, 1L, "ee ff")))
    assert(out(2) == ((3L, 2L, 1L, "zz yy")))
    assert(out(3) == ((4L, 2L, 0L, "qq rr ss")), "uncommon segments all kept")
  }

  test("stripCommonSegments: a fully-boilerplate doc comes back empty") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b")).toDF("doc_id", "text")
    val out = DocDedup.stripCommonSegments(docs, "doc_id", "text", n = 2, minDocs = 3)
      .select("n_removed", "cleaned").as[(Long, String)].collect()
    assert(out.forall(_ == ((1L, ""))))
  }

  test("corpusDiff: added/removed/changed/unchanged by fingerprint") {
    val v1 = Seq((1L, "same text"), (2L, "old text"), (3L, "gone"))
      .toDF("doc_id", "text")
    val v2 = Seq((1L, " Same  TEXT "), (2L, "new text"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val got = DocDedup.corpusDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // normalization makes doc 1 unchanged despite case/spacing drift
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("exciseBenchmarkSegments: benchmark spans cut, clean text intact") {
    val docs = Seq(
      (1L, "keep this text eval question here tail bit"),
      (2L, "totally clean document body")).toDF("doc_id", "text")
    val bench = Seq((9L, "eval question here")).toDF("doc_id", "text")
    val byId = DocDedup.exciseBenchmarkSegments(docs, bench,
        "doc_id", "text", n = 3)
      .select($"doc_id", $"n_removed", $"cleaned")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 segments: "keep this text" | "eval question here" | "tail bit"
    assert(byId(1L) == ((1L, "keep this text tail bit")))
    assert(byId(2L) == ((0L, "totally clean document body")))
  }

  test("count-min sketch: estimates upper-bound true counts, exact when sparse") {
    val stream = (Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("i", "k")
    val keys = stream.select($"k")
    val cms = DocDedup.cmsBuild(keys, "k", width = 64, depth = 3)
    // cell mass per row equals the stream length
    val rowMass = cms.groupBy($"r").sum("cnt").collect().map(_.getLong(1))
    assert(rowMass.toSeq == Seq(14L, 14L, 14L))
    val est = DocDedup.cmsEstimate(keys.distinct(), "k", cms, 64, 3)
      .as[(String, Long)].collect().toMap
    // wide sketch, 3 keys: no collisions -> exact
    assert(est == Map("a" -> 10L, "b" -> 3L, "c" -> 1L))
    // unseen keys estimate 0 with this sparse table
    val unseen = DocDedup.cmsEstimate(Seq("zz").toDF("k"), "k", cms, 64, 3)
      .as[(String, Long)].collect()
    assert(unseen.head._2 == 0L)
  }

  test("bloom sketch: no false negatives, metadata-sized, empty rejects") {
    val corpus = (1 to 50).map(i => (i.toLong, s"member key $i"))
      .toDF("id", "k")
    val bloom = DocDedup.bloomBuild(corpus, "k", mBits = 1200, kHashes = 3)
    // the sketch is metadata-sized: at most ceil(1200/60) words, none empty
    val words = bloom.collect()
    assert(words.length <= 20)
    assert(words.forall(_.getLong(1) != 0L))
    // every member probes maybe=true (a Bloom filter NEVER misses)
    val probeAll = (1 to 80).map(i => (i.toLong, s"member key $i"))
      .toDF("id", "k")
    val got = DocDedup.bloomProbe(probeAll, "id", "k", bloom, 1200, 3)
      .as[(Long, Boolean)].collect().toMap
    assert((1 to 50).forall(i => got(i.toLong)), "member missed")
    // non-members mostly reject at this fill rate; the exact count is
    // deterministic (integer bit math) — pin it far below the batch
    val fps = (51 to 80).count(i => got(i.toLong))
    assert(fps < 10, s"suspicious false-positive count $fps")
    // probing the empty sketch rejects everything
    val empty = DocDedup.bloomBuild(corpus.filter(col("id") < 0), "k", 1200, 3)
    val e = DocDedup.bloomProbe(probeAll, "id", "k", empty, 1200, 3)
      .as[(Long, Boolean)].collect()
    assert(e.forall(!_._2))
  }
}
