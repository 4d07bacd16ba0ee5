package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Document deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard verification.
  *
  * Scale design: every stage is a hash-partitioned groupBy/join (no
  * driver-side collection, no cross join). Candidate generation is
  * band-bucketed so the pairwise stage only ever sees documents that
  * collide in a bucket — the standard way exact-quadratic dedup becomes
  * tractable at 100 TB.
  *
  * Performance shape: Spark higher-order functions (transform/aggregate)
  * are CodegenFallback, and CollapseProject re-inlines any cheap projection
  * — so the expensive md5 token hashing is ALWAYS hoisted into its own
  * projection referenced many times (CollapseProject keeps non-cheap
  * multi-referenced producers separate), computed once per row. Candidate
  * pair generation is one explode + one groupBy(collect_list) instead of a
  * bucket self-join: the self-join would both shuffle twice and recompute
  * the whole upstream signature pipeline once per side.
  */
object DocDedup {

  // ----------------------------------------------------------- exact dedup

  /** Exact duplicate groups by normalized-text MD5. Returns
    * (hash, keeper_id, dup_count); join back to drop non-keepers. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(normalize(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Keep one representative per exact-duplicate group. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("keeper_id").as(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------- helpers

  /** Expand each bucket's sorted member array into all ordered pairs
    * (i < j) as ROWS, with per-row memory bounded by ONE member list:
    * posexplode to a row per member, then explode that member's tail
    * slice. A single flattened pairs-array per bucket would be quadratic
    * in bucket size inside one row value (a 10⁴-member bucket ≈ 5×10⁷
    * structs, gigabytes, in one row) — this shape streams the same pairs
    * through rows the executor can spill. Still one shuffle, no self-join
    * (the tail slice reuses the collected list).
    *
    * PRECONDITION: array elements must be non-null (r16 advice note —
    * the per-row `__y.isNotNull` filter below drops null TAIL elements
    * before `mk`, where the pre-r15 `transform` form would have passed
    * them through as `mk(x, null)` rows; every caller collects
    * non-null structs, so the equivalence holds only under this
    * contract). */
  private def explodePairs(buckets: DataFrame, xs: String)(
      mk: (Column, Column) => Column): DataFrame =
    // *_outer + post-filter, not bare explode/posexplode: the optimizer
    // infers `size(arr) > 0` from a bare generator and pushes it down
    // with the generator-input EXPRESSION inlined into a per-row Filter,
    // re-materializing every pair-struct array a second time (the hot
    // path of every dedup family member).
    // r15: the tail slice is exploded FIRST and `mk` applied per pair ROW
    // — the previous `transform(slice(...), y => mk(__x, y))` evaluated
    // mk inside a higher-order-function lambda, i.e. one interpreted
    // expression-tree walk PER PAIR on the quadratic expansion stage
    // (guide §4); as a row projection it runs in whole-stage codegen.
    // Same rows: slice/explode stream identically, and mk is a pure
    // struct/getField composition in every caller.
    // NOT repartitioned (r16, measured): an explicit
    // repartition(defaultParallelism) here — to undo AQE's byte-based
    // coalescing of the CPU-dense expansion onto 1-2 tasks — REGRESSED
    // every explodePairs consumer at sf0.1 by 0.1-0.6 s (filtered bench,
    // min-of-3: minhash_lsh 1.51→2.17, ngram_jaccard 1.23→1.62,
    // blocking_eval 2.03→2.46): the extra exchange + its
    // sort-before-repartition + one more AQE stage cost more than the
    // 1-2 s of single-core expansion it parallelizes. At real scale the
    // bucket frame's BYTES grow with the corpus and AQE already assigns
    // the stage real parallelism, so the repartition would buy nothing
    // there either.
    buckets
      .select(col(xs).as("__xs"), posexplode_outer(col(xs)).as(Seq("__i", "__x")))
      .filter(col("__x").isNotNull)
      .select(col("__x"), explode_outer(
        slice(col("__xs"), col("__i") + lit(2), size(col("__xs")))).as("__y"))
      .filter(col("__y").isNotNull)
      .select(mk(col("__x"), col("__y")).as("p"))
      .filter(col("p").isNotNull)

  // ------------------------------------------------------------- minhash

  /** Universal-hash permutation parameters: deterministic (seeded)
    * multipliers/addends modulo the Mersenne prime 2^31-1. The 31-bit
    * prime keeps `h*a + b` under 2^63 so the arithmetic is exact in ANSI
    * long math (and reproducible in any 64-bit engine, e.g. the oracle). */
  case class MinHashParams(numPerms: Int, bands: Int) {
    require(numPerms % bands == 0, "bands must divide numPerms")
    val prime: Long = 2147483647L // 2^31 - 1
    val rowsPerBand: Int = numPerms / bands
    // fixed linear-congruential sequence for (a,b) — deterministic across
    // runs and engines
    val abs: Seq[(Long, Long)] = {
      var x = 0x5DEECE66DL
      def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 33 }
      (0 until numPerms).map { _ => (next() % (prime - 1) + 1, next() % prime) }
    }
  }

  /** Per-document MinHash signature as `numPerms` LONG columns `mh_i`.
    *
    * r16: computed by the native [[graft.functions.MinHashSigExpr]]
    * kernel — one codegen'd pass per document over its distinct shingles,
    * all permutation minima tracked in registers. The r15 exploded
    * formulation (explode shingles → hash → groupBy(id).agg(numPerms ×
    * min)) paid a hash-aggregate probe plus numPerms expression-tree
    * min-updates per SHINGLE row and then one Exchange of the signature
    * partials; the kernel removes both the per-row aggregate machinery
    * AND the shuffle — the signature frame is now a pure projection of
    * the corpus scan (zero exchanges) in every MinHash/LSH query.
    * Identical values (integer arithmetic, order-free min — pinned by
    * MinHashSigSpec) and the same all-null convention for shingle-less
    * docs. Assumes unique ids per row, which the old groupBy(id) did not
    * (it merged duplicate ids' shingle sets) — every engine caller feeds
    * unique-id corpora; see the kernel scaladoc. */
  def signatures(docs: DataFrame, idCol: String, textCol: String, n: Int,
      p: MinHashParams): DataFrame = {
    val sig = org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.MinHashSigExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(col(textCol)),
        n, p.abs, p.prime))
    // __sig is a non-cheap multi-referenced producer: CollapseProject
    // keeps it in its own projection (the file-header hoisting note), so
    // the kernel runs once per row and the numPerms element_at reads are
    // cheap codegen'd array loads
    docs.select(col(idCol), sig.as("__sig"))
      .select(col(idCol) +: (0 until p.numPerms).map(i =>
        element_at(col("__sig"), i + 1).as(s"mh_$i")): _*)
  }

  /** (id, bucket) band-bucket rows from a signature frame: one row per
    * (doc, band) via a single explode — NOT a `bands`-way union, which
    * would recompute the signature pipeline once per band. This is also
    * the PERSISTABLE shape of an LSH index (see [[lshIndex]]). */
  private def bandBuckets(sigs: DataFrame, idCol: String,
      p: MinHashParams): DataFrame = {
    val bandKeys = (0 until p.bands).map { b =>
      val cols = (b * p.rowsPerBand until (b + 1) * p.rowsPerBand).map(i => col(s"mh_$i"))
      md5(concat_ws(",", lit(b.toString) +: cols: _*))
    }
    sigs.select(col(idCol), explode(array(bandKeys: _*)).as("bucket"))
  }

  /** LSH candidate pairs: equal signature slice in >= 1 band; bucket
    * members are collected and expanded to pairs.
    *
    * `maxBucket` bounds the per-bucket pair expansion (quadratic in
    * bucket size): a bucket beyond it means the band hash degenerated
    * (e.g. empty documents sharing an all-identical signature slice) and
    * its pairs would be noise at quadratic cost, so it is dropped —
    * standard LSH practice and the difference between bounded memory and
    * one executor materializing billions of structs at corpus scale.
    *
    * RECALL CAVEAT (r13 default change, 10000 -> 2048): over-cap buckets
    * are dropped OUTRIGHT — there is no exact re-verify repair path here
    * (unlike [[ngramJaccardPairs]], whose over-cap shingles re-verify
    * pair-exactly). A genuine near-dup cluster larger than `maxBucket`
    * loses its intra-cluster candidate pairs unless another, smaller
    * band bucket recovers them. Callers who expect dup clusters in the
    * (2048, 10000] range should raise `maxBucket` explicitly or run
    * [[connectedComponents]] over multiple bands' survivors. */
  def lshCandidates(sigs: DataFrame, idCol: String, p: MinHashParams,
      maxBucket: Int = 2048): DataFrame = {
    val buckets = bandBuckets(sigs, idCol, p)
      .groupBy("bucket").agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    explodePairs(buckets, "ids")((x, y) => struct(x.as("id1"), y.as("id2")))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .distinct()
  }

  /** The reusable LSH index of a corpus: (id, bucket) rows, computed once
    * per corpus build and persisted (parquet, bucketed by `bucket`) so
    * incoming batches dedup against it WITHOUT re-shingling the corpus —
    * the incremental posture that matters when the corpus is 100 TB and
    * the daily batch is 0.1% of it. */
  def lshIndex(docs: DataFrame, idCol: String, textCol: String, n: Int,
      p: MinHashParams): DataFrame =
    bandBuckets(signatures(docs, idCol, textCol, n, p), idCol, p)

  /** Incremental near-dup detection: match a NEW batch against an
    * existing corpus index ([[lshIndex]] output — pass the persisted
    * frame) plus the corpus texts for verification. Returns
    * (id1 = corpus doc, id2 = new doc, jaccard) pairs at `threshold`.
    *
    * Scale shape: only the BATCH is shingled/signed (corpus work was paid
    * once at index build); candidates come from one equality join on the
    * bucket key — the batch side is small, so AQE broadcasts it and the
    * corpus index is never shuffled; verification re-reads texts for the
    * candidate ids only (semi-join restriction inside verifyJaccard).
    * Batch-internal duplicates are [[minHashDedupPairs]] on the batch
    * alone — compose the two for full coverage. */
  def incrementalNearDups(corpus: DataFrame, index: DataFrame,
      newDocs: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, p: MinHashParams): DataFrame = {
    val newBuckets =
      bandBuckets(signatures(newDocs, idCol, textCol, n, p), idCol, p)
        .withColumnRenamed(idCol, "__new_id")
    val cands = index.join(newBuckets, "bucket")
      .select(col(idCol).as("id1"), col("__new_id").as("id2"))
      .distinct()
    val texts = corpus.select(col(idCol), col(textCol))
      .unionByName(newDocs.select(col(idCol), col(textCol)))
    verifyJaccard(texts, cands, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------------ winnowing

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS
    * algorithm): hash every word-`n`-gram, then keep the MINIMUM hash of
    * each sliding window of `w` consecutive n-gram hashes. The guarantee:
    * any shared run of `w + n - 1` tokens between two documents shares at
    * least one fingerprint, while expected density is only `2/(w+1)` —
    * the corpus-scale alternative to indexing EVERY shingle (the inverted
    * index shrinks ~w/2-fold with a detection-length guarantee instead of
    * LSH's probabilistic recall).
    *
    * Returns one row per (id, fingerprint) — distinct per document. The
    * selection is per-row array math (zero shuffles); ties inside a
    * window resolve to the hash value itself (min over longs), so the
    * fingerprint SET is deterministic and engine-reproducible. */
  def winnowedFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int): DataFrame = {
    require(w >= 1, "winnow window must be >= 1")
    // multiplicity-preserving n-gram hashes in document order (ngrams,
    // not the distinct shingles — windows are positional). The hash array
    // MUST materialize as its own column before the window transform:
    // expressions inside a higher-order lambda re-evaluate per element,
    // so inlining this would re-tokenize and re-hash the document once
    // per window position (measured ~6x the whole operator's cost).
    // explode_outer + a cheap post-filter, NOT explode: for a bare
    // explode the optimizer infers `size(arr) > 0` and pushes it below
    // the projections, substituting the whole fingerprint expression
    // into a per-row Filter — which re-evaluates the window lambda with
    // the n-gram hashing inlined (measured ~20x the operator's cost)
    winnowedFpArray(docs, idCol, textCol, n, w)
      .select(col(idCol), explode_outer(col("__fps")).as("fp"))
      .filter(col("fp").isNotNull)
  }

  /** (id, __fps array) form of [[winnowedFingerprints]] — lets callers
    * derive the per-document set size without a second corpus pass. */
  private def winnowedFpArray(docs: DataFrame, idCol: String,
      textCol: String, n: Int, w: Int): DataFrame =
    // r16: native WinnowFpExpr kernel — one codegen'd O(#ngrams) pass
    // (monotonic-deque window minima) replacing the composed
    // ngram-hash transform + O(#ngrams · w) interpreted window walk;
    // identical fingerprint sets (pinned by TextKernelsSpec)
    docs.select(col(idCol),
      org.apache.spark.sql.graft.ColumnBridge.fromExpr(
        graft.functions.WinnowFpExpr(
          org.apache.spark.sql.graft.ColumnBridge.toExpr(col(textCol)), n, w))
        .as("__fps"))

  /** Near-dup candidate pairs from winnowed fingerprints: documents
    * sharing >= `minShared` fingerprints, with the shared count and each
    * side's fingerprint-set size (containment = shared/least(n1, n2)).
    * Same one-shuffle inverted-index shape as [[ngramJaccardPairs]], but
    * over the ~w/2-fold sparser winnowed sets — this is what makes exact
    * (non-LSH) pair detection affordable at corpus scale. `maxFpDf`
    * bounds the quadratic bucket expansion exactly like the shingle cap
    * there.
    *
    * RECALL CAVEAT (r13 default change, 5000 -> 512): fingerprints with
    * df > `maxFpDf` are dropped from the index with NO repair path (the
    * exact re-verify in [[ngramJaccardPairs]] has no analog here), so
    * the shared-fingerprint count UNDERCOUNTS for pairs whose overlap
    * runs through hot fingerprints — a pair can fall below `minShared`
    * and be missed. Raise `maxFpDf` explicitly when boilerplate-heavy
    * corpora (many docs sharing hot spans) must still pair up. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, w: Int, minShared: Long, maxFpDf: Int = 512): DataFrame = {
    // set size rides along with the explode — ONE corpus pass, no
    // per-doc-count join (which would recompute the fingerprint pipeline:
    // the doc-count side broadcasts, so no exchange reuse applies)
    val indexed = winnowedFpArray(docs, idCol, textCol, n, w)
      .select(col(idCol), size(col("__fps")).cast("long").as("nf"),
        explode_outer(col("__fps")).as("fp")) // see winnowedFingerprints
      .filter(col("fp").isNotNull)
    val buckets = indexed.groupBy("fp")
      .agg(sort_array(collect_list(struct(col(idCol), col("nf")))).as("xs"))
      .filter(size(col("xs")) > 1 && size(col("xs")) <= maxFpDf)
    explodePairs(buckets, "xs")((x, y) =>
        struct(x.getField(idCol).as("id1"), y.getField(idCol).as("id2"),
          x.getField("nf").as("n1"), y.getField("nf").as("n2")))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.n1").as("n1"), col("p.n2").as("n2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .withColumn("containment",
        col("shared") / least(col("n1"), col("n2")).cast("double"))
  }

  // --------------------------------------------------- jaccard verification

  /** Exact word-n-gram Jaccard for given candidate pairs (id1, id2).
    * Only documents that appear in a candidate pair are shingled (semi-join
    * restriction): after LSH, candidates cover a tiny fraction of the
    * corpus, so re-scanning every document would dominate the cost. */
  def verifyJaccard(docs: DataFrame, candidates: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    pairOverlap(docs, candidates, idCol, textCol, n)
      .withColumn("jaccard",
        col("inter") / (col("n1") + col("n2") - col("inter")))
      .select(col("id1"), col("id2"), col("jaccard"))

  /** Exact max-containment for candidate pairs: |A∩B| / min(|A|,|B|). */
  def verifyContainment(docs: DataFrame, candidates: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    pairOverlap(docs, candidates, idCol, textCol, n)
      .withColumn("containment", col("inter") / least(col("n1"), col("n2")))
      .select(col("id1"), col("id2"), col("containment"))

  /** Shared verification core: exact shingle-set overlap (inter, n1, n2)
    * for the given candidate pairs, shingling only documents that appear
    * in a pair (semi-join restriction). */
  private def pairOverlap(docs: DataFrame, candidates: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val needed = candidates.select(col("id1").as(idCol))
      .union(candidates.select(col("id2").as(idCol))).distinct()
    val sh = docs.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), shingles(col(textCol), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed(idCol, "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sh.withColumnRenamed(idCol, "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .select(col("id1"), col("id2"), col("inter"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
  }

  /** End-to-end MinHash-LSH near-dup pairs with exact verification.
    * Verification references the candidate set three times (the pair join
    * + both sides of the needed-ids semi-join); no explicit persist —
    * the candidate pipeline ends in an exchange, and Spark's ReuseExchange
    * collapses the identical subtrees into one shared shuffle (measured
    * ~2x faster than materializing an in-memory cache). */
  def minHashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, p: MinHashParams): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, n, p)
    val cands = lshCandidates(sigs, idCol, p)
    verifyJaccard(docs, cands, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash sketch-accuracy audit: for every exact near-dup pair
    * (n-gram Jaccard >= `threshold`), compare the MinHash ESTIMATE — the
    * fraction of the `p.numPerms` signature components the two documents
    * agree on (an unbiased estimator of Jaccard) — against the exact
    * Jaccard it approximates. This is the QA step run before trusting an
    * LSH configuration on a new corpus: a systematic estimate gap means
    * the permutation count is too low (variance ~ J(1−J)/numPerms) for
    * the chosen banding to hit its recall target.
    *
    * Returns (id1, id2, est_jaccard, jaccard, abs_err). Scale shape: the
    * pair set is candidate-bounded (inverted-index generation with a df
    * cap, never all-pairs); signatures attach via two equality joins on
    * the id — no quadratic stage. The corpus IS shingled twice (once for
    * the exact pairs, once for the signatures: the two consumers shuffle
    * on different keys, so no exchange is reusable between them) — the
    * price of auditing the sketch against ground truth, paid only when
    * this QA query runs, never on the dedup hot path. Determinism: the
    * estimate is matches/numPerms (an exact dyadic rational for
    * power-of-two permutation counts) and the signature arithmetic is
    * all-integer, so both engines reproduce every value bit-for-bit. */
  /** Shared audit base: exact near-dup pairs (with their jaccard) joined
    * to BOTH endpoints' MinHash signatures, signature columns suffixed
    * `_1`/`_2` by pair side — the frame both sketch audits compare on. */
  private def pairsWithSignatures(docs: DataFrame, idCol: String,
      textCol: String, n: Int, threshold: Double,
      p: MinHashParams): DataFrame = {
    val pairs = ngramJaccardPairs(docs, idCol, textCol, n, threshold)
    val sigs = signatures(docs, idCol, textCol, n, p)
    val s1 = sigs.toDF(sigs.columns.map(c =>
      if (c == idCol) "id1" else s"${c}_1"): _*)
    val s2 = sigs.toDF(sigs.columns.map(c =>
      if (c == idCol) "id2" else s"${c}_2"): _*)
    pairs.join(s1, "id1").join(s2, "id2")
  }

  def minHashEstimateAudit(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, p: MinHashParams): DataFrame = {
    val matches = (0 until p.numPerms)
      .map(i => when(col(s"mh_${i}_1") === col(s"mh_${i}_2"), 1).otherwise(0))
      .reduce(_ + _)
    pairsWithSignatures(docs, idCol, textCol, n, threshold, p)
      .select(col("id1"), col("id2"),
        (matches.cast("double") / lit(p.numPerms)).as("est_jaccard"),
        col("jaccard"))
      .withColumn("abs_err", abs(col("est_jaccard") - col("jaccard")))
  }

  /** LSH S-curve audit: for each exact near-dup pair, the THEORETICAL
    * banding collision probability `1 − (1 − j^r)^b` (the S-curve every
    * LSH tuning chart plots) next to whether the pair ACTUALLY collided
    * in ≥ 1 band of this corpus's signatures — the before/after view of
    * an LSH configuration decision (dedup_minhash_accuracy audits the
    * estimator; this audits the banding).
    *
    * Determinism: the power chain is spelled as explicit squarings
    * (j², then (1−j²) squared log₂(bands) times for the power-of-two
    * band counts this supports), so both engines run the IDENTICAL
    * IEEE multiply sequence — no libm pow. Collision is an all-integer
    * comparison of band signature slices. Returns
    * (id1, id2, jaccard, theory_p, collided). */
  def lshSCurveAudit(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, p: MinHashParams): DataFrame = {
    require(Integer.bitCount(p.bands) == 1,
      s"power-of-two band count required for the exact power chain, got ${p.bands}")
    val collided = (0 until p.bands).map { b =>
      (b * p.rowsPerBand until (b + 1) * p.rowsPerBand)
        .map(i => col(s"mh_${i}_1") === col(s"mh_${i}_2"))
        .reduce(_ && _)
    }.reduce(_ || _)
    // j^r by repeated multiplication, then (1 - j^r)^bands by squaring
    val jr = (1 to p.rowsPerBand).map(_ => col("jaccard")).reduce(_ * _)
    val miss = (1 to Integer.numberOfTrailingZeros(p.bands))
      .foldLeft(lit(1.0) - jr)((x, _) => x * x)
    pairsWithSignatures(docs, idCol, textCol, n, threshold, p)
      .select(col("id1"), col("id2"), col("jaccard"),
        (lit(1.0) - miss).as("theory_p"), collided.as("collided"))
  }

  /** Exact n-gram Jaccard near-dup pairs from a single shingling of the
    * corpus. |A∩B| is counted as pair multiplicity in the inverted
    * shingle index (the pair appears once per shared shingle); each doc's
    * shingle count rides along in the index rows (struct(id, n)) so
    * |A∪B| = n1 + n2 - inter needs no extra corpus scan.
    *
    * `maxShingleDf` bounds the quadratic bucket expansion: a shingle
    * shared by d documents contributes d(d-1)/2 index pairs, so one
    * stopword-like trigram with df 10⁵ would alone emit ~5×10⁹ pair rows.
    * The cap must stay SMALL relative to the corpus, not scale with it:
    * a bucket just UNDER the cap emits ~cap²/2 pair rows, and the number
    * of near-cap buckets grows with corpus size, so worst-case emitted
    * volume is (#hot buckets)·cap²/2 — at cap 5000 that is 12.5M rows
    * per bucket, which the r13 ×100 scale run measured as a 31 GB
    * shuffle on a 1.7 GB corpus. 512 bounds a bucket at ~131k rows
    * while still dwarfing any plausible near-dup cluster (a genuine
    * cluster of >512 mutual near-dups is an exactDedup case); the r13
    * audit measured max trigram df = 25 at sf0.1, so results at the
    * test SFs are bit-identical under any cap ≥ 26.
    * Buckets over the cap are excluded from pair COUNTING — but exactness
    * is preserved for every emitted pair: documents containing an
    * over-cap shingle are marked, and candidate pairs where BOTH ends are
    * marked (the only pairs whose intersection count could have lost
    * shared over-cap shingles) are re-verified with a full exact Jaccard
    * (verifyJaccard) instead of the undercount. The only loss is RECALL
    * for pairs whose every shared shingle is over-cap — i.e. both docs
    * built entirely from corpus-hot n-grams, which at a near-dup
    * threshold means a cluster of >maxShingleDf mutual near-dups
    * (handle those with exactDedup first). With no over-cap shingles the
    * marked set is empty and the plan degenerates to pure pair counting. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Int = 512): DataFrame = {
    val shArr = shingles(col(textCol), n)
    val sh = docs.select(col(idCol).as("id"), shArr.as("__sh"))
      .select(col("id"), explode_outer(col("__sh")).as("s"), // see explodePairs
        size(col("__sh")).as("n"))
      .filter(col("s").isNotNull)
    val buckets = sh.groupBy("s")
      .agg(sort_array(collect_list(struct(col("id"), col("n")))).as("xs"))
    val counted = explodePairs(
        buckets.filter(size(col("xs")) > 1 && size(col("xs")) <= maxShingleDf),
        "xs")((x, y) =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
          x.getField("n").as("n1"), y.getField("n").as("n2")))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.n1").as("n1"), col("p.n2").as("n2"))
      .agg(count(lit(1)).cast("double").as("inter"))
    // docs whose intersection counts may be missing over-cap shingles
    val hot = buckets.filter(size(col("xs")) > maxShingleDf)
      .select(explode(col("xs")).as("x"))
      .select(col("x.id").as("id")).distinct()
    // materialize the marked pair frame ONCE (r15, measured): the clean
    // and re-verify branches prune DIFFERENT columns from `counted`
    // (jaccard needs n1/n2/inter, the re-verify candidates only id1/id2),
    // so their subtrees canonicalize differently and ReuseExchange cannot
    // collapse them — the whole quadratic bucket expansion ran TWICE (two
    // ~20 MB pair exchanges of 12.5 s task time each at sf0.1, one of
    // them then discarded outright by AQE empty-propagation whenever no
    // shingle is over-cap). The pair frame is candidate-bounded
    // (≤ #buckets·cap²/2, orders below corpus size — the cap analysis
    // above), so one eager materialization strictly dominates recomputing
    // the expansion per branch at any scale.
    // localCheckpoint trade-off (r16 note): lineage is dropped and the
    // blocks live on executors, so on a real cluster an executor loss
    // mid-query fails the query instead of recomputing — acceptable for
    // a candidate-bounded intra-query intermediate (the recovery
    // alternative IS the per-branch quadratic recomputation this
    // removes); revisit if the engine ever targets preemptible executors.
    val marked = counted
      .join(hot.select(col("id").as("id1"), lit(true).as("__h1")), Seq("id1"), "left")
      .join(hot.select(col("id").as("id2"), lit(true).as("__h2")), Seq("id2"), "left")
      .localCheckpoint()
    val clean = marked.filter(col("__h1").isNull || col("__h2").isNull)
      .select(col("id1"), col("id2"),
        (col("inter") / (col("n1") + col("n2") - col("inter"))).as("jaccard"))
    val reverified = verifyJaccard(docs,
      marked.filter(col("__h1").isNotNull && col("__h2").isNotNull)
        .select(col("id1"), col("id2")),
      idCol, textCol, n)
    clean.union(reverified).filter(col("jaccard") >= threshold)
  }

  /** IDF-weighted n-gram Jaccard near-dup pairs: shared boilerplate
    * shingles (headers, license blurbs, navigation chrome) inflate plain
    * Jaccard; weighting every shingle by its corpus IDF
    * (`floor(ln((N+1)/(df+1))·1e6 + 0.5)`, an integer micro weight) makes
    * the score `Σ_{shared} w / (W_A + W_B − Σ_shared w)` count shared
    * CONTENT, with hot shingles contributing ≈0 by construction. The
    * weighted score is the min/max form of weighted Jaccard restricted to
    * set (0/1) multiplicities — the standard boilerplate-robust variant.
    *
    * Same one-shuffle inverted-index shape as [[ngramJaccardPairs]]:
    * buckets carry df (so the weight is computed once per shingle, on the
    * index side), per-doc weight totals ride one aggregate of the same
    * exploded frame, and `maxShingleDf` bounds the quadratic bucket
    * expansion. Pairs sharing ONLY over-cap shingles are missed
    * (recall-only loss, and exactly the pairs whose shared weight is
    * lowest — the IDF of a df > maxShingleDf shingle is the corpus floor);
    * over-cap shingles still count toward each document's W total. The
    * threshold verdict is an exact integer cross-multiplication
    * (`winter·1e6 ≥ t_micro·(W1+W2−winter)`), never a raw float compare.
    * Returns (id1, id2, wjaccard). */
  def weightedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Int = 512): DataFrame = {
    val nDocs = broadcast(docs.agg(count(lit(1)).as("__n")))
    val sh = docs.select(col(idCol).as("id"),
        explode_outer(shingles(col(textCol), n)).as("s")) // see explodePairs
      .filter(col("s").isNotNull)
    val buckets = sh.groupBy("s")
      .agg(sort_array(collect_list(struct(col("id")))).as("xs"))
      .withColumn("df", size(col("xs")))
      .crossJoin(nDocs)
      // ln((N+1)/(df+1)): long-to-double division is one correctly-rounded
      // IEEE op and ln rides the same libm contract the tf-idf family
      // already pins cross-engine; the floor(·1e6+0.5) micro weight is the
      // quantity every sum below accumulates exactly
      .withColumn("w", floor(
        log((col("__n") + lit(1L)).cast("double") / (col("df") + lit(1L)))
          * lit(1e6) + lit(0.5)).cast("long"))
      // single materialization of the weighted index (r16): its two
      // consumers — the per-doc weight totals and the pair counting —
      // prune DIFFERENT columns, the subtrees canonicalize differently,
      // ReuseExchange cannot collapse them, and the full shingle→index
      // corpus pass ran TWICE (the ngramJaccardPairs two-consumer shape,
      // r15). The frame is the df-capped inverted index the pair stage
      // must materialize anyway; storing it once beats recomputing the
      // corpus shuffle per branch at any scale. localCheckpoint trades
      // lineage for that: on executor loss the query fails instead of
      // recomputing — acceptable for an intra-query intermediate (the
      // alternative IS the double corpus pass this removes).
      .select(col("xs"), col("df"), col("w"))
      .localCheckpoint()
    val docW = buckets
      .select(explode(col("xs")).as("x"), col("w"))
      .groupBy(col("x.id").as("id"))
      .agg(sum(col("w")).as("wsum"))
    val counted = explodePairs(
        buckets.filter(col("df") > 1 && col("df") <= maxShingleDf)
          .withColumn("xs", transform(col("xs"),
            x => struct(x.getField("id").as("id"), col("w").as("w")))),
        "xs")((x, y) =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
          x.getField("w").as("w")))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(sum(col("p.w")).as("winter"))
    val tMicro = math.rint(threshold * 1e6).toLong
    counted
      .join(docW.select(col("id").as("id1"), col("wsum").as("w1")), "id1")
      .join(docW.select(col("id").as("id2"), col("wsum").as("w2")), "id2")
      .filter(col("winter") * lit(1000000L) >=
        lit(tMicro) * (col("w1") + col("w2") - col("winter")))
      .select(col("id1"), col("id2"),
        (col("winter").cast("double") /
          (col("w1") + col("w2") - col("winter")).cast("double"))
          .as("wjaccard"))
  }

  /** Asymmetric near-dup pairs by shingle CONTAINMENT (Broder 1997):
    * max-containment |A∩B| / min(|A|,|B|). Jaccard misses subset
    * duplication — a document embedded verbatim inside a much longer one
    * scores |A|/|B| ≈ 0 Jaccard but 1.0 containment — so this is the
    * metric for quote/inclusion detection. Same one-shuffle inverted
    * shingle index as ngramJaccardPairs, same `maxShingleDf` bound on the
    * quadratic bucket expansion, and the same exactness repair: pairs
    * whose BOTH ends contain an over-cap shingle are re-verified with the
    * exact set intersection instead of the undercount. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Int = 512): DataFrame = {
    val shArr = shingles(col(textCol), n)
    val sh = docs.select(col(idCol).as("id"), shArr.as("__sh"))
      .select(col("id"), explode_outer(col("__sh")).as("s"), // see explodePairs
        size(col("__sh")).as("n"))
      .filter(col("s").isNotNull)
    val buckets = sh.groupBy("s")
      .agg(sort_array(collect_list(struct(col("id"), col("n")))).as("xs"))
    val counted = explodePairs(
        buckets.filter(size(col("xs")) > 1 && size(col("xs")) <= maxShingleDf),
        "xs")((x, y) =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
          x.getField("n").as("n1"), y.getField("n").as("n2")))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"),
        col("p.n1").as("n1"), col("p.n2").as("n2"))
      .agg(count(lit(1)).cast("double").as("inter"))
    val hot = buckets.filter(size(col("xs")) > maxShingleDf)
      .select(explode(col("xs")).as("x"))
      .select(col("x.id").as("id")).distinct()
    // single materialization of the pair frame — same two-branch
    // column-pruning divergence as ngramJaccardPairs above (see the r15
    // note there, incl. the localCheckpoint executor-loss trade-off):
    // without it the quadratic expansion runs once per branch
    val marked = counted
      .join(hot.select(col("id").as("id1"), lit(true).as("__h1")), Seq("id1"), "left")
      .join(hot.select(col("id").as("id2"), lit(true).as("__h2")), Seq("id2"), "left")
      .localCheckpoint()
    val clean = marked.filter(col("__h1").isNull || col("__h2").isNull)
      .select(col("id1"), col("id2"),
        (col("inter") / least(col("n1"), col("n2"))).as("containment"))
    val reverified = verifyContainment(docs,
      marked.filter(col("__h1").isNotNull && col("__h2").isNotNull)
        .select(col("id1"), col("id2")),
      idCol, textCol, n)
    clean.union(reverified).filter(col("containment") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 60-bit SimHash over whitespace tokens (md5-based token hashes): bit j
    * of the signature is 1 iff the sum over DISTINCT tokens of ±1 (by bit
    * j of the token hash) is positive. Single pass: one aggregate carries
    * all 60 bit-sums in an array accumulator, so each token is hashed
    * exactly once (a per-bit formulation would re-run the md5 hashing 60
    * times). Pure column arithmetic — no explode, no shuffle. */
  def simHash(text: Column, bits: Int = 60): Column =
    // r15: native codegen kernel (one pass per document) replacing the
    // composed form, whose bits-wide interpreted zip_with ran once PER
    // TOKEN. Identical signatures (integer ±1 sums are order-free and the
    // token pipeline is the same normalize/split/distinct/hash60 chain) —
    // pinned by VecKernelsSpec.
    org.apache.spark.sql.graft.ColumnBridge.fromExpr(
      graft.functions.SimHashExpr(
        org.apache.spark.sql.graft.ColumnBridge.toExpr(text), bits))

  /** SimHash near-dup pairs: bucket by 4 signature quarters (a pair within
    * hamming distance <= 3 of a 60-bit signature shares at least one exact
    * 15-bit quarter by pigeonhole), verify hamming inside buckets. The
    * signature is computed once per doc; quarters explode from it.
    *
    * RECALL CAVEAT (r13 default change, 10000 -> 2048): a quarter bucket
    * larger than `maxBucket` is dropped OUTRIGHT (no exact repair path) —
    * a pair is then found only if one of its other three quarters lands
    * in a surviving bucket. Raise `maxBucket` explicitly when near-dup
    * clusters in the (2048, 10000] range matter. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucket: Int = 2048): DataFrame = {
    val sigs = docs.select(col(idCol), simHash(col(textCol)).as("sig"))
    val quarterKeys = (0 until 4).map { q =>
      concat_ws(":", lit(q.toString),
        shiftright(col("sig"), q * 15).bitwiseAND(lit(0x7fffL)).cast("string"))
    }
    val buckets = sigs
      .select(col(idCol), col("sig"), explode(array(quarterKeys: _*)).as("bucket"))
      .groupBy("bucket")
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("sig")))).as("xs"))
      .filter(size(col("xs")) > 1 && size(col("xs")) <= maxBucket)
    explodePairs(buckets, "xs")((x, y) =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2"),
          hamming(x.getField("sig"), y.getField("sig")).as("dist")))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"), col("p.dist").as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }

  /** Hamming distance between two long signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Ensemble near-dup vote: the exact-hash, n-gram-Jaccard and SimHash
    * detectors each nominate pairs; every nominated pair surfaces with
    * its vote count and sorted signal list. The families disagree by
    * design on real corpora — exact sees byte dups, Jaccard sees shared
    * phrasing through edits, SimHash sees token-profile similarity
    * through reordering — so the vote count is the precision dial
    * (3 = certain, 1 = review queue). Each member keeps its own bounded
    * one-shuffle shape; the vote is one more pair-grain aggregate.
    * `maxHamming` ≤ 3 keeps the 4-band SimHash candidate pass EXACT
    * (pigeonhole: ≤3 differing bits leave one 15-bit band intact). */
  def ensemblePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, jaccardThreshold: Double = 0.7, maxHamming: Int = 3,
      maxShingleDf: Int = 512, maxBucket: Int = 2048): DataFrame = {
    // NOTE (r12, measured): do NOT persist() a shared (id, text) base for
    // the three members. Caching the raw text column made this 1.7× SLOWER
    // at sf0.1 (4.35 → 7.26 s min-of-5): materializing the cache serializes
    // the first member's stage graph and the cached relation blocks the
    // per-member column pruning/codegen fusion into the parquet scan,
    // while the thing it saves — three cheap parallel corpus scans — was
    // never the bottleneck (the pair-bucket shuffles are).
    //
    // NOTE (r14, profiled): plan-level sharing of a tokenized/shingled
    // base across members was the remaining hypothesis for the gap
    // between this query and its members run standalone (5.5 s vs 2.9 s
    // summed at sf0.1, same contaminated box, same run). It is refuted
    // structurally: only the Jaccard member consumes shingles at all
    // (exact uses md5(normalize(text)), simhash hashes tokens directly),
    // and the corpus-scan COUNT is identical inside the ensemble and
    // across the standalone runs — so no shared frame exists whose
    // recomputation could explain the gap. The difference is the
    // cross-member vote (union + groupBy over all pairs) plus the AQE
    // stage-materialization latency of one 11-exchange query vs three
    // small ones — inherent to voting, not waste. Recorded in
    // SCALE_r14.md; no change made.
    val hashed = docs.select(md5(normalize(col(textCol))).as("h"),
      col(idCol).as("id"))
    val exBuckets = hashed.groupBy("h")
      .agg(sort_array(collect_list(struct(col("id")))).as("xs"))
      .filter(size(col("xs")) > 1)
    val ex = explodePairs(exBuckets, "xs")((x, y) =>
        struct(x.getField("id").as("id1"), y.getField("id").as("id2")))
      .select(col("p.id1").as("id1"), col("p.id2").as("id2"))
    val ja = ngramJaccardPairs(docs, idCol, textCol, n, jaccardThreshold,
      maxShingleDf).select("id1", "id2")
    val sh = simHashPairs(docs, idCol, textCol, maxHamming, maxBucket)
      .select("id1", "id2")
    ex.withColumn("sig", lit("exact"))
      .unionByName(ja.withColumn("sig", lit("jaccard")))
      .unionByName(sh.withColumn("sig", lit("simhash")))
      .groupBy("id1", "id2")
      .agg(count(lit(1)).as("votes"),
        array_join(sort_array(collect_list(col("sig"))), ",").as("signals"))
  }

  // ----------------------------------------------- duplicate clustering

  /** Connected components over near-dup pairs (id1, id2): the final step
    * of corpus dedup, turning pairwise matches into canonical clusters so
    * "keep one per cluster" is well-defined even when A~B and B~C but A
    * and C never paired. Returns (id, cluster_id, cluster_size) for every
    * id appearing in a pair, cluster_id = min id of the component
    * (singleton docs never enter a pair and keep themselves implicitly).
    *
    * Algorithm: distributed min-label propagation with pointer jumping —
    * each round a node takes the min of its own label, its neighbors'
    * labels, AND its current label's own label (label(label(u)), the
    * parallel pointer-doubling step), so chains halve every round and
    * convergence is O(log diameter) instead of O(diameter); a path of
    * 10⁶ docs settles in ~20 rounds, and near-dup quasi-cliques in 2-3.
    * Per round: ONE edges⋈labels shuffle join + one partial-agg groupBy
    * (self-edges make the aggregate deliver both the candidate min and
    * the previous label, r15) + the pointer-jump join — no driver-side
    * graph state, edges cached once, and `localCheckpoint` truncates the
    * plan each round so lineage (and Catalyst analysis time) stays O(1)
    * in the round count. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // pairs is typically the output of an expensive candidate pipeline
    // (minhash/LSH); it feeds BOTH directions of the edge list, so pin it
    // — otherwise the whole upstream pipeline executes once per reference
    // (ReuseExchange only collapses the deepest shared exchange)
    val p = pairs.persist()
    // self-edges ride the static edge list (r15): with (u,u) present for
    // every node, one aggregate over the edges⋈labels join yields BOTH the
    // candidate label min(own, neighbors) — the self-edge delivers the
    // node's own label — AND the previous label (the self-edge's vlabel,
    // min'd over the singleton {v = u}), eliminating the per-round
    // labels-on-id join the old cand step paid. One fewer shuffle join
    // per round at any scale; labels are identical round-for-round
    // (min over {own} ∪ neighbors is the same set either way).
    val edges = p.select(col("id1").as("u"), col("id2").as("v"))
      .union(p.select(col("id2").as("u"), col("id1").as("v")))
      .union(p.select(col("id1").as("u"), col("id1").as("v")))
      .union(p.select(col("id2").as("u"), col("id2").as("v")))
      .distinct()
      .persist()
    var labels = edges.filter(col("u") === col("v")).select(col("u").as("id"))
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val cand = edges
        .join(labels.select(col("id").as("v"), col("label").as("vlabel")), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("vlabel")).as("cand"),
          min(when(col("v") === col("u"), col("vlabel"))).as("prev"))
      // pointer jump: a label is itself a node id, so follow it one level.
      // The convergence check RIDES the checkpoint's materialization job
      // via `Dataset.observe` (labels only ever decrease, so any strict
      // decrease means another round): one Spark job per round, not a
      // materialize-then-rescan pair
      val obs = org.apache.spark.sql.Observation()
      val next = cand
        .join(labels.select(col("id").as("cand"), col("label").as("cand_label")),
          Seq("cand"), "left")
        .select(col("id"), col("prev"),
          least(col("cand"), coalesce(col("cand_label"), col("cand"))).as("label"))
        .observe(obs, count_if(col("label") < col("prev")).as("changed"))
        .localCheckpoint()
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      val stale = labels
      labels = next.select(col("id"), col("label"))
      // checkpointed blocks are not tracked by the SQL cache manager:
      // free the stale round's RDD directly or blocks pile up for the
      // whole O(log d) loop (the final round's checkpoint stays alive —
      // the returned plan reads it)
      unpersistCheckpoint(stale)
      iter += 1
    }
    edges.unpersist()
    p.unpersist()
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("label"))
      .select(col("id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** Duplication centrality: fixed-round PageRank over the (undirected)
    * near-dup pair graph — the "most-mirrored document" score. A high-rank
    * node sits at the center of a duplication star (one canonical page
    * copied by many), which cluster SIZE alone cannot distinguish from a
    * chain of pairwise-similar drafts; centrality is the drop/keep signal
    * for template and boilerplate hubs.
    *
    * Determinism discipline (the [[graft.pipeline.Quantization]]
    * power-iteration recipe on a graph): mass is integer micro-units,
    * each round every node sends `m div deg` to each neighbor and
    * re-damps as `150000 + (85·Σincoming) div 100` — all integer ops,
    * bit-identical on any engine, and a FIXED round count keeps the
    * output a pure function of the input. Scale shape: per round one
    * keyed join (edges × mass) and one keyed sum — the CC loop's cost
    * model without the convergence test. Returns
    * (doc_id, deg, rank_micro) for every node of the pair graph. */
  def duplicationRank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    // pairs feed both edge directions and every round re-references the
    // edge list; an eager localCheckpoint materializes the (expensive)
    // candidate pipeline exactly ONCE — a lazy persist would not survive
    // into plans resolved after this function returns, and without it
    // round k recomputes the pipeline k+1 times (measured warm at sf0.1:
    // 7.3s without the checkpoint, 4.9s with)
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    var m = deg.select(col("src").as("id"), lit(1000000L).as("m"))
    for (_ <- 1 to iters) {
      m = edges
        .join(m, edges("src") === m("id"))
        .join(deg, "src")
        .select(col("dst"), expr("m div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inc"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * inc) div 100")).as("m"))
    }
    deg.join(m, deg("src") === m("id"))
      .select(col("id").as("doc_id"), col("deg"), col("m").as("rank_micro"))
  }

  // ---------------------------------------- edit-distance pair verification

  /** Edit-distance verification of near-dup candidate pairs — the classic
    * last filter after LSH candidate generation. `pairs` carries
    * (id1, id2); the texts join in on each side (two hash joins on the
    * doc id — candidate sets are small relative to the corpus, AQE
    * broadcasts them when they fit). The distance uses Spark's BOUNDED
    * `levenshtein(l, r, cap)`: it early-exits once the running minimum
    * exceeds `cap` (O(cap·min(n,m)) instead of O(n·m)) and returns -1,
    * surfaced here as NULL dist/sim — the bound is what keeps
    * edit-distance verification affordable on book-length documents at
    * corpus scale. Returns (id1, id2, dist, sim) with
    * sim = 1 - dist / max(|a|, |b|) over normalized text. */
  def editDistanceVerify(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 0, "edit-distance cap must be >= 0")
    val needed = pairs.select(col("id1").as(idCol))
      .union(pairs.select(col("id2").as(idCol))).distinct()
    val txt = docs.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), normalize(col(textCol)).as("__t"))
    val joined = pairs
      .join(txt.withColumnRenamed(idCol, "id1").withColumnRenamed("__t", "__t1"), "id1")
      .join(txt.withColumnRenamed(idCol, "id2").withColumnRenamed("__t", "__t2"), "id2")
    val raw = levenshtein(col("__t1"), col("__t2"), cap)
    joined
      .withColumn("dist", when(raw >= 0, raw.cast("long")))
      .withColumn("sim", when(col("dist").isNotNull, round(
        lit(1.0) - col("dist").cast("double") /
          greatest(length(col("__t1")), length(col("__t2"))).cast("double"), 6)))
      .select("id1", "id2", "dist", "sim")
  }

  // ---------------------------------- maximal repeated-run span mining

  /** Positional k-token shingles `(pos, sh)` of the normalized text —
    * 1-based positions, WITH multiplicity (the positional complement of
    * [[graft.functions.TextFunctions.shingles]]; same bind-the-token-
    * array-once guard so the regex tokenization runs once per row, not
    * once per shingle position). */
  private def posShingles(text: Column, k: Int): Column =
    element_at(
      transform(array(tokens(text)), tk =>
        when(size(tk) >= k,
          transform(sequence(lit(1), size(tk) - k + 1),
            i => struct(i.as("pos"),
              array_join(slice(tk, i, lit(k)), " ").as("sh"))))
          .otherwise(array().cast("array<struct<pos:int,sh:string>>"))),
      1)

  /** Maximal repeated token runs per document — the exact-substring
    * dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499): a position is
    * `duplicated` when its k-token shingle occurs at least `minOccurs`
    * times corpus-wide (any document, its own included); maximal runs of
    * consecutive duplicated positions become spans
    * `(span_start, span_end)` — 1-based token indices, end-inclusive, a
    * run of r shingles covering r + k − 1 tokens — and runs shorter than
    * `minRun` shingles drop as noise. Feed the spans to
    * [[stripSegments]]-style excision or use the per-doc duplicated-token
    * mass as a quality filter.
    *
    * The paper builds a corpus suffix array; the Spark-shaped equivalent
    * is a k-gram anchor index: ONE explode into positional shingles (the
    * expensive tokenize+join stage runs once — a count-aggregate +
    * semi-join formulation would evaluate the explode once per side), a
    * corpus occurrence count as a shingle-keyed window, and a
    * per-DOCUMENT gaps-and-islands window — every stage keyed, nothing
    * corpus-sized on one node. Integer positions and counts only, so any
    * engine replays the result bit-exactly. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minOccurs: Int = 2, minRun: Int = 1): DataFrame = {
    require(k >= 1, "shingle width must be >= 1 token")
    require(minOccurs >= 2, "a repeat needs at least two occurrences")
    require(minRun >= 1, "minimum run must be >= 1 shingle")
    import org.apache.spark.sql.expressions.Window
    val pos = positionalShingles(docs, idCol, textCol, k)
    islandsOf(
      pos.withColumn("__n", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("__n") >= minOccurs),
      idCol, k, minRun)
  }

  /** The EXCISABLE spans under Lee et al.'s keep-one-occurrence policy:
    * a position counts as removable only when its shingle repeats
    * corpus-wide AND this occurrence is NOT the canonical one (the
    * globally smallest `(doc id, position)` — deterministic, so both
    * engines pick the same keeper). The first document carrying a
    * repeated passage keeps it; every later copy excises. Same plan
    * shape as [[repeatedSpans]] with one extra rank inside the existing
    * shingle-keyed window partition — no new shuffle. */
  def repeatedSpansKeepFirst(docs: DataFrame, idCol: String,
      textCol: String, k: Int, minOccurs: Int = 2,
      minRun: Int = 1): DataFrame = {
    require(k >= 1, "shingle width must be >= 1 token")
    require(minOccurs >= 2, "a repeat needs at least two occurrences")
    require(minRun >= 1, "minimum run must be >= 1 shingle")
    import org.apache.spark.sql.expressions.Window
    val bySh = Window.partitionBy(col("sh"))
    val pos = positionalShingles(docs, idCol, textCol, k)
      .withColumn("__n", count(lit(1)).over(bySh))
      .withColumn("__rn", row_number().over(
        bySh.orderBy(col("__id"), col("pos"))))
    islandsOf(pos.filter(col("__n") >= minOccurs && col("__rn") > 1),
      idCol, k, minRun)
  }

  /** (doc `__id`, 1-based `pos`, `sh`) positional-shingle frame. */
  private def positionalShingles(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
        explode_outer(posShingles(col(textCol), k)).as("p"))
      .filter(col("p").isNotNull) // outer + post-filter: see explodePairs
      .select(col("__id"), col("p.pos").as("pos"), col("p.sh").as("sh"))

  /** Gaps-and-islands over a duplicated-position frame `(__id, pos)`:
    * maximal consecutive-position runs per doc → span rows. */
  private def islandsOf(dup: DataFrame, idCol: String, k: Int,
      minRun: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__id")).orderBy(col("pos"))
    dup.withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("__id"), col("__grp"))
      .agg(min(col("pos")).cast("int").as("span_start"),
        (max(col("pos")) + lit(k - 1)).cast("int").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .filter(col("n_shingles") >= minRun)
      .select(col("__id").as(idCol), col("span_start"), col("span_end"),
        col("n_shingles"))
  }

  /** Corpus k-shingle occurrence index — the persisted artifact the
    * incremental span path probes: `(sh, n)`, one count aggregate with
    * map-side partials. Rebuilt only when the corpus itself changes. */
  def spanShingleIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    positionalShingles(docs, idCol, textCol, k)
      .groupBy(col("sh")).agg(count(lit(1)).as("n"))

  /** Fold a new batch's shingles into a persisted [[spanShingleIndex]]:
    * union + one summing groupBy (map-side partials) — the index-update
    * step of the incremental span pipeline, run after mining each batch.
    * The result is the exact index of the enlarged corpus, so repeated
    * folds compose associatively. */
  def mergeSpanShingleIndex(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame =
    index.unionByName(spanShingleIndex(batch, idCol, textCol, k))
      .groupBy(col("sh")).agg(sum(col("n")).as("n"))

  /** [[repeatedSpans]] for a NEW batch against a persisted corpus index
    * (the [[incrementalNearDups]] discipline: only the batch is
    * shingled — the corpus is never re-tokenized). A batch position is
    * duplicated when its shingle's batch-internal occurrences plus the
    * index count reach `minOccurs`, so both batch-vs-corpus repeats and
    * repeats wholly inside the new batch surface. One explode of the
    * batch, one keyed join against the index, the same gaps-and-islands
    * finish. */
  def incrementalRepeatedSpans(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, minOccurs: Int = 2,
      minRun: Int = 1): DataFrame = {
    require(k >= 1, "shingle width must be >= 1 token")
    require(minOccurs >= 2, "a repeat needs at least two occurrences")
    require(minRun >= 1, "minimum run must be >= 1 shingle")
    import org.apache.spark.sql.expressions.Window
    val pos = positionalShingles(batch, idCol, textCol, k)
      .withColumn("__nb", count(lit(1)).over(Window.partitionBy(col("sh"))))
    val dup = pos
      .join(index.select(col("sh"), col("n").as("__ni")), Seq("sh"), "left")
      .filter(col("__nb") + coalesce(col("__ni"), lit(0L)) >= minOccurs)
    islandsOf(dup, idCol, k, minRun)
  }

  /** Excise every [[repeatedSpans]] run from its document: returns one
    * row per input doc — (id, n_tokens, removed_tokens, cleaned text) —
    * with all tokens covered by a qualifying span removed. This is the
    * remove-ALL-occurrences policy (boilerplate flavor); Lee et al.'s
    * keep-one-occurrence policy is a composition choice on top (join the
    * spans with a canonical-keeper pick before excising) left to the
    * caller, since the keeper rule is corpus-policy, not mechanics.
    *
    * Shape: the span frame is per-doc metadata (collect_list bounded by
    * doc length), one keyed join back, then per-row array math — the
    * token filter is an index-aware higher-order `filter`, O(tokens ×
    * spans-per-doc) per row, never a shuffle. */
  def exciseRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minOccurs: Int = 2, minRun: Int = 1): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, k, minOccurs, minRun)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val emptySpans = array().cast("array<struct<span_start:int,span_end:int>>")
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol), tokens(col(textCol)).as("__tk"),
        coalesce(col("__spans"), emptySpans).as("__sp"))
      .select(col(idCol), size(col("__tk")).cast("long").as("n_tokens"),
        filter(col("__tk"), (t, i) => !exists(col("__sp"),
          s => (i + 1) >= s("span_start") && (i + 1) <= s("span_end")))
          .as("__kept"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - size(col("__kept"))).cast("long")
          .as("removed_tokens"),
        array_join(col("__kept"), " ").as("cleaned"))
  }

  // ------------------------------------- segment-level boilerplate removal

  /** Non-overlapping n-token segments of the normalized text, in order —
    * the unit for corpus-level boilerplate removal (the role LINES play in
    * CCNet-style pipelines; fixed-width token windows stand in for
    * newline splitting on corpora without line structure). The trailing
    * partial segment is kept. Token array bound once (same
    * re-tokenization guard as [[graft.functions.TextFunctions.shingles]]). */
  def segments(text: Column, n: Int): Column = {
    require(n >= 1, "segment width must be >= 1 token")
    element_at(
      transform(array(tokens(text)), tk =>
        filter(
          // `/` on Columns is DOUBLE division — floor+cast keeps the
          // sequence bounds integral
          transform(sequence(lit(0),
              greatest(floor((size(tk) - 1) / n).cast("int"), lit(0))),
            i => array_join(slice(tk, i * n + 1, lit(n)), " ")),
          s => length(s) > 0)),
      1)
  }

  /** Segments appearing in at least `minDocs` DISTINCT documents — the
    * corpus boilerplate set. Per-document multiplicity is collapsed with
    * a per-ROW array_distinct (no shuffle), so the groupBy is a plain
    * count with map-side partial aggregation — never a countDistinct. */
  def commonSegments(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame =
    docs.select(explode_outer(array_distinct(segments(col(textCol), n)))
        .as("seg")) // outer + post-filter: see explodePairs
      .filter(col("seg").isNotNull)
      .groupBy("seg").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Remove corpus-common segments from every document (CCNet-style
    * boilerplate stripping: a "line" shared by many documents is template
    * noise, not content). Returns one row per input document:
    * (id, n_segs, n_removed, cleaned text).
    *
    * Plan shape at 100 TB: one explode of the corpus into segments, a
    * broadcast LEFT ANTI join against the (small by construction —
    * segments crossing the minDocs bar) boilerplate set, then one
    * groupBy(doc) to reassemble in segment order. The anti join is a
    * hash-table probe per segment — NOT a per-row linear scan of a
    * collected boilerplate array, which would be O(|common|) per segment
    * and fall over once the template set grows. */
  def stripCommonSegments(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int): DataFrame =
    stripSegments(docs, idCol, textCol, n,
      commonSegments(docs, idCol, textCol, n, minDocs).select("seg"))

  /** Decontamination by EXCISION: remove every n-token segment of a
    * document that appears verbatim in the benchmark corpus — the
    * span-removal complement of [[graft.pipeline.Sampling.decontaminate]]
    * (which only FLAGS documents; excision salvages the clean remainder
    * instead of dropping the whole document). Same posture: the
    * benchmark segment set is small by construction and broadcasts into
    * a per-segment anti-join probe. */
  def exciseBenchmarkSegments(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame =
    stripSegments(docs, idCol, textCol, n,
      benchmark
        .select(explode_outer(array_distinct(segments(col(textCol), n)))
          .as("seg"))
        .filter(col("seg").isNotNull)
        .distinct())

  /** Shared excision core: drop every segment of `docs` present in
    * `bad` (a single-column `seg` frame, broadcast), reassemble the
    * remainder in segment order. */
  private def stripSegments(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bad: DataFrame): DataFrame = {
    val segs = docs.select(col(idCol),
        posexplode_outer(segments(col(textCol), n)).as(Seq("__pos", "seg")))
      .filter(col("seg").isNotNull) // outer + post-filter: see explodePairs
    val kept = segs.join(broadcast(bad), Seq("seg"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("seg")))),
          x => x.getField("seg")), " ").as("cleaned"))
    docs.select(col(idCol), size(segments(col(textCol), n)).cast("long").as("n_segs"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        (col("n_segs") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Per-key bit positions for the Bloom pair below: hash i of a key is
    * `hash60(key || "#i") mod mBits`. Words are 60 bits wide (not 64) so
    * no mask ever shifts into the sign bit — engines disagree on BIGINT
    * overflow at bit 63, and 60 matches hash60's range discipline. */
  private def bloomPositions(df: DataFrame, keyCol: String,
      mBits: Int, kHashes: Int, extra: Seq[Column]): DataFrame = {
    require(mBits > 0 && kHashes > 0, "bloom needs positive m and k")
    val posCols = (0 until kHashes).map(i =>
      pmod(hash60(concat(col(keyCol), lit("#" + i))), lit(mBits.toLong)))
    df.select(extra :+ explode(array(posCols: _*)).as("__p"): _*)
      .withColumn("__w", expr("__p div 60"))
      .withColumn("__mask",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 60 AS INT))"))
  }

  /** Build a Bloom filter over a key column as a (word, bits) table —
    * ⌈mBits/60⌉ rows of 60-bit words. The standard streaming-ingest
    * prefilter for incremental dedup: probe the sketch first
    * ([[bloomProbe]]); only "maybe" rows pay the exact index lookup
    * ([[incrementalNearDups]] / exact-hash anti-join). No false
    * negatives ever; false-positive rate ~ (1 − e^{−kn/m})^k.
    *
    * Scale: the sketch is METADATA (m bits regardless of corpus size);
    * the build is one projection + a bit_or aggregate whose partial
    * (map-side) combine collapses every task to ≤ ⌈m/60⌉ rows — the
    * cheapest possible corpus summary shape. All arithmetic is integer
    * (hash60, div, mod, shift, or), so any engine reproduces the exact
    * same bit pattern — false positives included. */
  def bloomBuild(df: DataFrame, keyCol: String, mBits: Int,
      kHashes: Int): DataFrame =
    bloomPositions(df, keyCol, mBits, kHashes, Nil)
      .groupBy(col("__w").as("w"))
      .agg(expr("bit_or(__mask)").as("bits"))

  /** Probe a [[bloomBuild]] sketch: a key is `maybe_member` iff ALL k of
    * its bits are set. The sketch side broadcasts (it is metadata); the
    * probe is one explode + hash join + count aggregate per key. */
  def bloomProbe(df: DataFrame, idCol: String, keyCol: String,
      bloom: DataFrame, mBits: Int, kHashes: Int): DataFrame =
    bloomPositions(df, keyCol, mBits, kHashes, Seq(col(idCol)))
      .join(broadcast(bloom), col("__w") === bloom("w"), "left")
      .groupBy(col(idCol))
      .agg((count(when(coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("__mask")) =!= 0L, true)) === kHashes)
        .as("maybe_member"))

  /** Corpus snapshot diff: classify every id across two corpus versions
    * as `added` / `removed` / `changed` / `unchanged` by comparing
    * content fingerprints — the audit step between two builds of a
    * training set (what moved, before anything retrains). One
    * fixed-width (id, fingerprint) projection per side and one full
    * outer join on the id — never the text itself; at 100 TB the join
    * carries 16 bytes/row. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def fp(df: DataFrame, out: String) =
      df.select(col(idCol), fingerprint(col(textCol)).as(out))
    fp(oldDocs, "__old").join(fp(newDocs, "__new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old").isNull, "added")
          .when(col("__new").isNull, "removed")
          .when(col("__old") === col("__new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Cross-source n-gram overlap matrix: for every pair of corpus
    * slices, the EXACT count of shared distinct word n-gram shingles and
    * the resulting Jaccard — the diversity/contamination diagnostic run
    * before mixing sources into a training set (the estimated twin for
    * two huge corpora is the HLL path at [[hllRegisters]]).
    *
    * Scale shape: the dedup-family candidate discipline — distinct
    * (source, shingle) rows, ONE shuffle on the shingle to collect its
    * source set (bounded by #sources, not corpus), in-bucket pair
    * expansion (≤ C(#sources, 2) rows per shingle), then a map-side
    * combining count to the #sources² matrix. Source counts are a
    * #sources-sized frame joined back under AQE broadcast. */
  def sourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = docs.select(col(srcCol).as("source"),
        explode_outer(array_distinct(shingles(col(textCol), n))).as("__sh"))
      .filter(col("__sh").isNotNull)
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("__n"))
    val buckets = sh.groupBy("__sh")
      .agg(sort_array(collect_set(col("source"))).as("xs"))
      .filter(size(col("xs")) > 1)
    val shared = explodePairs(buckets, "xs")((x, y) =>
        struct(x.as("s1"), y.as("s2")))
      .groupBy(col("p.s1").as("source1"), col("p.s2").as("source2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("source").as("source1"), col("__n").as("n1")),
        "source1")
      .join(sizes.select(col("source").as("source2"), col("__n").as("n2")),
        "source2")
      .select(col("source1"), col("source2"), col("n1"), col("n2"),
        col("shared"),
        round(col("shared") / (col("n1") + col("n2") - col("shared")), 6)
          .as("jaccard"))
  }

  /** Count-min sketch over a key stream (Cormode & Muthukrishnan 2005) —
    * the frequency companion of [[bloomBuild]] (membership) and the HLL
    * cardinality path: `depth` hash rows of `width` cells; a key's count
    * estimate is the MIN of its cells, an upper bound on the true count
    * (collisions only inflate). The standard bounded-memory answer to
    * "how often does this token/URL/fingerprint occur" over a stream too
    * large to hold a full frequency table.
    *
    * Scale: the sketch is metadata (depth·width cells regardless of
    * corpus); the build is one projection + a count aggregate that
    * partial-combines map-side. All-integer hashing and counting, so any
    * engine reproduces the exact cell table — estimates included. */
  def cmsBuild(df: DataFrame, keyCol: String, width: Int,
      depth: Int): DataFrame = {
    require(width > 0 && depth > 0, "cms needs positive width and depth")
    val rows = (0 until depth).map(i => struct(lit(i).as("r"),
      pmod(hash60(concat(col(keyCol), lit("#" + i))), lit(width.toLong))
        .as("cell")))
    df.select(explode(array(rows: _*)).as("__rc"))
      .groupBy(col("__rc.r").as("r"), col("__rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate keys against a [[cmsBuild]] sketch: min over the
    * key's `depth` cells (missing cell = 0). The sketch broadcasts. */
  def cmsEstimate(df: DataFrame, keyCol: String, cms: DataFrame,
      width: Int, depth: Int): DataFrame = {
    val rows = (0 until depth).map(i => struct(lit(i).as("r"),
      pmod(hash60(concat(col(keyCol), lit("#" + i))), lit(width.toLong))
        .as("cell")))
    df.select(col(keyCol), explode(array(rows: _*)).as("__rc"))
      .join(broadcast(cms),
        col("__rc.r") === cms("r") && col("__rc.cell") === cms("cell"),
        "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** HyperLogLog registers (Flajolet et al. 2007) over a key stream —
    * the cardinality member of the engine-exact sketch family (Bloom
    * membership / CMS frequency / HLL cardinality; the server side
    * already pairs exact and HLL in read_series_cardinality). 2^p
    * registers per group; register j holds the max leading-zero rank of
    * hash60 suffixes landing in bucket j. Duplicates need no
    * pre-distinct — max() is idempotent, which is the whole trick: the
    * build is one projection + one map-side-combining aggregate, and the
    * register table is metadata (≤ 2^p rows per group) no matter the
    * corpus. All-integer (md5-based hash, bit ops, bin-length rank), so
    * any engine reproduces the exact registers. */
  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"precision out of range: $p")
    val m = 1 << p
    val h = hash60(col(keyCol))
    val rest = shiftright(h, p) // top 60−p hash bits
    val rank = when(rest === 0, lit(61 - p))
      .otherwise(lit(61 - p) - length(bin(rest)))
    df.select(groupCols.map(col)
        :+ h.bitwiseAND(lit((m - 1).toLong)).as("bucket") :+ rank.as("rank"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rank")).as("reg"))
  }

  /** Read a [[hllRegisters]] table out to the raw HLL estimate
    * α·m²/Σ2^−M(j). The harmonic-mean denominator stays EXACT: 2^−reg is
    * a dyadic rational, so Σ scaled by 2^50 is a plain long sum (empty
    * buckets contribute 2^50 each); the final α·2^(2p+50)/S is three IEEE
    * double ops any engine computes bit-identically. Deliberately no
    * small-range linear-counting correction — its ln() is the one step
    * engines may round differently, and the raw estimator keeps the
    * sketch engine-exact (document the low-cardinality bias instead). */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1 << p
    val term = expr("shiftleft(CAST(1 AS BIGINT), 50 - reg)")
    regs.groupBy(groupCols.map(col): _*)
      .agg((sum(term) + (lit(m.toLong) - count(lit(1))) * lit(1L << 50)).as("S"))
      .withColumn("est",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble)) *
          pow(lit(2.0), lit((2 * p + 50).toDouble)) / col("S").cast("double"))
      .drop("S")
  }

  /** Drop the cached blocks behind a localCheckpoint-ed frame.
    * `Dataset.unpersist` only covers cache-manager entries; a checkpoint
    * lives as a persisted RDD under a LogicalRDD leaf. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
