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

  /** Per-document MinHash signature as `numPerms` LONG columns `mh_i`,
    * computed from md5 token hashes of the shingle set (reduced mod p).
    * The min per permutation is an `array_min` over the shingle array — no
    * explode, no shuffle; one pass per document row. */
  def signatures(docs: DataFrame, idCol: String, textCol: String, n: Int,
      p: MinHashParams): DataFrame = {
    val sh = shingles(col(textCol), n)
    val hs = transform(sh, s => pmod(hash60(s), lit(p.prime)))
    val sigCols = p.abs.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(hs, h => pmod(h * a + b, lit(p.prime)))).as(s"mh_$i")
    }
    docs.select(col(idCol) +: sigCols: _*)
  }

  /** LSH candidate pairs: equal signature slice in >= 1 band. Each band is
    * a groupBy on the banded signature hash; pairs are emitted inside
    * buckets only, then distinct-ed. */
  def lshCandidates(sigs: DataFrame, idCol: String, p: MinHashParams): DataFrame = {
    val bandFrames = (0 until p.bands).map { b =>
      val cols = (b * p.rowsPerBand until (b + 1) * p.rowsPerBand).map(i => col(s"mh_$i"))
      sigs.select(col(idCol),
        md5(concat_ws(",", lit(b.toString) +: cols: _*)).as("bucket"))
    }
    val buckets = bandFrames.reduce(_ union _)
    val a = buckets.as("a")
    val b2 = buckets.as("b")
    a.join(b2, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"))
      .distinct()
  }

  // --------------------------------------------------- jaccard verification

  /** Exact word-n-gram Jaccard for given candidate pairs (id1, id2).
    * Joins the shingle sets back and computes |A∩B| / |A∪B| with
    * array_intersect — exact verification after approximate candidate
    * generation. */
  def verifyJaccard(docs: DataFrame, candidates: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), n).as("sh"))
    candidates
      .join(sh.withColumnRenamed(idCol, "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sh.withColumnRenamed(idCol, "id2").withColumnRenamed("sh", "sh2"), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** End-to-end MinHash-LSH near-dup pairs with exact verification. */
  def minHashDedupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, p: MinHashParams): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, n, p)
    val cands = lshCandidates(sigs, idCol, p)
    verifyJaccard(docs, cands, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  /** Exact (non-approximate) near-dup pairs: candidates = pairs sharing at
    * least one shingle, with a document-frequency cap on shingles so that
    * stopword-like shingles don't produce quadratic blowup. The cap makes
    * it scale; LSH above is the preferred path at extreme scale. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Int = 1000000000): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), explode(shingles(col(textCol), n)).as("s"))
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf).select("s")
    val shr = sh.join(rare, "s")
    val cands = shr.as("a").join(shr.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    verifyJaccard(docs, cands, idCol, textCol, n)
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- simhash

  /** 60-bit SimHash over whitespace tokens (md5-based token hashes): bit j
    * of the signature is 1 iff the sum over DISTINCT tokens of ±1 (by bit
    * j of the token hash) is positive. Pure column arithmetic — a static
    * 60-way expansion folded per document row; no explode, no shuffle, so
    * it scales linearly with document count. */
  def simHash(text: Column, bits: Int = 60): Column = {
    val hs = transform(array_distinct(tokens(text)), t => hash60(t))
    (0 until bits).map { b =>
      val bitSum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: bucket by 4 signature quarters (a pair within
    * hamming distance <= 3 of a 60-bit signature shares at least one exact
    * 15-bit quarter by pigeonhole), verify hamming inside buckets. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sigs = docs.select(col(idCol), simHash(col(textCol)).as("sig"))
    val quarters = (0 until 4).map { q =>
      sigs.select(col(idCol), col("sig"),
        concat_ws(":", lit(q.toString),
          shiftright(col("sig"), q * 15).bitwiseAND(lit(0x7fffL)).cast("string")).as("bucket"))
    }.reduce(_ union _)
    quarters.as("a").join(quarters.as("b"),
        col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"),
        hamming(col("a.sig"), col("b.sig")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }

  /** Hamming distance between two long signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
