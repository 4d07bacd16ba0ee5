package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.pipeline.DocDedup
import graft.pipeline.DocDedup.MinHashParams

/** Equivalence pin for the r16 native [[graft.functions.MinHashSigExpr]]:
  * column-for-column identity of [[DocDedup.signatures]] against the r15
  * exploded formulation it replaced (explode shingles → hash →
  * groupBy(id).agg(numPerms × min), reconstructed verbatim here), over an
  * adversarial matrix and the real sf0.01 corpus. Every MinHash/LSH
  * oracle query hashes results derived from these signatures, so any
  * divergence — permutation arithmetic, distinct-shingle set, the
  * all-null convention for shingle-less docs — is a correctness
  * regression. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private def oldSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, p: MinHashParams): DataFrame = {
    val hashed = docs
      .select(col(idCol),
        explode_outer(TextFunctions.shingles(col(textCol), n)).as("s"))
      .select(col(idCol),
        pmod(TextFunctions.hash60(col("s")), lit(p.prime)).as("h"))
    val sigCols = p.abs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(p.prime))).as(s"mh_$i")
    }
    hashed.groupBy(col(idCol)).agg(sigCols.head, sigCols.tail: _*)
  }

  private def diffCount(docs: DataFrame, n: Int, p: MinHashParams): Long = {
    val neu = DocDedup.signatures(docs, "doc_id", "text", n, p)
    val alt = oldSignatures(docs, "doc_id", "text", n, p)
      .toDF("doc_id" +: (0 until p.numPerms).map(i => s"old_$i"): _*)
    neu.join(alt, "doc_id")
      .filter((0 until p.numPerms).map(i =>
        not(col(s"mh_$i") <=> col(s"old_$i"))).reduce(_ || _))
      .count()
  }

  private val tricky: Seq[(Long, String)] = Seq(
    (1L, null),
    (2L, ""),
    (3L, " \t "),
    (4L, "one"),                        // shorter than any n >= 2
    (5L, "one two"),
    (6L, "one two three four five"),
    (7L, "dup dup dup dup dup"),
    (8L, "x y x y x y x y"),
    (9L, "ÅNGSTRÖM Straße İstanbul mixed 🦀 tokens"),
    (10L, ("tok " * 200).trim))

  test("native signatures == exploded form on the adversarial matrix") {
    val df = tricky.toDF("doc_id", "text")
    Seq(MinHashParams(8, 4), MinHashParams(32, 16)).foreach { p =>
      Seq(2, 3).foreach { n =>
        assert(diffCount(df, n, p) == 0L, s"n=$n numPerms=${p.numPerms}")
      }
    }
  }

  test("native signatures == exploded form on the sf0.01 corpus") {
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    assert(diffCount(docs, 3, MinHashParams(32, 16)) == 0L)
  }

  test("shingle-less docs keep the all-null signature convention end to end") {
    val df = Seq((1L, null: String), (2L, "a"), (3L, "a b c d")).toDF("doc_id", "text")
    val sigs = DocDedup.signatures(df, "doc_id", "text", n = 3,
      MinHashParams(8, 4)).collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(sigs(1L) && sigs(2L) && !sigs(3L))
  }
}
