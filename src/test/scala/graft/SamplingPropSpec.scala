package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pipeline.Sampling

/** Model-based property tests for the r12 Sampling additions, checked
  * against executable Scala models:
  *
  *  - unimaxMix == sequential water-filling ("sorted by capacity then
  *    name: take full capacity while it fits an even share of what
  *    remains, then split the remainder evenly by floor division");
  *  - coverageSelect == brute-force greedy max-coverage over the doc
  *    shingle sets (gain desc, id asc, zero-gain docs unpickable).
  *
  * Generators force the edges: tiny budgets (nobody capped), huge
  * budgets (everybody capped), capacity ties (name tie-break), docs
  * sharing all/most shingles (coverage ties + early exhaustion). */
class SamplingPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, min: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // --- unimaxMix vs the sequential water-filling model

  private val strataGen: Gen[List[(String, Int)]] = for {
    n <- Gen.choose(1, 6)
    cnts <- Gen.listOfN(n, Gen.choose(1, 8))
  } yield cnts.zipWithIndex.map { case (c, i) => (s"l$i", c) }

  test("unimaxMix equals the sequential water-filling model at any " +
      "budget (all-capped / none-capped edges included)") {
    val prop = Prop.forAll(strataGen, Gen.choose(0L, 60L),
        Gen.choose(1, 3)) { (strata, budget, cap) =>
      val rows = strata.flatMap { case (l, c) => Seq.fill(c)(l) }
      val got = Sampling.unimaxMix(rows.toDF("lang"), "lang", budget, cap)
        .select($"lang", $"n_docs", $"capacity", $"capped", $"alloc_docs")
        .as[(String, Long, Long, Boolean, Long)].collect()
        .map(r => r._1 -> (r._3, r._4, r._5)).toMap
      // model: sorted by (capacity, name); full capacity while it fits an
      // even share of the remainder, then an even floor split
      val sorted = strata.map { case (l, c) => (l, c.toLong * cap) }
        .sortBy { case (l, cp) => (cp, l) }
      var remaining = budget
      var i = 0
      val model = scala.collection.mutable.Map[String, (Long, Boolean, Long)]()
      var splitting = false
      sorted.foreach { case (l, cp) =>
        val left = sorted.size - i
        if (!splitting && cp * left <= remaining) {
          model(l) = (cp, true, cp); remaining -= cp
        } else {
          splitting = true
          model(l) = (cp, false, remaining / left) // same floor for all rest
        }
        i += 1
      }
      // once one stratum overflows, every later (>= capacity) one splits
      // too — recompute the even share with the frozen remainder/count
      val nSplit = model.count(!_._2._2)
      val share = if (nSplit == 0) 0L else remaining / nSplit
      val fixed = model.map { case (l, (cp, c, a)) =>
        l -> (cp, c, if (c) a else share) }
      val ok = got == fixed.toMap
      val sumOk = got.values.map(_._3).sum <= budget ||
        got.values.forall(_._2) // all-capped can undershoot only
      val capOk = got.values.forall { case (cp, _, a) => a <= cp }
      if (!ok) println(s"unimax mismatch: strata=$strata budget=$budget " +
        s"cap=$cap got=$got model=${fixed.toMap}")
      ok && sumOk && capOk
    }
    check("unimaxMix", prop, 40)
  }

  // --- coverageSelect vs brute-force greedy over shingle sets

  private val wordGen: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private val docGen: Gen[String] = for {
    len <- Gen.choose(0, 7)
    ws <- Gen.listOfN(len, wordGen)
  } yield ws.mkString(" ")
  private val docsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 7)
    ts <- Gen.listOfN(n, docGen)
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("coverageSelect equals brute-force greedy max-coverage " +
      "(gain desc, id asc, early exhaustion)") {
    val prop = Prop.forAll(docsGen, Gen.choose(1, 4)) { (docs, k) =>
      val got = Sampling.coverageSelect(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, k = k)
        .as[(Int, Long, Long, Long)].collect().toSeq
      def shingleSet(t: String): Set[String] = {
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.size < 3) Set.empty
        else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
      var covered = Set.empty[String]
      val model = scala.collection.mutable.ArrayBuffer[(Int, Long, Long, Long)]()
      var cum = 0L
      var r = 1
      var done = false
      while (r <= k && !done) {
        val gains = sets.toSeq
          .map { case (id, s) => (id, (s -- covered).size.toLong) }
          .filter(_._2 > 0)
        if (gains.isEmpty) done = true
        else {
          val (id, g) = gains.minBy { case (i2, g2) => (-g2, i2) }
          cum += g
          model += ((r, id, g, cum))
          covered ++= sets(id)
          r += 1
        }
      }
      val ok = got == model.toSeq
      if (!ok) println(s"coverage mismatch: docs=$docs k=$k got=$got " +
        s"model=${model.toSeq}")
      ok
    }
    check("coverageSelect", prop, 30)
  }
}
