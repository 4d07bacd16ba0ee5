package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pipeline.DocDedup

/** Property pin for [[DocDedup.repeatedSpans]] against an independent
  * brute-force model: random small-vocabulary corpora (small vocab →
  * dense accidental repeats, exercising island merging hard), the model
  * computing shingle multiset counts and maximal duplicated-position
  * runs directly. Guards the window-count formulation (and any future
  * plan rework) beyond the fixed oracle-query corpus. */
class RepeatedSpansPropSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d")
  private val corpusGen: Gen[List[List[String]]] = for {
    nDocs <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nDocs, for {
      n <- Gen.choose(0, 14)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws)
  } yield docs

  /** The straightforward model: count every k-shingle occurrence across
    * the corpus, mark positions whose shingle count >= minOccurs, merge
    * consecutive positions into maximal runs, keep runs >= minRun. */
  private def model(docs: Seq[Seq[String]], k: Int, minOccurs: Int,
      minRun: Int): Seq[(Long, Int, Int, Long)] = {
    val shingleOf = (ws: Seq[String]) =>
      ws.indices.dropRight(k - 1).map(i => ws.slice(i, i + k).mkString(" "))
    val counts = docs.flatMap(shingleOf)
      .groupBy(identity).view.mapValues(_.size).toMap
    docs.zipWithIndex.flatMap { case (ws, id) =>
      val dup = shingleOf(ws).zipWithIndex
        .collect { case (sh, i) if counts(sh) >= minOccurs => i + 1 }
      // gaps and islands over the sorted duplicated positions
      val runs = dup.foldLeft(List.empty[(Int, Int, Int)]) {
        case ((s, e, n) :: rest, p) if p == e + 1 => (s, p, n + 1) :: rest
        case (acc, p) => (p, p, 1) :: acc
      }.reverse
      runs.collect { case (s, e, n) if n >= minRun =>
        (id.toLong, s, e + k - 1, n.toLong)
      }
    }
  }

  test("repeatedSpans matches the brute-force model on random corpora") {
    val prop = Prop.forAll(corpusGen, Gen.choose(1, 3), Gen.choose(1, 2)) {
      (docs, kk, minRun) =>
      val k = kk + 1 // 2..4
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DocDedup.repeatedSpans(df, "doc_id", "text", k,
          minOccurs = 2, minRun = minRun)
        .orderBy("doc_id", "span_start")
        .as[(Long, Int, Int, Long)].collect().toSeq
      val want = model(docs.map(_.toSeq), k, 2, minRun)
      if (got != want)
        println(s"k=$k minRun=$minRun docs=$docs\n got=$got\nwant=$want")
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
