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

  test("binarySign/hammingTopK match the brute-force bit model on " +
      "random vectors (odd dims exercise the short final word)") {
    import graft.pipeline.Similarity
    val vecGen: Gen[List[List[Float]]] = for {
      dim <- Gen.oneOf(1, 5, 31, 32, 33, 64, 70)
      n <- Gen.choose(2, 8)
      vs <- Gen.listOfN(n,
        Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 10.0f)))
    } yield vs
    def modelBits(v: Seq[Float]): Seq[Long] =
      v.grouped(32).map(_.zipWithIndex.collect {
        case (x, j) if x >= 0 => 1L << j
      }.foldLeft(0L)(_ | _)).toSeq
    val prop = Prop.forAll(vecGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val bits = Similarity.binarySign(df, "vec_id", "embedding")
      val gotBits = bits.orderBy("vec_id").as[(Long, Seq[Long])]
        .collect().toMap
      val bitsOk = vs.zipWithIndex.forall { case (v, i) =>
        gotBits(i.toLong) == modelBits(v)
      }
      // top-k from query 0 vs model Hamming ranking
      val q = bits.filter($"vec_id" === 0)
        .select($"vec_id".as("q_id"), $"bits".as("q_bits"))
      val got = Similarity.hammingTopK(bits, q, k = 3)
        .orderBy("rank").as[(Long, Int, Long, Int)].collect()
        .map(r => (r._3, r._4)).toSeq
      val qb = modelBits(vs.head)
      val want = vs.zipWithIndex.drop(1).map { case (v, i) =>
        (i.toLong, modelBits(v).zip(qb)
          .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum)
      }.sortBy { case (id, dd) => (dd, id) }.take(3)
      val rankOk = got == want
      if (!bitsOk || !rankOk)
        println(s"vs=$vs got=$got want=$want gotBits=$gotBits")
      bitsOk && rankOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
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
