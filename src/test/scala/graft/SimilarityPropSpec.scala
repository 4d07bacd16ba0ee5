package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Model-based property tests for the r11 Similarity additions, checked
  * against executable Scala models:
  *
  *  - semiHardTriplets == "positive = same-label argmax cosine (ties to
  *    lowest id), negative = different-label argmax STRICTLY below the
  *    positive; anchors with no such negative are dropped" (FaceNet
  *    §3.2 semi-hard band);
  *  - filteredTopKIndexed == "every result satisfies the predicate, is
  *    never the query itself, and equals the brute-force ranking over
  *    the predicate-filtered members of the probed lists".
  *
  * Generators force the edge cases: tiny integer coordinate domains so
  * cosine TIES are common (exercising the id tie-break), clustered
  * labels so some anchors have no semi-hard negative, and predicates of
  * varying selectivity (including empty-result filters). Cases are few
  * but dense — each case is a Spark job. */
class SimilarityPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, min: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def cos(a: Seq[Int], b: Seq[Int]): Option[Double] = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    if (na * nb == 0.0) None else Some(dot / (na * nb))
  }

  // small integer coords in [-2, 2], dim 3: dense cosine ties
  private val vecGen: Gen[Seq[Int]] =
    Gen.listOfN(3, Gen.choose(-2, 2))
  private val corpusGen: Gen[List[(Long, Seq[Int], Int)]] = for {
    n <- Gen.choose(4, 14)
    vs <- Gen.listOfN(n, vecGen)
    ls <- Gen.listOfN(n, Gen.choose(0, 2))
  } yield vs.zip(ls).zipWithIndex.map { case ((v, l), i) => (i.toLong, v, l) }

  test("semiHardTriplets matches the argmax/strictly-below model " +
      "(ties by id, anchors without a band negative dropped)") {
    val prop = Prop.forAll(corpusGen) { rows =>
      val df = rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
        .toDF("vec_id", "embedding", "label")
      val anchors = df.filter($"vec_id" < 3)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
          $"label".as("q_label"))
      val got = Similarity.semiHardTriplets(df, anchors)
        .select($"q_id", $"pos_id", $"neg_id")
        .as[(Long, Long, Long)].collect()
        .map { case (q, p, n) => q -> ((p, n)) }.toMap

      val want = rows.filter(_._1 < 3).flatMap { case (qid, qv, ql) =>
        val scored = rows.filter(_._1 != qid).flatMap { case (id, v, l) =>
          cos(v, qv).map(c => (id, l, c)) }
        val posC = scored.filter(_._2 == ql)
        if (posC.isEmpty) None else {
          val pos = posC.minBy { case (id, _, c) => (-c, id) }
          val negC = scored.filter { case (_, l, c) => l != ql && c < pos._3 }
          if (negC.isEmpty) None else {
            val neg = negC.minBy { case (id, _, c) => (-c, id) }
            Some(qid -> (pos._1, neg._1))
          }
        }
      }.toMap
      if (got != want) {
        println(s"rows=$rows\ngot=$got\nwant=$want")
      }
      got == want
    }
    check("semiHardTriplets", prop, min = 12)
  }

  test("filteredTopKIndexed returns exactly the brute-force ranking over " +
      "predicate-matching members of the probed lists") {
    val prop = Prop.forAll(corpusGen, Gen.choose(0, 2)) { (rows, keepL) =>
      val df = rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
        .toDF("vec_id", "embedding", "label")
      // two fixed centroids; every non-degenerate vector lands in a list
      val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 1f)))
        .toDF("c_id", "c_vec")
      val index = Similarity.ivfIndex(df, cents, carryCols = Seq("label"))
      val q = df.filter($"vec_id" === 0L)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      val got = Similarity.filteredTopKIndexed(index, cents, q,
          $"label" === keepL, k = 4, nprobe = 1)
        .orderBy("rank").select($"neighbor_id").as[Long].collect().toSeq

      // model: assign corpus + query to centroid lists by cosine argmax
      // (ties to lower c_id), then brute-force over the filtered list
      val cvs = Seq(Seq(1, 0, 0), Seq(0, 1, 1))
      def assign(v: Seq[Int]): Option[Int] = {
        val affs = cvs.zipWithIndex.flatMap { case (cv, i) =>
          cos(v, cv).map(c => (i, c)) }
        if (affs.isEmpty) None
        else Some(affs.minBy { case (i, c) => (-c, i) }._1)
      }
      val qRow = rows.find(_._1 == 0L).get
      val want = assign(qRow._2) match {
        case None => Seq.empty[Long]
        case Some(qc) =>
          rows.filter { case (id, v, l) =>
            id != 0L && l == keepL && assign(v).contains(qc) }
            .flatMap { case (id, v, _) => cos(v, qRow._2).map(c => (id, c)) }
            .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1)
      }
      if (got != want) {
        println(s"rows=$rows keep=$keepL\ngot=$got\nwant=$want")
      }
      got == want
    }
    check("filteredTopKIndexed", prop, min = 12)
  }

  test("ivfRangeIndexed with every list probed equals the brute-force " +
      "threshold filter (micro-quantized, self excluded)") {
    val thGen = Gen.oneOf(-500000L, 0L, 300000L, 900000L)
    val prop = Prop.forAll(corpusGen, thGen) { (rows, minMicro) =>
      val df = rows.map { case (id, v, l) => (id, v.map(_.toFloat), l) }
        .toDF("vec_id", "embedding", "label")
      val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 1f)))
        .toDF("c_id", "c_vec")
      val index = Similarity.ivfIndex(df, cents)
      val q = df.filter($"vec_id" === 0L)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      // nprobe covers every list, so probing drops nothing and the
      // result must be exactly the brute-force radius query
      val got = Similarity.ivfRangeIndexed(index, cents, q,
          minCosMicro = minMicro, nprobe = 2)
        .select($"neighbor_id", $"cos_micro").as[(Long, Double)]
        .collect().sortBy(_._1).toSeq
      val qRow = rows.find(_._1 == 0L).get
      val want = rows.filter(_._1 != 0L)
        .flatMap { case (id, v, _) =>
          cos(v, qRow._2).map(c => (id, math.floor(c * 1e6 + 0.5))) }
        .filter(_._2 >= minMicro)
        .sortBy(_._1)
      if (got != want) {
        println(s"rows=$rows min=$minMicro\ngot=$got\nwant=$want")
      }
      got == want
    }
    check("ivfRangeIndexed", prop, min = 12)
  }

  test("maxSimTopK matches the sum-of-best-chunk-micro-cosines model " +
      "(self doc excluded, ties by doc id)") {
    val prop = Prop.forAll(corpusGen) { rows =>
      // docs of 2 chunks each; queries 0 and 1 get the first 2 vectors
      // of their own doc as parts (self-doc exclusion must drop doc q)
      val chunks = rows.map { case (id, v, _) =>
        (id / 2, v.map(_.toFloat)) }.toDF("doc_id", "embedding")
      val qp = rows.filter(_._1 < 4).map { case (id, v, _) =>
        (id / 2, id % 2, v.map(_.toFloat)) }
        .toDF("q_id", "part_id", "q_vec")
      val got = Similarity.maxSimTopK(chunks, qp, k = 3)
        .select($"q_id", $"rank", $"neighbor_id", $"maxsim")
        .as[(Long, Int, Long, Double)].collect()
        .groupBy(_._1).map { case (q, xs) =>
          q -> xs.sortBy(_._2).map(x => (x._3, x._4)).toSeq }

      val want = (0L to 1L).map { q =>
        val parts = rows.filter(r => r._1 < 4 && r._1 / 2 == q).map(_._2)
        val byDoc = rows.groupBy(_._1 / 2).filter(_._1 != q)
        val scored = byDoc.toSeq.flatMap { case (doc, rs) =>
          // per part: best micro cosine over the doc's chunks; a part
          // with no scoreable chunk (all zero-norm) contributes nothing
          val bests = parts.flatMap { p =>
            val cs = rs.flatMap(r => cos(r._2, p))
              .map(c => math.floor(c * 1e6 + 0.5).toLong)
            if (cs.isEmpty) None else Some(cs.max)
          }
          if (bests.isEmpty) None
          else Some(doc -> bests.sum.toDouble)
        }
        q -> scored.sortBy { case (doc, s) => (-s, doc) }.take(3)
      }.filter(_._2.nonEmpty).toMap
      val gotN = got.view.mapValues(_.toSeq).toMap
      if (gotN != want) {
        println(s"rows=$rows\ngot=$gotN\nwant=$want")
      }
      gotN == want
    }
    check("maxSimTopK", prop, min = 12)
  }
}
