package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.pipeline.{Packing, Sampling}

/** Property pins for the batch-shaping operators against independent
  * closed-form models: random group/size shapes exercise ties, empty
  * groups, single-shard and more-shards-than-docs cases the fixed
  * fixtures don't. */
class PackingPropSpec extends SparkSpec {
  import spark.implicits._

  // the boustrophedon deal: shard of 0-based rank r over s shards
  private def snake(r: Int, s: Int): Int =
    if ((r / s) % 2 == 0) r % s else s - 1 - (r % s)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("shardBalance matches the per-group snake-deal model on random " +
      "inputs (ties, tiny groups, shards > docs)") {
    val gen = for {
      nGroups <- Gen.choose(1, 3)
      shards <- Gen.choose(1, 4)
      groups <- Gen.listOfN(nGroups, for {
        n <- Gen.choose(0, 12)
        sizes <- Gen.listOfN(n, Gen.choose(0L, 20L)) // narrow range → ties
      } yield sizes)
    } yield (groups, shards)
    val prop = Prop.forAll(gen) { case (groups, shards) =>
      val data = groups.zipWithIndex.flatMap { case (sizes, g) =>
        sizes.zipWithIndex.map { case (n, i) => (s"g$g", i.toLong, n) } }
      data.isEmpty || {
        val got = Packing.shardBalance(
            data.toDF("g", "id", "n"), Seq("g"), "id", "n", shards)
          .as[(String, Long, Long, Int)].collect()
          .map(r => (r._1, r._2) -> r._4).toMap
        val want = data.groupBy(_._1).flatMap { case (g, rows) =>
          rows.sortBy(r => (-r._3, r._2)).zipWithIndex.map {
            case ((_, id, _), r) => (g, id) -> snake(r, shards) }
        }.toMap
        if (got != want) println(s"shards=$shards data=$data\n got=$got\nwant=$want")
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("temperatureMix matches the α=1/2 closed-form model on random " +
      "strata (and boost is antitone in stratum size)") {
    val gen = for {
      k <- Gen.choose(1, 5)
      counts <- Gen.listOfN(k, Gen.choose(1, 30))
    } yield counts
    val prop = Prop.forAll(gen) { counts =>
      val data = counts.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(s"s$i") }
      val got = Sampling.temperatureMix(data.toDF("lang"), "lang")
        .orderBy("lang").as[(String, Long, Double, Double, Double)]
        .collect().toSeq
      val byStratum = counts.zipWithIndex
        .map { case (n, i) => s"s$i" -> n.toLong }.toMap
      val sq = byStratum.view.mapValues(n =>
        math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong).toMap
      val tn = byStratum.values.sum
      val tsq = sq.values.sum
      val want = byStratum.keys.toSeq.sorted.map { k =>
        val n = byStratum(k); val s = sq(k)
        (k, n, r6(n.toDouble / tn), r6(s.toDouble / tsq),
          r6((s * tn).toDouble / (tsq * n)))
      }
      val antitone = got.sortBy(_._2).map(_._5)
        .sliding(2).forall { case Seq(a, b) => a >= b; case _ => true }
      if (got != want || !antitone)
        println(s"counts=$counts\n got=$got\nwant=$want")
      got == want && antitone
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
