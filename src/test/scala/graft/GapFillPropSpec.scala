package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.GapFill

/** Property tests for gap filling: random sparse series against an
  * in-memory model of the InfluxQL fill() semantics. Spark runs are
  * expensive per case, so the generator builds a BATCH of series per
  * case and the case count stays small — the coverage comes from the
  * randomized (key, bucket, hole-pattern) structure, not case volume. */
class GapFillPropSpec extends SparkSpec {
  import spark.implicits._

  private val Start = 0L
  private val Every = 10L
  private val Stop = 100L // 10 buckets
  private val buckets = (Start until Stop by Every).toSeq

  // a series = key -> observed (bucket index -> value)
  private val seriesGen: Gen[Map[Int, Map[Int, Double]]] = for {
    nKeys <- Gen.choose(1, 4)
    perKey <- Gen.listOfN(nKeys, for {
      n <- Gen.choose(1, 8)
      idx <- Gen.pick(n, buckets.indices)
      vs <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
    } yield idx.zip(vs).toMap)
  } yield perKey.zipWithIndex.map { case (m, k) => k -> m }.toMap

  private def run(data: Map[Int, Map[Int, Double]],
      strat: GapFill.Strategy): Map[(Int, Long), Option[Double]] = {
    val rows = for {
      (k, obs) <- data.toSeq; (bi, v) <- obs.toSeq
    } yield (k, Start + bi * Every, v)
    val df = rows.toDF("k", "t", "v")
    GapFill.onGrid(df, Seq("k"), "t", Start, Stop, Every,
        Map("v" -> strat))
      .select($"k", $"t", $"v").as[(Int, Long, Option[Double])]
      .collect().map { case (k, t, v) => (k, t) -> v }.toMap
  }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("grid completeness: every key x bucket exactly once, any strategy") {
    check("grid", Prop.forAll(seriesGen) { data =>
      val out = run(data, GapFill.KeepNull)
      out.keySet == (for (k <- data.keySet; b <- buckets) yield (k, b)).toSet
    })
  }

  test("observed buckets keep their value under every strategy") {
    check("observed", Prop.forAll(seriesGen) { data =>
      Seq(GapFill.KeepNull, GapFill.Value(lit(0.0)), GapFill.Previous,
        GapFill.Linear).forall { strat =>
        val out = run(data, strat)
        data.forall { case (k, obs) => obs.forall { case (bi, v) =>
          out((k, Start + bi * Every)).contains(v)
        } }
      }
    })
  }

  test("previous-fill matches the last-observation model") {
    check("previous", Prop.forAll(seriesGen) { data =>
      val out = run(data, GapFill.Previous)
      data.forall { case (k, obs) =>
        buckets.indices.forall { bi =>
          val expect = obs.filter(_._1 <= bi)
            .maxByOption(_._1).map(_._2)
          out((k, Start + bi * Every)) == expect
        }
      }
    })
  }

  test("linear-fill matches the interpolation model; edges stay null") {
    check("linear", Prop.forAll(seriesGen) { data =>
      val out = run(data, GapFill.Linear)
      data.forall { case (k, obs) =>
        buckets.indices.forall { bi =>
          val prev = obs.filter(_._1 <= bi).maxByOption(_._1)
          val next = obs.filter(_._1 >= bi).minByOption(_._1)
          val expect = (prev, next) match {
            case (Some((pi, pv)), _) if pi == bi => Some(pv)
            case (Some((pi, pv)), Some((ni, nv))) =>
              Some(pv + (nv - pv) * (bi - pi).toDouble / (ni - pi))
            case _ => None
          }
          val got = out((k, Start + bi * Every))
          (expect, got) match {
            case (Some(e), Some(g)) => math.abs(e - g) < 1e-9
            case (e, g) => e == g
          }
        }
      }
    })
  }
}
