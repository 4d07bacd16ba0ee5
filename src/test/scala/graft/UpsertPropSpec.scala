package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.Selectors
import graft.operators.Upsert

/** Model-based property tests for the two core value-selection
  * primitives, checked against executable Scala models of the reference
  * semantics:
  *
  *  - Upsert.dedup == "per (tags, time) and per field INDEPENDENTLY, the
  *    last non-null value in arrival order" (DeduplicateExec,
  *    query/src/provider/deduplicate.rs:72-105);
  *  - selector first/last/min/max == the reference accumulators incl.
  *    tie rules (selectors.rs:108-116: min/max break value ties by
  *    EARLIEST time) over non-null values only.
  *
  * Generators force collisions hard: tiny tag/time/value domains so most
  * keys duplicate, ~half the field values null, shuffled arrival. Cases
  * are few but large (hundreds of rows over dozens of colliding groups
  * per case) — each case is a Spark job, so collision density per case
  * buys more than case count. */
class UpsertPropSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop, min: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // row: (tag, time, f1, f2, seq-position filled in later)
  private case class Row(tag: String, time: Long, f1: Option[Double],
    f2: Option[Long])

  private val rowGen: Gen[Row] = for {
    tag <- Gen.oneOf("a", "b", "c")
    time <- Gen.choose(0L, 5L)
    f1 <- Gen.option(Gen.oneOf(1.0, 2.0, 3.0))
    f2 <- Gen.option(Gen.choose(0L, 9L))
  } yield Row(tag, time, f1, f2)

  private val batchGen: Gen[List[Row]] =
    Gen.choose(50, 300).flatMap(n => Gen.listOfN(n, rowGen))

  test("dedup == last-non-null-per-field model over colliding batches") {
    check("dedup-model", Prop.forAllNoShrink(batchGen) { rows =>
      val seqd = rows.zipWithIndex // arrival order = list position
      val model = seqd.groupBy(r => (r._1.tag, r._1.time)).map {
        case ((tag, time), members) =>
          def lastNonNull[A](get: Row => Option[A]): Option[A] =
            members.reverseIterator.map(m => get(m._1)).collectFirst {
              case Some(v) => v
            }
          (tag, time, lastNonNull(_.f1), lastNonNull(_.f2))
      }.toSet
      val df = seqd.map { case (r, i) =>
        (r.tag, r.time, r.f1, r.f2, i.toLong) }
        .toDF("tag", "time", "f1", "f2", "seq")
      val got = Upsert.dedup(df, Seq("tag", "time"), "seq")
        .as[(String, Long, Option[Double], Option[Long])].collect().toSet
      got == model
    }, min = 12)
  }

  test("selectors == reference accumulator model incl. tie rules") {
    check("selector-model", Prop.forAllNoShrink(batchGen) { rows =>
      // model over non-null f1 values only, per tag
      val model = rows.groupBy(_.tag).map { case (tag, members) =>
        val vs = members.collect { case Row(_, t, Some(v), _) => (v, t) }
        def pick(sel: Seq[(Double, Long)] => (Double, Long)) =
          if (vs.isEmpty) None else Some(sel(vs))
        (tag,
          pick(_.minBy { case (v, t) => (t, v) }),   // first: min time, tie min value
          pick(_.maxBy { case (v, t) => (t, v) }),   // last: max time, tie max value
          pick(_.minBy { case (v, t) => (v, t) }),   // min: min value, tie EARLIEST time
          pick(_.maxBy { case (v, t) => (v, -t) }))  // max: max value, tie EARLIEST time
      }.toSet
      val df = rows.map(r => (r.tag, r.time, r.f1))
        .toDF("tag", "time", "f1")
      val got = df.groupBy("tag").agg(
        Selectors.selectorFirst(col("f1"), col("time")).as("first"),
        Selectors.selectorLast(col("f1"), col("time")).as("last"),
        Selectors.selectorMin(col("f1"), col("time")).as("min"),
        Selectors.selectorMax(col("f1"), col("time")).as("max"))
        .select(col("tag"),
          col("first.value"), col("first.time"),
          col("last.value"), col("last.time"),
          col("min.value"), col("min.time"),
          col("max.value"), col("max.time"))
        .as[(String, Option[Double], Option[Long], Option[Double], Option[Long],
          Option[Double], Option[Long], Option[Double], Option[Long])]
        .collect()
        .map(t => (t._1, t._2.zip(t._3), t._4.zip(t._5),
          t._6.zip(t._7), t._8.zip(t._9)))
        .toSet
      got == model
    }, min = 12)
  }
}
