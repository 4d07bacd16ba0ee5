package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a cold tail — the shape that breaks
  // single-reducer aggregation at scale
  private lazy val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"cold$i", i.toDouble))).toDF("k", "v")

  test("salted aggregation equals the unsalted answer") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", factor = 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salt actually spreads the hot key over multiple groups") {
    val nSalts = skewed.withColumn("__salt", Skew.saltColumn(skewed, 8))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(nSalts > 4, s"hot key landed on only $nSalts salts")
  }

  test("salted join equals the plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "label")
      .as[(String, Double, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 4)
      .select("k", "v", "label").as[(String, Double, String)].collect().toSet
    assert(salted == plain)
  }
}
