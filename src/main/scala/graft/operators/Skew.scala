package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual tool for hot keys that
  * overwhelm one reducer. AQE's skew-join handles sort-merge JOINS at
  * runtime; salting is the equivalent for AGGREGATIONS (and for joins
  * where AQE cannot split, e.g. a hot build side), so both paths exist.
  *
  * Salted aggregation is two-phase: partial aggregate on (keys, salt) —
  * spreading one hot key over `factor` reducers — then final aggregate
  * on the keys alone. Works for any algebraic aggregate (sum/count/min/
  * max, or anything with a merge expression).
  *
  * Salted join replicates the (smaller) right side once per salt value
  * and joins on (keys, salt): the hot left key's rows now land on
  * `factor` reducers instead of one. Replication costs |right| x factor,
  * so `factor` stays small (4-16) and the right side should be the
  * smaller input.
  */
object Skew {

  /** Deterministic per-row salt in [0, factor): hashes ALL columns so
    * rows sharing a key still spread (identical full rows co-locate,
    * which is harmless — they aggregate together anyway). */
  def saltColumn(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(factor.toLong)).cast("int")

  /** Two-phase salted aggregation: `aggs` are (partialExpr, mergeExpr,
    * name) triples, e.g. (sum(v), sum(partial), "total"). */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int,
      aggs: Seq[(Column, String => Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", saltColumn(df, factor))
    val partialCols = aggs.map { case (p, _, n) => p.as(s"__p_$n") }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = aggs.map { case (_, m, n) => m(s"__p_$n").as(n) }
    partial.groupBy(keys.map(col): _*)
      .agg(finalCols.head, finalCols.tail: _*)
  }

  /** Convenience: salted sum + count per key group. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      factor: Int): DataFrame =
    saltedAgg(df, keys, factor, Seq(
      (sum(col(valueCol)), p => sum(col(p)), s"sum_$valueCol"),
      (count(lit(1)), p => sum(col(p)), "n")))

  /** Salted inner equi-join on `keys`: left salted, right replicated
    * `factor` times via a salt-range explode. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    val l = left.withColumn("__salt", saltColumn(left, factor))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
