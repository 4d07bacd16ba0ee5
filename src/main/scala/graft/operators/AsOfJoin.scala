package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest
  * right row with `rightTime < leftTime` (strict) sharing the join keys.
  *
  * NOT implemented as join + per-row rank: an equi-join on the key
  * expands to |left_user| x |right_user| rows before ranking — quadratic
  * in per-key activity. Instead both sides are UNIONED and sorted once
  * per key partition; a running `last(payload, ignoreNulls)` window with
  * frame (unbounded preceding, -1) carries the newest right payload
  * forward — one shuffle, one sort, linear scan, no expansion. Right rows
  * order AFTER left rows on equal timestamps (`__side`), which is exactly
  * the strict `<` semantics.
  *
  * The reference has no as-of operator (its data model is single-table);
  * this is part of the training-pipeline surface built on the same
  * engine.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String], toleranceNs: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    require(toleranceNs.forall(_ >= 0), "tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTimeCol)).withColumn("__side", lit(0))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTimeCol).as("__t"), lit(1).as("__side")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = struct(col("__t").as("__rt") +: payloadCols.map(c => col(s"__p_$c")): _*)
    val matched = unioned.withColumn("__m",
      last(when(col("__side") === 1, carried), ignoreNulls = true).over(w))

    // merge_asof-style tolerance: a match farther back than toleranceNs
    // is no match at all (the carried payload nulls out, like a miss)
    val tol = toleranceNs.map(t => matched.withColumn("__m",
      when(col("__t") - col("__m.__rt") <= t, col("__m"))))
      .getOrElse(matched)
    tol.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        (col("__m.__rt").as(rightTimeCol) +:
          payloadCols.map(c => col(s"__m.__p_$c").as(c))): _*)
  }

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `rightTime > leftTime` (strict) sharing the keys — the mirror of
    * [[backward]] with the same union+window shape. Right rows order
    * BEFORE left rows on equal timestamps, which is exactly the strict
    * `>` semantics. */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String], toleranceNs: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    require(toleranceNs.forall(_ >= 0), "tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTimeCol)).withColumn("__side", lit(1))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTimeCol).as("__t"), lit(0).as("__side")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(1, Window.unboundedFollowing)
    val carried = struct(col("__t").as("__rt") +: payloadCols.map(c => col(s"__p_$c")): _*)
    val matched = unioned.withColumn("__m",
      first(when(col("__side") === 0, carried), ignoreNulls = true).over(w))
    val tol = toleranceNs.map(t => matched.withColumn("__m",
      when(col("__m.__rt") - col("__t") <= t, col("__m"))))
      .getOrElse(matched)
    tol.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        (col("__m.__rt").as(rightTimeCol) +:
          payloadCols.map(c => col(s"__m.__p_$c").as(c))): _*)
  }

  /** Nearest as-of: the right row MINIMIZING `|rightTime − leftTime|`
    * (strict on both sides — an exactly-equal timestamp matches neither
    * direction, keeping the two passes' semantics symmetric), ties to
    * the EARLIER (backward) match. One union, one key exchange, two
    * window sorts (the equal-timestamp strictness of `<` and `>` needs
    * opposite tie orders, so the two carries cannot share one sort) —
    * still never the quadratic join+rank expansion. */
  def nearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      payloadCols: Seq[String], toleranceNs: Option[Long] = None): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
    require(toleranceNs.forall(_ >= 0), "tolerance must be >= 0")
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__t", col(leftTimeCol)).withColumn("__side", lit(0))
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTimeCol).as("__t"), lit(1).as("__side")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val carried = struct(col("__t").as("__rt") +: payloadCols.map(c => col(s"__p_$c")): _*)
    val wb = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side").desc)
      .rowsBetween(1, Window.unboundedFollowing)
    val m0 = unioned
      .withColumn("__mb",
        last(when(col("__side") === 1, carried), ignoreNulls = true).over(wb))
      .withColumn("__mf",
        first(when(col("__side") === 1, carried), ignoreNulls = true).over(wf))
    // tolerance prunes each DIRECTION's candidate before the pick — a
    // beyond-tolerance near side must not shadow an in-tolerance far side
    val m = toleranceNs.map(t => m0
      .withColumn("__mb",
        when(col("__t") - col("__mb.__rt") <= t, col("__mb")))
      .withColumn("__mf",
        when(col("__mf.__rt") - col("__t") <= t, col("__mf"))))
      .getOrElse(m0)
    val pickB = col("__mb").isNotNull && (col("__mf").isNull ||
      (col("__t") - col("__mb.__rt")) <= (col("__mf.__rt") - col("__t")))
    m.filter(col("__side") === 0)
      .withColumn("__m", when(pickB, col("__mb")).otherwise(col("__mf")))
      .select(leftCols.map(col) ++
        (col("__m.__rt").as(rightTimeCol) +:
          payloadCols.map(c => col(s"__m.__p_$c").as(c))): _*)
  }
}
