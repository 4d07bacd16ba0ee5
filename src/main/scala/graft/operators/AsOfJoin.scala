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
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one right payload column")
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

    matched.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        (col("__m.__rt").as(rightTimeCol) +:
          payloadCols.map(c => col(s"__m.__p_$c").as(c))): _*)
  }
}
