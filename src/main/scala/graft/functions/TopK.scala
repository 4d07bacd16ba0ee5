package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a real AGGREGATE, not a window function.
  *
  * `row_number() OVER (PARTITION BY group ORDER BY score)` + filter is the
  * obvious top-k, but it materializes and sorts EVERY row of a group on a
  * single reducer — with few groups (e.g. a handful of ANN queries against
  * a 100 TB corpus) that is a total-sort bottleneck. An Aggregator gets
  * partial aggregation instead: every map task reduces its slice to k
  * rows, the shuffle carries only k rows per (task, group), and the merge
  * is k-way. The reference has no equivalent operator (its selector UDAFs,
  * query/src/func/selectors.rs, are the k=1 special case).
  *
  * Ordering: score DESC, ties by id ASC — identical to the row_number
  * formulation, so results are bit-equal to the windowed version.
  */
object TopK {

  case class Scored(score: Double, id: Long)

  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(x => (-x.score, x.id)).take(k)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = best(b :+ a)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = best(a ++ b)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column aggregate: top-k (score, id) structs, ordered. Apply as
    * `topK(k)(scoreCol, idCol)` inside an agg. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), ExpressionEncoder[Scored]())
}
