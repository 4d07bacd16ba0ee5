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

  /** Bounded per-series extreme-POINTS aggregate — the InfluxQL
    * TOP/BOTTOM(field, n) ranking (value extreme first, ties to the
    * EARLIER timestamp; reference influxdb 1.x query/select.go top/bottom
    * reducers) as a partial-aggregable Aggregator instead of a window.
    *
    * Why not `row_number() OVER (PARTITION BY series ORDER BY ...)`:
    * map-side WindowGroupLimit prunes only when a partition holds >= k
    * rows of a series — at high series count (the r13 ×100 TSDB
    * measurement: 973× shuffle ratio on events_top_points) partitions
    * hold <k rows/series and the window path shuffles the FULL table.
    * This aggregate's map-side partial reduces every task's slice to <=k
    * points per (task, series) before the exchange, so shuffled bytes are
    * bounded by k x series, independent of row count.
    *
    * Two value types so no caller pays a lossy cast: int64 fields beyond
    * 2^53 would corrupt under a double round-trip. */
  case class PtD(v: Double, t: Long)
  case class PtL(v: Long, t: Long)

  private def bounded[A](k: Int, ord: Ordering[A]): (Seq[A], A) => Seq[A] = {
    // buffer kept sorted best-first; a full buffer rejects a loser in
    // O(1) (no per-row sort on the hot path)
    (b: Seq[A], a: A) =>
      if (b.size < k) (b :+ a).sorted(ord)
      else if (ord.lt(a, b.last)) (b.dropRight(1) :+ a).sorted(ord)
      else b
  }

  class TopPointsD(k: Int, bottom: Boolean)
      extends Aggregator[PtD, Seq[PtD], Seq[PtD]] {
    require(k > 0, "n must be positive")
    // explicit tuple ordering: value extreme first, then earlier time
    private val rank: Ordering[PtD] = Ordering.Tuple2(
      if (bottom) Ordering.Double.TotalOrdering
      else Ordering.Double.TotalOrdering.reverse,
      Ordering.Long).on((x: PtD) => (x.v, x.t))
    private val step = bounded(k, rank)
    override def zero: Seq[PtD] = Nil
    override def reduce(b: Seq[PtD], a: PtD): Seq[PtD] = step(b, a)
    override def merge(a: Seq[PtD], b: Seq[PtD]): Seq[PtD] =
      (a ++ b).sorted(rank).take(k)
    override def finish(r: Seq[PtD]): Seq[PtD] = r
    override def bufferEncoder: Encoder[Seq[PtD]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[PtD]] = ExpressionEncoder()
  }

  class TopPointsL(k: Int, bottom: Boolean)
      extends Aggregator[PtL, Seq[PtL], Seq[PtL]] {
    require(k > 0, "n must be positive")
    private val rank: Ordering[PtL] = Ordering.Tuple2(
      if (bottom) Ordering.Long else Ordering.Long.reverse,
      Ordering.Long).on((x: PtL) => (x.v, x.t))
    private val step = bounded(k, rank)
    override def zero: Seq[PtL] = Nil
    override def reduce(b: Seq[PtL], a: PtL): Seq[PtL] = step(b, a)
    override def merge(a: Seq[PtL], b: Seq[PtL]): Seq[PtL] =
      (a ++ b).sorted(rank).take(k)
    override def finish(r: Seq[PtL]): Seq[PtL] = r
    override def bufferEncoder: Encoder[Seq[PtL]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[PtL]] = ExpressionEncoder()
  }

  /** `topPointsD(k, bottom)(valueCol, timeCol)`: array of the k extreme
    * (v, t) structs, rank order. */
  def topPointsD(k: Int, bottom: Boolean): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopPointsD(k, bottom), ExpressionEncoder[PtD]())

  def topPointsL(k: Int, bottom: Boolean): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopPointsL(k, bottom), ExpressionEncoder[PtL]())
}
