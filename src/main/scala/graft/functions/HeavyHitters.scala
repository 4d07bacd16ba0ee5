package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters as a bounded mergeable AGGREGATE — the
  * "top tokens over 100 TB with k counters" primitive.
  *
  * The exact top-N (explode → groupBy token → global sort) shuffles the
  * whole vocabulary; at web-corpus scale the vocabulary is itself huge.
  * Misra–Gries keeps at most `k` counters per aggregation state with the
  * classic guarantees (Misra & Gries 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS 2012):
  *
  *  - every stored estimate undercounts its true frequency by at most
  *    `N/(k+1)` (N = stream length), and
  *  - any item with true frequency > `N/(k+1)` is GUARANTEED to survive.
  *
  * As a Spark `Aggregator` it gets map-side partial aggregation: each
  * task reduces its slice to ≤ k counters, the shuffle carries one
  * k-entry map per task, and merges subtract the (k+1)-th largest count
  * from everything (the mergeable-summaries rule) — state is O(k)
  * everywhere, never vocabulary-sized.
  *
  * Determinism: with `k` at least the number of distinct keys the
  * summary is EXACT counting (no decrement ever fires) regardless of
  * partitioning — the regime the oracle-checked query runs in. Below
  * that, estimates are partition-order dependent (inherent to MG), but
  * both guarantees above still hold; the spec pins the eviction
  * semantics on a single ordered partition.
  */
object HeavyHitters {

  /** One decrement round: subtract `by` from every counter, drop the
    * non-positive ones. */
  private def decay(m: Map[String, Long], by: Long): Map[String, Long] =
    if (by <= 0) m
    else m.flatMap { case (t, c) => if (c > by) Some(t -> (c - by)) else None }

  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, "need at least one counter")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      b.get(t) match {
        case Some(c) => b.updated(t, c + 1)
        case None if b.size < k => b.updated(t, 1L)
        case None => decay(b, 1L) // the classic all-counters decrement
      }
    override def merge(a: Map[String, Long],
        b: Map[String, Long]): Map[String, Long] = {
      val s = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (s.size <= k) s
      else decay(s, s.values.toSeq.sorted(Ordering[Long].reverse)(k))
    }
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
  }

  /** Column aggregate: `misraGries(k)(tokenCol)` inside an agg returns a
    * map of ≤ k surviving tokens to their (under-)estimated counts. */
  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k), ExpressionEncoder[String]())
}
