package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Write sharding (reference ShardConfig / Matcher / HashRing,
  * data_types/src/database_rules.rs:298-394): route rows to shards either
  * by a table-name matcher (specific targets) or by hashing selected
  * columns (+ optionally the table name) onto a ring of shard ids.
  *
  * In Spark the shard id becomes a column driving `repartition` (or a
  * Kafka topic-partition key) — the shuffle IS the shard router, so this
  * stays a thin, deterministic key computation. xxhash64 is a stable
  * cross-version Spark built-in, fully codegen'd.
  */
object Sharding {

  /** Table-name matcher (reference Matcher: regex on the table). The
    * compiled pattern is cached: shard routing calls this once per LP
    * line on the write path, and `.r` recompiles per call. */
  final case class Matcher(tableRegex: String) {
    private lazy val compiled = tableRegex.r
    def matches(table: String): Boolean = compiled.findFirstIn(table).isDefined
  }

  /** Consistent column-hash ring over `shards` ids. */
  final case class HashRing(includeTable: Boolean, columns: Seq[String],
      shards: IndexedSeq[Int]) {
    require(shards.nonEmpty, "ring needs at least one shard")
  }

  final case class ShardConfig(
      specificTargets: Seq[(Matcher, Int)] = Nil,
      hashRing: Option[HashRing] = None)

  /** Shard id for every row of `table`; specific matchers win over the
    * ring, like the reference's resolution order. Returns None when no
    * rule applies (reference: an error unless ignore_errors). */
  def shardColumn(table: String, config: ShardConfig): Option[Column] =
    config.specificTargets.find(_._1.matches(table)).map(t => lit(t._2))
      .orElse(config.hashRing.map { ring =>
        val hashed = (if (ring.includeTable) Seq(lit(table)) else Nil) ++
          ring.columns.map(col)
        val slot = pmod(xxhash64(hashed: _*), lit(ring.shards.size.toLong)).cast("int")
        element_at(array(ring.shards.map(lit): _*), slot + 1)
      })
}
