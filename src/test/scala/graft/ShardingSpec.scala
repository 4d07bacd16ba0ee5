package graft

import org.apache.spark.sql.functions._
import graft.core.Sharding
import graft.core.Sharding._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("a", 4.0))
    .toDF("host", "v")

  test("specific matcher wins over the hash ring") {
    val cfg = ShardConfig(
      specificTargets = Seq(Matcher("^cpu$") -> 7),
      hashRing = Some(HashRing(includeTable = false, Seq("host"), IndexedSeq(0, 1))))
    val c = Sharding.shardColumn("cpu", cfg).get
    assert(df.select(c).distinct().as[Int].collect().toSeq == Seq(7))
  }

  test("hash ring: deterministic, key-stable, covers only ring shards") {
    val cfg = ShardConfig(hashRing =
      Some(HashRing(includeTable = true, Seq("host"), IndexedSeq(10, 20, 30))))
    val c = Sharding.shardColumn("mem", cfg).get
    val byHost = df.withColumn("shard", c)
      .select("host", "shard").distinct().as[(String, Int)].collect()
    // same host -> same shard, shards from the ring only
    assert(byHost.groupBy(_._1).values.forall(_.length == 1))
    assert(byHost.map(_._2).toSet.subsetOf(Set(10, 20, 30)))
    // table name participates: a different table may route differently
    val c2 = Sharding.shardColumn("disk", cfg).get
    val both = df.withColumn("s1", c).withColumn("s2", c2)
      .select("s1", "s2").distinct().collect()
    assert(both.nonEmpty) // computed without error; values drawn from ring
  }

  test("no rule -> None") {
    assert(Sharding.shardColumn("t", ShardConfig()).isEmpty)
  }
}
