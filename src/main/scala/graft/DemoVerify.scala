package graft

// End-to-end drive of the public library surface, the way a user of the
// engine would call it (LP ingest -> InfluxRPC ops -> dedup pipeline).
// Run with `sbt "runMain graft.DemoVerify"`; doubles as API documentation.
object DemoVerify {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.core.RpcPredicate
    import graft.operators.InfluxRpc
    import graft.operators.InfluxRpc.AggKind
    import graft.sources.{LineProtocol, Tables}
    import graft.pipeline.DocDedup

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== 1. line protocol ingest -> readGroup ===")
    val dfs = LineProtocol.ingest(spark, Seq(
      "cpu,host=a,region=west user=22.5,sys=1.0 100",
      "cpu,host=a,region=west user=24.0,sys=1.5 200",
      "cpu,host=b,region=east user=9.9,sys=0.4 150",
      "mem,host=a free=1024i 100"))
    InfluxRpc.readGroup(dfs("cpu"), RpcPredicate(), AggKind.Mean).show()

    println("=== 2. readWindowAggregate on real events table (sf0.001) ===")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("ts_ns", "time")
    import graft.core.IoxSchema
    val evTagged = spark.createDataFrame(ev.select("event_type", "value", "time").rdd,
      org.apache.spark.sql.types.StructType(Seq(
        IoxSchema.tagged("event_type", org.apache.spark.sql.types.StringType, IoxSchema.Tag),
        IoxSchema.tagged("value", org.apache.spark.sql.types.DoubleType, IoxSchema.Field),
        IoxSchema.tagged("time", org.apache.spark.sql.types.LongType, IoxSchema.Time))))
    InfluxRpc.readWindowAggregate(evTagged, RpcPredicate(), AggKind.Count,
      everyNs = 6L * 3600 * 1000000000L).show(8)

    println("=== 3. minhash near-dup pairs on real documents (sf0.001) ===")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = DocDedup.minHashDedupPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.7, DocDedup.MinHashParams(32, 16))
    pairs.orderBy("id1", "id2").show(5)
    println(s"near-dup pairs found: ${pairs.count()}")

    println("=== 4. probe: malformed line protocol surfaces a clear error ===")
    try {
      LineProtocol.ingest(spark, Seq("cpu,host=a"))
      println("NO ERROR (unexpected)")
    } catch { case e: Exception => println(s"error surfaced: ${e.getMessage}") }

    println("=== 5. probe: type-conflicting LP writes rejected at ingest ===")
    try {
      LineProtocol.ingest(spark, Seq("m f=1.0 1", "m f=2i 2"))
      println("NO ERROR (unexpected)")
    } catch { case e: Exception => println(s"error surfaced: ${e.getMessage}") }

    spark.stop()
  }
}
