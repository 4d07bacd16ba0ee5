package graft

import graft.sources.LineProtocol
import graft.sources.LineProtocol._
import graft.core.{IoxSchema, NsTime}

class LineProtocolSpec extends SparkSpec {

  test("basic line with tags, fields, timestamp") {
    val l = parseLine("""cpu,host=a,region=west user=22.5,system=1i,up=t 1626006651000000000""")
    assert(l.measurement == "cpu")
    assert(l.tags == Seq("host" -> "a", "region" -> "west"))
    assert(l.fields == Seq("user" -> F64(22.5), "system" -> I64(1), "up" -> Bool(true)))
    assert(l.timestampNs.contains(1626006651000000000L))
  }

  test("escaping: commas, spaces, equals in identifiers") {
    val l = parseLine("""my\,meas\ urement,tag\ key=va\=lue field\,key=1.0""")
    assert(l.measurement == "my,meas urement")
    assert(l.tags == Seq("tag key" -> "va=lue"))
    assert(l.fields.head._1 == "field,key")
  }

  test("string field values with escaped quotes and backslashes") {
    val l = parseLine("""m f="say \"hi\" \\ there" 5""")
    assert(l.fields == Seq("f" -> Str("""say "hi" \ there""")))
    assert(l.timestampNs.contains(5L))
  }

  test("field value types: i, u, bool variants, float") {
    val l = parseLine("""m a=1i,b=2u,c=3.5,d=true,e=F,f=-7i,g=1e+3""")
    assert(l.fields.toMap == Map(
      "a" -> I64(1), "b" -> U64(2), "c" -> F64(3.5), "d" -> Bool(true),
      "e" -> Bool(false), "f" -> I64(-7), "g" -> F64(1000.0)))
    // exponents without an explicit sign are rejected, per the reference
    // grammar (lib.rs parse_scientific_float negative vectors)
    assertThrows[LpException](parseLine("m g=1e3"))
  }

  test("u64 beyond i64 range") {
    val l = parseLine("m a=18446744073709551615u 1")
    assert(l.fields.head._2 == U64(BigInt("18446744073709551615")))
  }

  test("no timestamp -> None; comments and blanks skipped") {
    val ls = parseLines(Seq("# comment", "", "m f=1")).toSeq
    assert(ls.size == 1 && ls.head.timestampNs.isEmpty)
  }

  test("malformed lines throw") {
    assertThrows[LpException](parseLine("just_a_measurement"))
    assertThrows[LpException](parseLine("m,tag= f=1"))
    assertThrows[LpException](parseLine("m f="))
    assertThrows[LpException](parseLine("""m f="unterminated"""))
  }

  test("lenient distributed ingest skips malformed lines and counts them") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("badLines")
    val lines = Seq(
      "cpu,host=a usage=1.5 100",
      "cpu,host=b usage=not_a_number 150", // malformed: skipped, counted
      "cpu,host=c usage=3.0 200").toDS()
    val schema = inferSchema(Seq(parseLine("cpu,host=a usage=1.5 100")))
    val out = ingestAs(lines, "cpu", schema, lenient = true, badLines = Some(acc))
    assert(out.count() == 2)
    assert(acc.value == 1L)
    // strict mode keeps the API-edge contract: the batch fails
    assertThrows[org.apache.spark.SparkException](
      ingestAs(lines, "cpu", schema).count())
  }

  test("format -> parse round-trip") {
    val orig = ParsedLine("me as,ure", Seq("t 1" -> "v,1", "t2" -> "x=y"),
      Seq("f" -> F64(1.5), "s" -> Str("""q"uo\te"""), "i" -> I64(-3), "b" -> Bool(false)),
      Some(42L))
    assert(parseLine(format(orig)) == orig)
  }

  test("schema inference: tags string, fields typed, time long; conflicts rejected") {
    val lines = parseLines(Seq(
      "weather,city=sf temp=60.1,humid=0.8 1",
      "weather,city=la,station=a temp=72.0,code=5i 2")).toSeq
    val schema = inferSchema(lines)
    assert(IoxSchema.tagColumns(schema) == Seq("city", "station"))
    assert(IoxSchema.fieldColumns(schema) == Seq("temp", "humid", "code"))
    assert(schema.fieldNames.last == NsTime.TimeColumn)
    assertThrows[LpException](
      inferSchema(parseLines(Seq("m f=1.0 1", "m f=1i 2")).toSeq))
    assertThrows[LpException](
      inferSchema(parseLines(Seq("m,x=t f=1 1", "m x=2.0 2")).toSeq))
  }

  test("batch ingest to DataFrames per measurement") {
    val dfs = LineProtocol.ingest(spark, Seq(
      "h2o,state=CA,city=SF temp=60.1 10",
      "h2o,state=CA,city=LA temp=72.0 20",
      "air,state=CA co2=410.0 10"))
    assert(dfs.keySet == Set("h2o", "air"))
    val h2o = dfs("h2o")
    assert(h2o.count() == 2)
    val row = h2o.orderBy("time").head()
    assert(row.getAs[String]("state") == "CA")
    assert(row.getAs[Double]("temp") == 60.1)
    assert(row.getAs[Long]("time") == 10L)
  }

  test("distributed ingestAs parses in executors") {
    import spark.implicits._
    val lines = Seq("cpu,host=a v=1.0 1", "cpu,host=b v=2.0 2", "mem,host=a v=9 3",
      "# skip", "cpu,host=c v=3.0 3").toDS().repartition(3)
    val schema = inferSchema(parseLines(Seq("cpu,host=a v=1.0 1")).toSeq)
    val df = LineProtocol.ingestAs(lines, "cpu", schema)
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("host", "v", "time"))
  }
}
