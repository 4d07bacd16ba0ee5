package graft

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import graft.server.HttpFacade
import graft.core.InfluxQl

/** The 1.x continuous-query registry statements over /query —
  * CREATE/SHOW/DROP CONTINUOUS QUERY (services/continuous_querier,
  * influxql statement.go) — plus the on-demand scheduler tick
  * ([[HttpFacade.runContinuousQueries]]) landing downsamples through the
  * SELECT ... INTO write path, and the renderer's parse∘render
  * round-trip that SHOW's output text depends on. */
class CqRegistrySpec extends SparkSpec {

  private def withFacade[A](clock: Long)(f: HttpFacade => A): A = {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => clock)
    try f(facade) finally facade.stop()
  }

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    (status, body)
  }

  private def post(port: Int, path: String, body: Array[Byte]): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val status = conn.getResponseCode
    val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
    val out = if (is == null) "" else new String(is.readAllBytes(), UTF_8)
    (status, out)
  }

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def q(p: Int, db: String, stmt: String): (Int, String) =
    get(p, s"/query?db=${enc(db)}&q=${enc(stmt)}")

  private val createCq =
    "CREATE CONTINUOUS QUERY cq1 ON o_b RESAMPLE EVERY 10s FOR 20s " +
      "BEGIN SELECT mean(value) AS value INTO cpu_avg FROM cpu " +
      "GROUP BY time(10s), host fill(none) END"

  test("CREATE / SHOW / DROP CONTINUOUS QUERY round-trip the registry") {
    withFacade(clock = 42L) { facade =>
      val p = facade.boundPort
      // CREATE is db-less (the ON clause names the database)
      val (cs, cb) = get(p, s"/query?q=${enc(createCq)}")
      assert(cs == 200 && !cb.contains("error"), cb)
      // duplicate name on the same db errors in-band, like 1.x
      val (ds, db2) = get(p, s"/query?q=${enc(createCq)}")
      assert(ds == 200 && db2.contains("already exists"))

      // SHOW prints the registered CQ back as its CREATE statement,
      // database riding as a tag
      val (ss, sb) = get(p, s"/query?q=${enc("SHOW CONTINUOUS QUERIES")}")
      assert(ss == 200, sb)
      assert(sb.contains(""""tags":{"database":"o_b"}"""), sb)
      assert(sb.contains("CREATE CONTINUOUS QUERY cq1 ON o_b"), sb)
      // the printed text re-parses to the registered statement
      val shown = sb.split("\\[\\[")(1).split("\"")(3)
      assert(InfluxQl.parseStmt(shown.replace("\\\"", "\"")) ==
        InfluxQl.parseStmt(createCq))

      // DROP removes it; a second DROP reports not-found in-band
      val drop = "DROP CONTINUOUS QUERY cq1 ON o_b"
      val (rs, rb) = get(p, s"/query?q=${enc(drop)}")
      assert(rs == 200 && !rb.contains("error"), rb)
      val (r2, rb2) = get(p, s"/query?q=${enc(drop)}")
      assert(r2 == 200 && rb2.contains("not found"), rb2)
      val (s2, sb2) = get(p, s"/query?q=${enc("SHOW CONTINUOUS QUERIES")}")
      assert(s2 == 200 && !sb2.contains("cq1"))
    }
  }

  test("scheduler tick lands the downsample through the INTO write path") {
    // two 10 s buckets of cpu points; clock at 20 s so the tick's
    // window (RESAMPLE EVERY 10s FOR 20s) covers [0 s, 20 s)
    withFacade(clock = 20000000000L) { facade =>
      val p = facade.boundPort
      val lp = Seq(
        "cpu,host=a value=1 1000000000",
        "cpu,host=a value=3 5000000000",
        "cpu,host=b value=10 2000000000",
        "cpu,host=a value=5 12000000000").mkString("\n")
      assert(post(p, "/api/v2/write?org=o&bucket=b", lp.getBytes(UTF_8))._1 == 204)
      assert(get(p, s"/query?q=${enc(createCq)}")._1 == 200)

      val runs = facade.runContinuousQueries(nowNs = 20000000000L)
      assert(runs == Seq(("o_b", "cq1", 3L)), runs) // 2 buckets @a + 1 @b

      // the downsample is now a queryable measurement: per-host means
      val (qs, qb) = q(p, "o_b",
        "SELECT value FROM cpu_avg GROUP BY host ORDER BY time")
      assert(qs == 200, qb)
      assert(qb.contains(""""tags":{"host":"a"}"""), qb)
      assert(qb.contains("[0,2.0]"), qb)           // host=a, bucket [0,10s)
      assert(qb.contains("[10000000000,5.0]"), qb) // host=a, bucket [10,20s)
      assert(qb.contains("[0,10.0]"), qb)          // host=b, bucket [0,10s)

      // a CQ over a missing measurement reports -1, does not throw
      val bad = "CREATE CONTINUOUS QUERY cq2 ON o_b BEGIN " +
        "SELECT mean(value) AS value INTO nope_avg FROM nope " +
        "GROUP BY time(10s) END"
      assert(get(p, s"/query?q=${enc(bad)}")._1 == 200)
      val runs2 = facade.runContinuousQueries(nowNs = 20000000000L)
      assert(runs2.exists(r => r._2 == "cq2" && r._3 == -1L), runs2)

      // re-running the tick is IDEMPOTENT: the re-written chunk carries
      // identical (tags, time) keys and the store's last-write-wins PK
      // dedup collapses them — 1.x's recompute-the-window semantics
      val (q2s, q2b) = q(p, "o_b",
        "SELECT count(value) AS n FROM cpu_avg")
      assert(q2s == 200, q2b)
      assert(q2b.contains(""""values":[[3]]"""), q2b) // still 3 points, not 6
    }
  }

  test("CQ validation: INTO and a schedule are required") {
    withFacade(clock = 42L) { facade =>
      val p = facade.boundPort
      val noInto = "CREATE CONTINUOUS QUERY c ON d BEGIN " +
        "SELECT mean(value) AS value FROM cpu GROUP BY time(10s) END"
      assert(get(p, s"/query?q=${enc(noInto)}")._2.contains("INTO"))
      val noSched = "CREATE CONTINUOUS QUERY c ON d BEGIN " +
        "SELECT mean(value) AS value INTO x FROM cpu END"
      assert(get(p, s"/query?q=${enc(noSched)}")._2
        .contains("GROUP BY time"))
    }
  }

  test("renderer: parse(render(parse(q))) == parse(q) on gnarly statements") {
    val vectors = Seq(
      createCq,
      "SELECT mean(\"va lue\") AS m, count(x) INTO t FROM cpu " +
        "WHERE host =~ /a\\/b/ AND time > now() - 1h30m " +
        "GROUP BY time(90s, 15s), host fill(previous) " +
        "ORDER BY time DESC LIMIT 5 OFFSET 2 SLIMIT 3 SOFFSET 1",
      "SELECT * FROM /cpu.*/ WHERE s = 'it\\'s' GROUP BY *",
      "SELECT f FROM (SELECT mean(v) AS f FROM m GROUP BY time(10s)) " +
        "WHERE f > 1.5",
      "SELECT f FROM a, b, \"weird name\"",
      "SELECT mean(v) AS v INTO \"mydb\".\"autogen\".cpu_1h FROM cpu " +
        "GROUP BY time(1h)",
      "SELECT v INTO mydb..t FROM m",
      // extreme float literals: Double.toString would emit exponent
      // notation ("1.0E-7") the lexer cannot re-read; the renderer must
      // stay plain-decimal (r13 advice, InfluxQl.renderNum)
      "SELECT v FROM m WHERE f > 0.0000001 AND g < 250000000.5 " +
        "GROUP BY time(10s) fill(0.0000001)",
      "SELECT v FROM m WHERE f = 10000000.0")
    for (v <- vectors) {
      val ast = InfluxQl.parseStmt(v)
      val rendered = InfluxQl.render(ast)
      assert(InfluxQl.parseStmt(rendered) == ast,
        s"round-trip failed:\n  in:  $v\n  out: $rendered")
    }
  }
}
