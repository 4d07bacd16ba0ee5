package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import graft.server.{HttpFacade, SqlRepl}
import graft.server.SqlRepl.ReplCommand
import graft.server.SqlRepl.ReplCommand._

/** The operator SQL REPL (reference src/commands/sql.rs family): the
  * command grammar unit tests ported from repl_command.rs:150-260, and a
  * full scripted session against a loopback HTTP facade — use/select/
  * format switching, the no-database hint, multi-line statements, and
  * OBSERVER mode's unified system-table views (observer.rs). */
class SqlReplSpec extends SparkSpec {

  // ------------------------------------------------ repl_command.rs tests

  private def p(s: String): ReplCommand = ReplCommand.parse(s) match {
    case Right(c) => c
    case Left(e) => fail(s"parse('$s') errored: $e")
  }

  test("repl commands parse case-insensitively with optional ';' (repl_command.rs)") {
    for (v <- Seq("help", "help;", "HELP", "Help;", "  Help;  ",
        "help arg1 arg2")) // extra tokens after help are ignored
      assert(p(v) == Help, v)
    for (v <- Seq("observer", "observer;", "OBSERVER", "Observer;"))
      assert(p(v) == Observer, v)
    for (v <- Seq("exit", "exit;", "EXIT", "quit", "QUIT;"))
      assert(p(v) == Exit, v)
    assert(p("show databases") == ShowDatabases)
    assert(p("SHOW DATABASES;") == ShowDatabases)
    assert(p("set format csv") == SetFormat("csv"))
    assert(p("SET FORMAT Json;") == SetFormat("Json")) // raw case carried
  }

  test("use database carries the ORIGINAL case of the name (repl_command.rs:200)") {
    assert(p("use database Foo;") == UseDatabase("Foo"))
    assert(p("USE DATABASE foo") == UseDatabase("foo"))
    assert(p("use Foo") == UseDatabase("Foo"))
    // missing name is a parse error, not SQL
    assert(ReplCommand.parse("use database;").isLeft)
    assert(ReplCommand.parse("   ").isLeft) // empty = no command
  }

  test("anything unrecognized is SQL verbatim (repl_command.rs fallthrough)") {
    assert(p("SELECT * FROM foo;") == SqlCommand("SELECT * FROM foo;"))
    assert(p("show tables;") == SqlCommand("show tables;"))
    assert(p("using db") == SqlCommand("using db"))
  }

  // ----------------------------------------------------- scripted session

  private def runSession(facade: HttpFacade, script: String): String = {
    val bos = new ByteArrayOutputStream()
    val repl = new SqlRepl.Repl(s"http://127.0.0.1:${facade.boundPort}",
      new PrintStream(bos, true, "UTF-8"), () => spark)
    repl.loop(new BufferedReader(new StringReader(script)), echoPrompt = false)
    new String(bos.toByteArray, UTF_8)
  }

  private def write(port: Int, lp: String): Unit = {
    val conn = new URI(s"http://127.0.0.1:$port/api/v2/write?org=o&bucket=b")
      .toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(lp.getBytes(UTF_8))
    conn.getOutputStream.close()
    assert(conn.getResponseCode == 204)
  }

  test("scripted session: help, show databases, use, sql, formats, hints, exit") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    try {
      write(facade.boundPort, "cpu,host=a usage=1.5 100\ncpu,host=b usage=2.5 200")
      val out = runSession(facade,
        """help;
          |SELECT 1;
          |show databases;
          |use database o_b;
          |SELECT host, usage, time FROM cpu ORDER BY host;
          |set format csv;
          |SELECT host, usage
          |FROM cpu ORDER BY host;
          |set format nope;
          |exit
          |""".stripMargin)
      assert(out.contains("Ready for commands"))
      assert(out.contains("USE [DATABASE] <name>")) // help text
      // SQL before USE: the reference's hint
      assert(out.contains("Error: no database selected."))
      assert(out.contains("Hint: Run USE DATABASE <dbname> to select database"))
      assert(out.contains("o_b")) // show databases listed it
      // pretty result from the remote query
      assert(out.contains("| a") && out.contains("1.5"))
      assert(out.contains("2 rows"))
      // multi-line csv query after set format
      assert(out.contains("host,usage") && out.contains("b,2.5"))
      // bad format is the reference's error wording
      assert(out.contains("Unknown format type: nope. " +
        "Expected one of 'pretty', 'csv' or 'json'"))
    } finally facade.stop()
  }

  test("observer mode: unified system tables across databases with database_name") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    try {
      write(facade.boundPort, "cpu,host=a usage=1.5 100")
      val conn = new URI(s"http://127.0.0.1:${facade.boundPort}" +
        "/api/v2/write?org=o&bucket=c").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write("mem,host=b used=9i 200".getBytes(UTF_8))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 204)

      val out = runSession(facade,
        """observer;
          |SELECT database_name, table_name, storage FROM system_chunks ORDER BY database_name;
          |SELECT database_name, count(*) AS n FROM system_columns GROUP BY database_name ORDER BY database_name;
          |quit
          |""".stripMargin)
      assert(out.contains("Preparing local views of remote system tables"),
        s"observer banner missing: $out")
      // both databases' chunks, each tagged with its database_name
      assert(out.contains("o_b") && out.contains("o_c"), s"missing dbs: $out")
      assert(out.contains("cpu") && out.contains("mem"))
      assert(out.contains("OpenMutableBuffer"))
    } finally facade.stop()
  }

  test("direct system-table queries over the HTTP query endpoint (sql.rs:260-361 analog)") {
    val facade = new HttpFacade(spark, port = 0, clockNs = () => 42L)
    try {
      write(facade.boundPort, "cpu,host=a usage=1.5 100\nmem,host=b used=9i 200")
      def q(sql: String): (Int, String) = {
        val conn = new URI(s"http://127.0.0.1:${facade.boundPort}" +
          s"/iox/api/v1/databases/o_b/query?q=${java.net.URLEncoder.encode(sql, "UTF-8")}" +
          "&format=csv").toURL.openConnection().asInstanceOf[HttpURLConnection]
        val status = conn.getResponseCode
        val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
        (status, if (is == null) "" else new String(is.readAllBytes(), UTF_8))
      }
      val (s1, chunks) = q(
        "SELECT id, table_name, storage, row_count FROM system_chunks ORDER BY table_name")
      assert(s1 == 200 && chunks.contains("cpu") && chunks.contains("mem") &&
        chunks.contains("OpenMutableBuffer"), s"$s1 $chunks")
      val (s2, cols) = q(
        """SELECT column_name, category FROM system_columns
           WHERE table_name = 'cpu' ORDER BY column_name""")
      assert(s2 == 200 && cols.contains("host,tag") && cols.contains("usage,field") &&
        cols.contains("time,time"), s"$s2 $cols")
      val (s3, ccols) = q(
        """SELECT chunk_id, table_name, column_name, row_count, min_value, max_value
           FROM system_chunk_columns WHERE column_name = 'usage'""")
      assert(s3 == 200 && ccols.contains("cpu,usage,1,1.5,1.5"), s"$s3 $ccols")
      val (s4, _) = q("SELECT id, status, kind FROM system_operations")
      assert(s4 == 200)
    } finally facade.stop()
  }
}
