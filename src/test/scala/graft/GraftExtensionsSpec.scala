package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection point: a session built with
  * GraftExtensions reaches the custom Catalyst expressions from SQL
  * text. Uses its own session (newSession shares the SparkContext but
  * extensions bind at builder time, so a separate builder run). */
class GraftExtensionsSpec extends AnyFunSuite {

  // install() path: the shared test session already exists, which is
  // exactly the live-session scenario (builder-time extensions only
  // apply to sessions the library constructs itself)
  private lazy val spark: SparkSession = {
    val s = SparkSpec.session.newSession()
    graft.plans.GraftExtensions.install(s)
    s
  }

  test("custom expressions answer from SQL text") {
    def ns(iso: String): Long =
      java.time.Instant.parse(iso).getEpochSecond * 1000000000L

    // fixed windows: the reference golden vector (window.rs:96-118)
    val fixed = spark.sql(
      "SELECT window_bounds_ns(t, 200, 50) AS b FROM VALUES (100L), (300L) v(t)")
      .collect().map(_.getLong(0)).toSeq
    assert(fixed == Seq(250L, 450L))

    // month windows: quarters with an offset (internal.rs vectors)
    val m = spark.sql(
      s"SELECT month_window_stop(${ns("1970-02-01T00:00:00Z")}L, 5, 2) AS b")
      .head().getLong(0)
    assert(m == ns("1970-03-01T00:00:00Z"))

    // hash60 from SQL equals the DataFrame-side expression
    val viaSql = spark.sql("SELECT hash60('the quick brown fox') AS h")
      .head().getLong(0)
    val viaDf = {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      Seq("the quick brown fox").toDF("s")
        .select(graft.functions.TextFunctions.hash60(col("s"))).head().getLong(0)
    }
    assert(viaSql == viaDf)
  }

  test("pipeline scalar functions answer from SQL text and match the " +
      "Column API") {
    import org.apache.spark.sql.functions.{col, lit}
    val texts = Seq("The quick brown fox jumps over the lazy dog!",
      "le la les des une et est 123!!", "x")
    for (t <- texts) {
      val esc = t.replace("'", "''")
      val qSql = spark.sql(s"SELECT quality_score('$esc') AS q")
        .head().getDouble(0)
      val qDf = spark.range(1)
        .select(graft.functions.TextFunctions.qualityScore(lit(t)).as("q"))
        .head().getDouble(0)
      assert(qSql == qDf, s"quality_score($t)")
      val lSql = spark.sql(s"SELECT lang_id('$esc') AS l")
        .head().getString(0)
      val lDf = spark.range(1)
        .select(graft.functions.TextFunctions.langId(lit(t)).as("l"))
        .head().getString(0)
      assert(lSql == lDf, s"lang_id($t)")
    }
    // the macro works over table columns, not just literals
    val n = spark.sql(
      "SELECT count(*) FROM VALUES ('good text here'), ('..!!..') v(t) " +
        "WHERE quality_score(t) > 0.5").head().getLong(0)
    assert(n >= 1)
  }

  test("argument validation surfaces as analysis-time errors") {
    assertThrows[Exception](
      spark.sql("SELECT month_window_stop(1L, 2)").collect())
    assertThrows[Exception](
      spark.sql("SELECT window_bounds_ns(1L, t, 0) FROM VALUES (1L) v(t)")
        .collect())
  }
}
