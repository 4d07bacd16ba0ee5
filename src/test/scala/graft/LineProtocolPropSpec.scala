package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LineProtocol
import graft.sources.LineProtocol._

/** Property tests for the line-protocol parser/formatter pair (reference
  * parser influxdb_line_protocol/src/lib.rs:474; escaping rules
  * lib.rs:529-727). The generators are deliberately hostile: identifiers
  * stuffed with the delimiter set `, = `, quotes, `#`, and non-ASCII;
  * string field values additionally carry backslashes and double quotes
  * (the two characters with defined string escapes).
  *
  * Domain note, inherent to the format (same wart as upstream): `\\` is
  * NOT an escape sequence in identifiers — the parser keeps unknown
  * escapes intact — so an identifier backslash immediately before a
  * delimiter (or at the end) merges with the delimiter's own escape on
  * write and cannot round-trip. Identifier generators therefore exclude
  * backslash; the explicit cases below pin the exact behavior backslashes
  * do get. Newlines are excluded everywhere: LP is line-oriented by
  * definition.
  */
class LineProtocolPropSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ----------------------------------------------------------- generators

  /** Hostile identifier characters: heavy on the delimiters that need
    * escaping, plus quote/hash/unicode; no backslash, no newline. */
  private val identChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.const(','),
    1 -> Gen.const('='),
    1 -> Gen.const(' '),
    1 -> Gen.oneOf('"', '#', '.', '-', '_'),
    1 -> Gen.oneOf('é', '→', '日', 'ß'))

  private val ident: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, identChar)).map(_.mkString)

  /** String field values: full escaping is defined, so include backslash
    * and quote liberally (lib.rs string escapes `\"` and `\\`). */
  private val strChar: Gen[Char] = Gen.frequency(
    5 -> Gen.alphaNumChar,
    1 -> Gen.const('\\'),
    1 -> Gen.const('"'),
    1 -> Gen.oneOf(',', '=', ' ', '\''),
    1 -> Gen.oneOf('é', '→', '日'))

  private val fieldValue: Gen[FieldValue] = Gen.oneOf(
    // finite doubles: Double.toString/parseDouble round-trips every finite
    // value exactly (Java guarantees shortest-repr round-trip)
    Gen.oneOf[Double](
      Gen.choose(-1e6, 1e6),
      Gen.oneOf(0.0, -0.0, 1.5e-300, -2.7e300, Double.MinPositiveValue,
        Double.MaxValue)).map(F64.apply),
    Gen.choose(Long.MinValue, Long.MaxValue).map(I64.apply),
    Gen.choose(BigInt(0), BigInt("18446744073709551615")).map(U64.apply),
    Gen.oneOf(true, false).map(Bool.apply),
    Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, strChar))
      .map(cs => Str(cs.mkString)))

  /** Measurements additionally avoid a leading `#`: `parseLines` would
    * treat the whole formatted line as a comment (parseLine itself is
    * indifferent). */
  private val measurement: Gen[String] =
    ident.map(m => if (m.charAt(0) == '#') "m" + m else m)

  private val parsedLine: Gen[ParsedLine] = for {
    m <- measurement
    nTags <- Gen.choose(0, 4)
    tags <- Gen.listOfN(nTags, Gen.zip(ident, ident))
    nFields <- Gen.choose(1, 5)
    fields <- Gen.listOfN(nFields, Gen.zip(ident, fieldValue))
    ts <- Gen.option(Gen.choose(Long.MinValue + 1, Long.MaxValue))
  } yield ParsedLine(m, tags, fields, ts)

  // ----------------------------------------------------------- properties

  test("parse(format(line)) == line over hostile identifiers and all field types") {
    check("roundtrip", Prop.forAll(parsedLine) { pl =>
      parseLine(format(pl)) == pl
    }, min = 500)
  }

  test("parseLines(format-ed batch with comments/blanks interleaved) == batch") {
    val batch = Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, parsedLine))
    check("batch", Prop.forAll(batch) { pls =>
      val text = pls.flatMap(pl =>
        Seq("# noise", "", "   ", format(pl))) :+ "# trailing"
      parseLines(text).toSeq == pls
    })
  }

  test("malformed inputs always throw, never mis-parse") {
    // a measurement with no field section is an error for ANY identifier
    check("no-fields", Prop.forAll(measurement) { m =>
      Prop.throws(classOf[LpException]) {
        parseLine(format(ParsedLine(m, Nil, Seq("f" -> I64(1)), None))
          .takeWhile(_ != ' '))
      }
    }, min = 100)
    // non-numeric trailing garbage after a valid line is an error
    check("trailing-garbage", Prop.forAll(parsedLine) { pl =>
      Prop.throws(classOf[Exception]) {
        parseLine(format(pl.copy(timestampNs = Some(1L))) + " 2 x")
      }
    }, min = 100)
  }

  test("unknown escapes in identifiers are kept intact (lib.rs behavior)") {
    // backslash before a non-delimiter survives parse unchanged...
    assert(parseLine("""m,k=a\qb f=1i""").tags == Seq("k" -> """a\qb"""))
    // ...and such a value round-trips (format writes it back verbatim)
    val pl = ParsedLine("m", Seq("k" -> """a\qb"""), Seq("f" -> I64(1)), None)
    assert(parseLine(format(pl)) == pl)
    // the documented non-roundtrippable wart: identifier backslash right
    // before a delimiter merges with the delimiter's escape — the written
    // `a\\,b` re-parses as value `a\\` then chokes on the orphaned `b`.
    // Pinned so nobody "fixes" the encoder into a dialect upstream parsers
    // would read differently.
    val wart = ParsedLine("m", Seq("k" -> "a\\,b"), Seq("f" -> I64(1)), None)
    assertThrows[LpException](parseLine(format(wart)))
  }

  test("numeric extremes round-trip") {
    for (v <- Seq(Long.MinValue, Long.MaxValue, 0L, -1L)) {
      val pl = ParsedLine("m", Nil, Seq("f" -> I64(v)), Some(v))
      assert(parseLine(format(pl)) == pl)
    }
    val u = ParsedLine("m", Nil,
      Seq("f" -> U64(BigInt("18446744073709551615"))), None)
    assert(parseLine(format(u)) == u)
    // u64 overflow rejected
    assertThrows[LpException](parseLine("m f=18446744073709551616u"))
  }
}
