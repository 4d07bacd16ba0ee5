package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LineProtocol
import graft.sources.LineProtocol._

/** The reference line-protocol parser test matrix, ported at
  * case-for-case parity from influxdb_line_protocol/src/lib.rs `mod test`
  * (every portable `#[test]`; the nom-internal EscapedStr/split_lines/
  * trim_leading unit tests have no analog here, and
  * `measurement_disallows_literal_newline` is subsumed by the line-based
  * input model — a raw newline terminates the identifier, making the
  * line malformed, asserted below). Inputs and expected values are the
  * reference's own vectors; test names mirror lib.rs.
  */
class LineProtocolMatrixSpec extends AnyFunSuite {

  private def parse(s: String): Seq[ParsedLine] =
    parseLines(s.split("\n", -1).toSeq).toSeq

  private def f64(l: ParsedLine, i: Int): Double =
    l.fields(i)._2.asInstanceOf[F64].v
  private def i64(l: ParsedLine, i: Int): Long =
    l.fields(i)._2.asInstanceOf[I64].v
  private def u64(l: ParsedLine, i: Int): BigInt =
    l.fields(i)._2.asInstanceOf[U64].v
  private def str(l: ParsedLine, i: Int): String =
    l.fields(i)._2.asInstanceOf[Str].v
  private def bool(l: ParsedLine, i: Int): Boolean =
    l.fields(i)._2.asInstanceOf[Bool].v

  // ------------------------------------------------------ lib.rs:1206-1292

  test("parse_empty") { assert(parse("").isEmpty) }

  test("parse_no_fields") { assertThrows[LpException](parse("foo 1234")) }

  test("parse_single_field_integer") {
    val v = parse("foo asdf=23i 1234")
    assert(v.head.measurement == "foo" && v.head.timestampNs.contains(1234L))
    assert(v.head.fields.head._1 == "asdf" && i64(v.head, 0) == 23L)
  }

  test("parse_single_field_unteger") {
    val v = parse("foo asdf=23u 1234")
    assert(u64(v.head, 0) == BigInt(23))
  }

  test("parse_single_field_float_no_decimal") {
    val v = parse("foo asdf=44 546")
    assert(v.head.timestampNs.contains(546L) && f64(v.head, 0) == 44.0)
  }

  test("parse_single_field_float_with_decimal") {
    val v = parse("foo asdf=3.74 123")
    assert(f64(v.head, 0) == 3.74)
  }

  test("parse_single_field_string") {
    val v = parse("""foo asdf="the string value" 1234""")
    assert(str(v.head, 0) == "the string value")
  }

  test("parse_single_field_bool") {
    assert(bool(parse("foo asdf=true 1234").head, 0))
  }

  test("parse_string_values") {
    val cases = Seq(
      ("""foo asdf="""" + "\"", ""),
      ("""foo asdf="str val"""", "str val"),
      ("""foo asdf="The \"string\" val"""", """The "string" val"""),
      ("""foo asdf="The \"string w/ single double quote"""",
        """The "string w/ single double quote"""),
      ("""foo asdf="too hot/cold"""", "too hot/cold"),
      ("""foo asdf="too hot\cold"""", """too hot\cold"""),
      ("""foo asdf="too hot\\cold"""", """too hot\cold"""),
      ("""foo asdf="too hot\\\cold"""", """too hot\\cold"""),
      ("""foo asdf="too hot\\\\cold"""", """too hot\\cold"""),
      ("""foo asdf="too hot\\\\\cold"""", """too hot\\\cold"""))
    for ((input, want) <- cases) {
      val v = parse(input)
      assert(v.head.tags.isEmpty && v.head.fields.size == 1)
      assert(v.head.fields.head._1 == "asdf")
      assert(str(v.head, 0) == want, input)
    }
  }

  test("parse_bool_values") {
    val cases = Seq("t" -> true, "T" -> true, "true" -> true, "True" -> true,
      "TRUE" -> true, "f" -> false, "F" -> false, "false" -> false,
      "False" -> false, "FALSE" -> false)
    for ((in, want) <- cases)
      assert(bool(parse(s"foo asdf=$in").head, 0) == want, in)
  }

  // ------------------------------------------------------ lib.rs:1352-1430

  test("parse_two_fields_integer") {
    val v = parse("foo asdf=23i,bar=5i 1234")
    assert(i64(v.head, 0) == 23L && v.head.fields(1)._1 == "bar" && i64(v.head, 1) == 5L)
  }

  test("parse_two_fields_unteger") {
    val v = parse("foo asdf=23u,bar=5u 1234")
    assert(u64(v.head, 0) == BigInt(23) && u64(v.head, 1) == BigInt(5))
  }

  test("parse_two_fields_float") {
    val v = parse("foo asdf=23.1,bar=5 1234")
    assert(f64(v.head, 0) == 23.1 && f64(v.head, 1) == 5.0)
  }

  test("parse_mixed_field_types") {
    val v = parse("""foo asdf=23.1,bar=-5i,qux=9u,baz="the string",frab=false 1234""")
    assert(f64(v.head, 0) == 23.1)
    assert(i64(v.head, 1) == -5L)
    assert(u64(v.head, 2) == BigInt(9))
    assert(str(v.head, 3) == "the string")
    assert(!bool(v.head, 4))
  }

  test("parse_negative_integer") {
    assert(i64(parse("m0 field=-1i 99").head, 0) == -1L)
  }

  test("parse_negative_uinteger") {
    assertThrows[LpException](parse("m0 field=-1u 99"))
  }

  // ------------------------------------------------------ lib.rs:1451-1606

  test("parse_scientific_float") {
    // positive vectors: exponent with explicit sign (and e-0 forms)
    for (in <- Seq("m0 field=-1.234456e+06 1615869152385000000",
        "m0 field=-1.234456E+3 1615869152385000000",
        "m0 field=1.234456e+02 1615869152385000000",
        "m0 field=1.234456E+16 1615869152385000000",
        "m0 field=1.234456E-16", "m0 field=1.234456e-03",
        "m0 field=1.234456e-0"))
      assert(parse(in).size == 1, in)
    // negative vectors: signless exponent or no digits after e/E
    for (in <- Seq("m0 field=-1.234456e06 1615869152385000000",
        "m0 field=1.234456e06 1615869152385000000",
        "m0 field=-1.234456E06 1615869152385000000",
        "m0 field=1.234456E06 1615869152385000000",
        "m0 field=-1.234456e 1615869152385000000",
        "m0 field=-1.234456e+ 1615869152385000000",
        "m0 field=-1.234456E 1615869152385000000",
        "m0 field=-1.234456E+ 1615869152385000000",
        "m0 field=-1.234456E-"))
      assertThrows[LpException](parse(in))
  }

  test("parse_negative_float") {
    assert(f64(parse("m0 field2=-1 99").head, 0) == -1.0)
  }

  test("parse_out_of_range_integer") {
    assertThrows[LpException](
      parse("m0 field=99999999999999999999999999999999i 99"))
  }

  test("parse_out_of_range_uinteger") {
    assertThrows[LpException](
      parse("m0 field=99999999999999999999999999999999u 99"))
  }

  test("parse_out_of_range_float") {
    val digits = "9" * 200
    assertThrows[LpException](parse(s"m0 field=$digits.$digits 99"))
  }

  // ------------------------------------------------------ lib.rs:1608-1758

  test("parse_tag_set_included_in_series") {
    val v = parse("foo,tag1=1,tag2=2 value=1 123")
    assert(v.head.measurement == "foo")
    assert(v.head.tags == Seq("tag1" -> "1", "tag2" -> "2"))
    assert(v.head.fields.head._1 == "value")
  }

  test("parse_tag_set_unsorted") {
    // series key generation sorts tags (generate_base); our canonical
    // series identity is the sorted tag struct (IoxSchema tag ordering)
    val v = parse("foo,tag2=2,tag1=1 f=1")
    assert(v.head.tags.sortBy(_._1) == Seq("tag1" -> "1", "tag2" -> "2"))
  }

  test("parse_tag_set_duplicate_tags") {
    // duplicate tags parse (the reference errors later, at series-key
    // generation); our ingest collapses to the LAST duplicate at row
    // construction — pin the parse-side acceptance here
    val v = parse("foo,tag=1,tag=2 f=1")
    assert(v.head.tags == Seq("tag" -> "1", "tag" -> "2"))
  }

  test("parse_multiple_lines_become_multiple_points") {
    val v = parse("foo value1=1i 123\nfoo value2=2i 123")
    assert(v.size == 2)
    assert(v(0).fields.head._1 == "value1" && i64(v(0), 0) == 1L)
    assert(v(1).fields.head._1 == "value2" && i64(v(1), 0) == 2L)
  }

  test("parse_multiple_measurements_become_multiple_points") {
    val v = parse("foo value1=1i 123\nbar value2=2i 123")
    assert(v(0).measurement == "foo" && v(1).measurement == "bar")
  }

  test("parse_trailing_whitespace_is_fine") {
    val v = parse("foo,tag=val value1=1i 123\n\n")
    assert(v.size == 1 && v.head.timestampNs.contains(123L))
  }

  test("parse_negative_timestamp") {
    assert(parse("foo value1=1i -123").head.timestampNs.contains(-123L))
  }

  test("parse_out_of_range_timestamp") {
    assertThrows[LpException](
      parse("m0 field=1i 99999999999999999999999999999999"))
  }

  test("parse_blank_lines_are_ignored") { assert(parse("\n\n\n").isEmpty) }

  test("parse_commented_lines_are_ignored") { assert(parse("# comment").isEmpty) }

  test("parse_multiple_whitespace_between_elements_is_allowed") {
    val v = parse("  measurement  a=1i  123  ")
    assert(v.head.measurement == "measurement" && v.head.timestampNs.contains(123L))
  }

  // --------------------------------- identifier escaping, lib.rs:1760-1978
  // (measurement / tag key / tag value / field key × comma, space/equal,
  //  backslash, unknown escape, newline-as-unknown-escape, literal
  //  newline, trailing backslash)

  private def measurementOf(rest: String): String =
    parse(s"$rest f=1i").head.measurement
  private def tagKeyOf(k: String): String =
    parse(s"m,$k=v f=1i").head.tags.head._1
  private def tagValueOf(v: String): String =
    parse(s"m,k=$v f=1i").head.tags.head._2
  private def fieldKeyOf(k: String): String =
    parse(s"m $k=1i").head.fields.head._1

  test("measurement_allows_escaping_comma") {
    assert(measurementOf("""wea\,ther""") == "wea,ther")
  }
  test("measurement_allows_escaping_space") {
    assert(measurementOf("""wea\ ther""") == "wea ther")
  }
  test("measurement_allows_escaping_backslash") {
    assert(measurementOf("""\\wea\\ther""") == """\wea\ther""")
  }
  test("measurement_allows_backslash_with_unknown_escape") {
    assert(measurementOf("""\wea\ther""") == """\wea\ther""")
  }
  test("measurement_allows_literal_newline_as_unknown_escape") {
    assert(parseLine("weat\\\nher f=1i").measurement == "weat\\\nher")
  }
  test("measurement_disallows_literal_newline") {
    // a raw newline terminates the identifier -> the line is malformed
    assertThrows[LpException](parseLine("weat\nher f=1i"))
  }
  test("measurement_disallows_ending_in_backslash") {
    assertThrows[LpException](parseLine("""weather\"""))
  }

  test("tag_key_allows_escaping_comma") {
    assert(tagKeyOf("""wea\,ther""") == "wea,ther")
  }
  test("tag_key_allows_escaping_equal") {
    assert(tagKeyOf("""wea\=ther""") == "wea=ther")
  }
  test("tag_key_allows_escaping_space") {
    assert(tagKeyOf("""wea\ ther""") == "wea ther")
  }
  test("tag_key_allows_escaping_backslash") {
    assert(tagKeyOf("""\\wea\\ther""") == """\wea\ther""")
  }
  test("tag_key_allows_backslash_with_unknown_escape") {
    assert(tagKeyOf("""\wea\ther""") == """\wea\ther""")
  }
  test("tag_key_allows_literal_newline_as_unknown_escape") {
    assert(parseLine("m,weat\\\nher=v f=1i").tags.head._1 == "weat\\\nher")
  }
  test("tag_key_disallows_literal_newline") {
    assertThrows[LpException](parseLine("m,weat\nher=v f=1i"))
  }
  test("tag_key_disallows_ending_in_backslash") {
    assertThrows[LpException](parseLine("m,weather\\"))
  }

  test("tag_value_allows_escaping_comma") {
    assert(tagValueOf("""wea\,ther""") == "wea,ther")
  }
  test("tag_value_allows_escaping_equal") {
    assert(tagValueOf("""wea\=ther""") == "wea=ther")
  }
  test("tag_value_allows_escaping_space") {
    assert(tagValueOf("""wea\ ther""") == "wea ther")
  }
  test("tag_value_allows_escaping_backslash") {
    assert(tagValueOf("""\\wea\\ther""") == """\wea\ther""")
  }
  test("tag_value_allows_backslash_with_unknown_escape") {
    assert(tagValueOf("""\wea\ther""") == """\wea\ther""")
  }
  test("tag_value_allows_literal_newline_as_unknown_escape") {
    assert(parseLine("m,k=weat\\\nher f=1i").tags.head._2 == "weat\\\nher")
  }
  test("tag_value_disallows_literal_newline") {
    assertThrows[LpException](parseLine("m,k=weat\nher f=1i"))
  }
  test("tag_value_disallows_ending_in_backslash") {
    assertThrows[LpException](parseLine("m,k=weather\\"))
  }

  test("field_key_allows_escaping_comma") {
    assert(fieldKeyOf("""wea\,ther""") == "wea,ther")
  }
  test("field_key_allows_escaping_equal") {
    assert(fieldKeyOf("""wea\=ther""") == "wea=ther")
  }
  test("field_key_allows_escaping_space") {
    assert(fieldKeyOf("""wea\ ther""") == "wea ther")
  }
  test("field_key_allows_escaping_backslash") {
    assert(fieldKeyOf("""\\wea\\ther""") == """\wea\ther""")
  }
  test("field_key_allows_backslash_with_unknown_escape") {
    assert(fieldKeyOf("""\wea\ther""") == """\wea\ther""")
  }
  test("field_key_allows_literal_newline_as_unknown_escape") {
    assert(parseLine("m weat\\\nher=1i").fields.head._1 == "weat\\\nher")
  }
  test("field_key_disallows_literal_newline") {
    assertThrows[LpException](parseLine("m weat\nher=1i"))
  }
  test("field_key_disallows_ending_in_backslash") {
    assertThrows[LpException](parseLine("m weather\\"))
  }

  // ------------------------------------------------------ lib.rs:1979-2035

  test("parse_no_time") {
    val v = parse("foo,tag0=value1 asdf=23.1,bar=5i")
    assert(v.head.timestampNs.isEmpty)
    assert(v.head.tags == Seq("tag0" -> "value1"))
    assert(f64(v.head, 0) == 23.1 && i64(v.head, 1) == 5L)
  }

  test("parse_advance_after_error") {
    val results = LineProtocol.parseLinesLenient(Seq(
      "foo,tag0=value1 asdf=23.1.22,jkl=4",
      "foo,tag0=value2 asdf=22.1,jkl=5")).toSeq
    assert(results.size == 2)
    assert(results(0).isLeft) // 23.1.22 is not a number
    val ok = results(1).toOption.get
    assert(ok.tags == Seq("tag0" -> "value2"))
    assert(f64(ok, 0) == 22.1 && f64(ok, 1) == 5.0)
  }

  // --------------------------------------- Display twins, lib.rs:2037-2180

  test("field_value_display") {
    def disp(fv: FieldValue): String =
      format(ParsedLine("m", Nil, Seq("f" -> fv), None)).stripPrefix("m f=")
    assert(disp(I64(-42)) == "-42i")
    assert(disp(U64(BigInt(42))) == "42u")
    assert(disp(F64(42.11)) == "42.11")
    assert(disp(Bool(true)) == "true")
    assert(disp(Bool(false)) == "false")
  }

  test("series_display_no_tags") {
    assert(format(ParsedLine("m", Nil, Seq("f" -> I64(1)), None))
      .startsWith("m "))
  }

  test("series_display_one_tag") {
    assert(format(ParsedLine("m", Seq("tag1" -> "val1"), Seq("f" -> I64(1)), None))
      .startsWith("m,tag1=val1 "))
  }

  test("series_display_two_tags") {
    assert(format(ParsedLine("m", Seq("tag1" -> "val1", "tag2" -> "val2"),
      Seq("f" -> I64(1)), None)).startsWith("m,tag1=val1,tag2=val2 "))
  }

  test("parsed_line_display_one_field_no_timestamp") {
    assert(format(ParsedLine("m", Seq("tag1" -> "val1"),
      Seq("field1" -> F64(42.1)), None)) == "m,tag1=val1 field1=42.1")
  }

  test("parsed_line_display_one_field_timestamp") {
    assert(format(ParsedLine("m", Seq("tag1" -> "val1"),
      Seq("field1" -> F64(42.1)), Some(33L))) == "m,tag1=val1 field1=42.1 33")
  }

  test("parsed_line_display_two_fields_timestamp") {
    assert(format(ParsedLine("m", Seq("tag1" -> "val1"),
      Seq("field1" -> F64(42.1), "field2" -> Bool(true)), Some(33L))) ==
      "m,tag1=val1 field1=42.1,field2=true 33")
  }

  test("parsed_line_display_escaped") {
    // identifier escaping matches the reference Display exactly; the ONE
    // deliberate deviation is string field values: the reference omits
    // the surrounding quotes (its own docs note Display may emit invalid
    // LP, lib.rs:199-206), while this writer quotes them so the output
    // always re-parses
    assert(format(ParsedLine("m,and m", Seq("tag ,1" -> "val ,1"),
      Seq("field ,1" -> Str("Foo\"Bar")), Some(33L))) ==
      """m\,and\ m,tag\ \,1=val\ \,1 field\ \,1="Foo\"Bar" 33""")
  }

  // ------------------------------------------- accessors, lib.rs:2182-2206

  test("field_value_returned") {
    val l = parse("foo asdf=true 1234").head
    assert(l.fields.toMap.get("asdf").contains(Bool(true)))
  }

  test("field_value_missing") {
    val l = parse("foo asdf=true 1234").head
    assert(l.fields.toMap.get("jkl").isEmpty)
  }

  test("tag_value_returned") {
    val l = parse("foo,test=stuff asdf=true 1234").head
    assert(l.tags.toMap.get("test").contains("stuff"))
  }

  test("tag_value_missing") {
    val l = parse("foo,test=stuff asdf=true 1234").head
    assert(l.tags.toMap.get("nonexistent").isEmpty)
  }

  test("leading plus is rejected everywhere, like the upstream grammar") {
    // upstream numerals are opt('-') then digits (lib.rs:656-711): Java's
    // parsers would accept '+', so the shapes are pinned explicitly
    assertThrows[LpException](parseLine("m f=+5i"))
    assertThrows[LpException](parseLine("m f=+5u"))
    assertThrows[LpException](parseLine("m f=+5.0"))
    assertThrows[LpException](parseLine("m f=1i +123"))
    // and u64 has no sign AT ALL
    assertThrows[LpException](parseLine("m f=-1u"))
  }
}
