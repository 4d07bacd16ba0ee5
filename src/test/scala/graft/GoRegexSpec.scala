package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.GoRegex

class GoRegexSpec extends AnyFunSuite {

  private def matches(goPattern: String, s: String): Boolean =
    java.util.regex.Pattern.compile(GoRegex.toJava(goPattern)).matcher(s).find()

  test("Go named groups translate and compile") {
    assert(GoRegex.toJava("(?P<host>[a-z]+)-(?P<n>\\d+)") ==
      "(?<host>[a-z]+)-(?<n>\\d+)")
    assert(matches("(?P<host>[a-z]+)-(?P<n>\\d+)", "web-12"))
  }

  test("POSIX classes translate to Java \\p classes") {
    assert(GoRegex.toJava("[[:digit:]]+") == "[\\p{Digit}]+")
    assert(matches("[[:digit:]]+", "abc123"))
    assert(!matches("^[[:alpha:]]+$", "abc123"))
    assert(matches("^[[:alpha:]]+$", "abc"))
    // negated class + mixed members
    assert(matches("[[:^alpha:]]", "a1"))
    assert(!matches("^[[:^alpha:]]+$", "abc"))
    assert(matches("^[[:alpha:]0-9_]+$", "ab_3"))
    // word = alnum + underscore
    assert(matches("^[[:word:]]+$", "ab_3"))
    assert(!matches("^[[:word:]]+$", "ab-3"))
  }

  test("Java-dialect patterns pass through untouched") {
    for (p <- Seq("^cpu[0-9]+$", "a(?i)BC", "x(?=y)", "\\p{Lu}+", "(a|b)\\1?"))
      assert(GoRegex.toJava(p) == p)
  }

  test("predicate regex operators accept Go-dialect patterns") {
    // compiles inside the rlike expression (would throw at analysis
    // otherwise) — full-match behavior is covered by InfluxRpcSpec
    val p = graft.core.RpcPredicate()
      .withRegexMatch("host", "(?P<h>web)-[[:digit:]]+")
    assert(p.exprs.size == 1)
  }
}
