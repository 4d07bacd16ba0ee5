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

  test("POSIX spellings rewrite only inside bracket expressions") {
    // a bare [:alpha:] outside a class IS a class over {:,a,l,p,h} in
    // both RE2 and Java — rewriting it would change the meaning
    assert(GoRegex.toJava("[:alpha:]") == "[:alpha:]")
    assert(matches("[:alpha:]", "p") && !matches("[:alpha:]", "z"))
    // negated word embeds correctly in NON-leading positions too
    assert(GoRegex.toJava("[a[:^word:]]") == "[a\\W]")
    assert(matches("^[a[:^word:]]$", "a"))
    assert(matches("^[a[:^word:]]$", "-"))
    assert(!matches("^[a[:^word:]]$", "b"))
    // an escaped bracket does not open a class
    assert(GoRegex.toJava("\\[[:digit:]") == "\\[[:digit:]")
    // literal ] as the first member keeps the class open
    assert(GoRegex.toJava("[][:digit:]]") == "[]\\p{Digit}]")
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
