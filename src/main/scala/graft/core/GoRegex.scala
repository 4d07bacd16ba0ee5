package graft.core

import java.util.regex.Matcher

/** Go/RE2-dialect → Java-regex translation for the `=~` / `!~` storage
  * operators (the reference compiles patterns with the Rust `regex`
  * crate — RE2 family — query/src/func/regex.rs:39; clients send
  * Go-dialect patterns). Java regex is a near-superset; the constructs
  * valid in RE2 but rejected by `java.util.regex` are translated:
  *
  *  - named groups `(?P<name>...)` → `(?<name>...)`
  *  - POSIX classes `[:alpha:]` / negated `[:^alpha:]` (valid only
  *    inside a bracket class in RE2) → `\p{Alpha}` / `\P{Alpha}`
  *
  * Everything else passes through untouched, so Java-dialect patterns
  * (the superset: lookarounds, backrefs) keep working — translation only
  * repairs spellings Java would reject outright. Match semantics are
  * already aligned: RE2 `is_match` and Spark `rlike` are both
  * unanchored substring searches.
  */
object GoRegex {

  private val posix = Map(
    "alnum" -> "Alnum", "alpha" -> "Alpha", "ascii" -> "ASCII",
    "blank" -> "Blank", "cntrl" -> "Cntrl", "digit" -> "Digit",
    "graph" -> "Graph", "lower" -> "Lower", "print" -> "Print",
    "punct" -> "Punct", "space" -> "Space", "upper" -> "Upper",
    "xdigit" -> "XDigit")

  private val posixRe =
    raw"\[:(\^?)(${(posix.keys.toSeq :+ "word").mkString("|")}):\]".r

  def toJava(pattern: String): String = {
    val classes = posixRe.replaceAllIn(pattern, m => {
      val neg = m.group(1) == "^"
      val rep = m.group(2) match {
        // [[:word:]] is [0-9A-Za-z_]; the negated spelling assumes the
        // standalone [[:^word:]] form (the class-leading ^ position)
        case "word" => if (neg) "^\\p{Alnum}_" else "\\p{Alnum}_"
        case name => (if (neg) "\\P{" else "\\p{") + posix(name) + "}"
      }
      Matcher.quoteReplacement(rep)
    })
    classes.replace("(?P<", "(?<")
  }
}
