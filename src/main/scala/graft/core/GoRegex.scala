package graft.core

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

  /** Rewrites `[:name:]` only when it starts at `idx` AND we are lexically
    * inside a bracket expression — outside one, RE2 parses `[:alpha:]` as
    * the literal class over `{:,a,l,p,h}` and Java agrees, so rewriting
    * there would change the meaning. Returns (replacement, end index). */
  private def posixAt(pattern: String, idx: Int): Option[(String, Int)] =
    posixRe.findPrefixMatchOf(pattern.substring(idx)).map { m =>
      val neg = m.group(1) == "^"
      val rep = m.group(2) match {
        // [[:word:]] is [0-9A-Za-z_] — exactly Java's \w, and \w/\W embed
        // correctly at ANY position inside a bracket class
        case "word" => if (neg) "\\W" else "\\w"
        case name => (if (neg) "\\P{" else "\\p{") + posix(name) + "}"
      }
      (rep, idx + m.end)
    }

  def toJava(pattern: String): String = {
    val sb = new StringBuilder(pattern.length)
    var i = 0
    var depth = 0 // bracket-class nesting (RE2 never nests; Java may)
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length) {
        sb.append(c).append(pattern.charAt(i + 1)); i += 2
      } else if (c == '[' && depth > 0 && posixAt(pattern, i).isDefined) {
        val (rep, end) = posixAt(pattern, i).get
        sb.append(rep); i = end
      } else if (c == '[') {
        depth += 1; sb.append(c); i += 1
        // a ] immediately after [ or [^ is a literal member, not a close
        if (i < pattern.length && pattern.charAt(i) == '^') {
          sb.append('^'); i += 1
        }
        if (i < pattern.length && pattern.charAt(i) == ']') {
          sb.append(']'); i += 1
        }
      } else if (c == ']' && depth > 0) {
        depth -= 1; sb.append(c); i += 1
      } else {
        sb.append(c); i += 1
      }
    }
    sb.toString.replace("(?P<", "(?<")
  }
}
