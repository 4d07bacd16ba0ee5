package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

class TextPiiEntropySpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("x")).head().get(0)

  // ------------------------------------------------------------ entropy

  test("charEntropy matches hand-computed distributions") {
    assert(one("aabb", TF.charEntropy($"t")) == 1.0) // two chars, 50/50
    assert(one("abcd", TF.charEntropy($"t")) == 2.0) // four uniform
    assert(one("aaaa", TF.charEntropy($"t")) == 0.0) // degenerate
    assert(one("", TF.charEntropy($"t")) == 0.0) // empty guard
    val h = one("aab", TF.charEntropy($"t")).asInstanceOf[Double]
    assert(math.abs(h - (math.log(3) / math.log(2) - 2.0 / 3.0)) < 1e-12)
  }

  test("charEntropy is order-invariant (distribution, not sequence)") {
    val h1 = one("abab", TF.charEntropy($"t"))
    val h2 = one("aabb", TF.charEntropy($"t"))
    assert(h1 == h2)
  }

  test("charEntropyMb: integer milli-bits, exact on hand-computed cases") {
    assert(one("aabb", TF.charEntropyMb($"t")) == 1000L) // 1 bit
    assert(one("abcd", TF.charEntropyMb($"t")) == 2000L) // 2 bits
    assert(one("aaaa", TF.charEntropyMb($"t")) == 0L)
    assert(one("", TF.charEntropyMb($"t")) == 0L)
    // "aab": (3·L(3) − 2·L(2)) / 3000 = (3·1584963 − 2·1000000) / 3000
    //      = 2754889 / 3000 → floor = 918  (H ≈ 0.9183 bits)
    assert(one("aab", TF.charEntropyMb($"t")) == 918L)
    // order-invariant like the float form
    assert(one("abab", TF.charEntropyMb($"t")) ==
      one("aabb", TF.charEntropyMb($"t")))
  }

  // ---------------------------------------------------------------- PII

  test("email detection and redaction, hostile local parts") {
    assert(one("x first.last+tag%99@sub.domain-x.co y",
      TF.emailCount($"t")) == 1)
    assert(one("a@b.c", TF.emailCount($"t")) == 0, "single-letter TLD is not a match")
    assert(one("mail me: a.b@c.io, again a.b@c.io!",
      TF.redactPii($"t")) == "mail me: <EMAIL>, again <EMAIL>!")
  }

  test("ipv4 needs word boundaries and exactly four octets") {
    assert(one("host 10.0.0.7 up", TF.ipv4Count($"t")) == 1)
    assert(one("ver 1.2.3 only", TF.ipv4Count($"t")) == 0)
    assert(one("10.0.0.7.9 trailing-octet still finds a quad",
      TF.ipv4Count($"t")) == 1)
  }

  test("ssn (3-2-4) and phone (3-3-4) shapes stay disjoint") {
    val s = "ssn 123-45-6789 tel 555-123-4567 dotted 555.123.4567"
    assert(one(s, TF.ssnCount($"t")) == 1)
    assert(one(s, TF.phoneCount($"t")) == 2)
    assert(one(s, TF.redactPii($"t")) == "ssn <SSN> tel <PHONE> dotted <PHONE>")
  }

  test("redaction order: emails first so numeric patterns cannot mangle them") {
    assert(one("u 123-45-6789@x.com done", TF.redactPii($"t")) == "u <EMAIL> done")
  }

  test("no PII -> text unchanged") {
    val s = "plain text 42 with-dashes and dots. End 1.2"
    assert(one(s, TF.redactPii($"t")) == s)
  }
}
