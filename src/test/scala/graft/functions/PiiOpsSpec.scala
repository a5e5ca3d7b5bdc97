package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII detection/redaction semantics on hit-bearing fixtures (the
  * corpus text is digit-free, so the oracle's synthetic-suffix path
  * covers engine parity and THIS spec covers real-world shapes). */
class PiiOpsSpec extends SparkSpec {
  import spark.implicits._

  private def screen(texts: String*): Seq[(Int, Int, Int, Int, String)] =
    texts.toDF("t")
      .select(
        PiiOps.piiCount($"t", PiiOps.EmailRe).as("e"),
        PiiOps.piiCount($"t", PiiOps.SsnRe).as("s"),
        PiiOps.piiCount($"t", PiiOps.PhoneRe).as("p"),
        PiiOps.piiCount($"t", PiiOps.Ipv4Re).as("i"),
        PiiOps.redact($"t").as("r"))
      .as[(Int, Int, Int, Int, String)]
      .collect().toSeq

  test("detects and redacts each PII kind") {
    val Seq((e, s, p, i, r)) = screen(
      "mail a.b+c@sub.example.org ssn 987-65-4320 call 555-867-5309 " +
        "or 555.867.5309 host 192.168.1.254 done")
    assert((e, s, p, i) === (1, 1, 2, 1))
    assert(r === "mail [PII] ssn [PII] call [PII] or [PII] host [PII] done")
  }

  test("SSN and phone patterns do not cross-match; counts are pre-redaction") {
    val Seq((e, s, p, i, _)) = screen("123-45-6789 and 123-456-7890")
    assert((e, s, p, i) === (0, 1, 1, 0))
  }

  test("emails with digits are redacted before digit patterns run") {
    val Seq((e, _, p, _, r)) = screen("x 555.867.5309@mail.com y")
    // pre-redaction counts see both the email and the digit run inside
    // it; redaction applies email FIRST, so the output is one marker,
    // not a phone-mangled email
    assert(e === 1 && p === 1)
    assert(r === "x [PII] y")
  }

  test("clean text is untouched") {
    val Seq((e, s, p, i, r)) = screen("the quick brown fox")
    assert((e, s, p, i) === (0, 0, 0, 0))
    assert(r === "the quick brown fox")
  }

  test("multiple hits of one kind all count and all redact") {
    val Seq((e, _, _, _, r)) = screen("a@b.co c@d.org e@f.io")
    assert(e === 3)
    assert(r === "[PII] [PII] [PII]")
  }
}
