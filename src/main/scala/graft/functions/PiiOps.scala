package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII screening/redaction primitives for corpus curation (the
  * scrubbing gate every training-data pipeline runs before release).
  * Pure built-in regexp expressions — codegen'd, zero UDFs — over
  * patterns chosen to evaluate identically under Java regex (Spark)
  * and RE2 (DuckDB oracles): character classes, bounded repetition
  * and `\b` only; no lookaround, no backreferences.
  *
  * Detection counts run on the ORIGINAL text; redaction applies the
  * patterns in a fixed order (emails first — they embed digit runs —
  * then SSNs, phones, IPv4s), each match replaced by a fixed marker.
  * Both sides are deterministic column expressions, so an oracle can
  * replay them byte-for-byte.
  */
object PiiOps {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe: String   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe: String = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order matters (emails contain digits); counts are
    * order-independent because they run on the unredacted text. */
  val Patterns: Seq[(String, String)] = Seq(
    "emails" -> EmailRe, "ssns" -> SsnRe,
    "phones" -> PhoneRe, "ips" -> Ipv4Re)

  val Marker = "[PII]"

  /** Non-overlapping match count of one pattern. */
  def piiCount(c: Column, re: String): Column = regexp_count(c, lit(re))

  /** All four patterns replaced by [[Marker]], in [[Patterns]] order. */
  def redact(c: Column): Column =
    Patterns.foldLeft(c) { case (acc, (_, re)) =>
      regexp_replace(acc, re, Marker)
    }

  /** DuckDB rendering of [[redact]] over a SQL expression. */
  def redactSql(e: String): String =
    Patterns.foldLeft(e) { case (acc, (_, re)) =>
      s"regexp_replace($acc, '$re', '$Marker', 'g')"
    }

  /** DuckDB rendering of [[piiCount]]. */
  def piiCountSql(e: String, re: String): String =
    s"len(regexp_extract_all($e, '$re'))"
}
