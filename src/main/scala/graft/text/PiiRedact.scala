package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex-based PII detection and redaction, the shape used by public
  * curation pipelines (Dolma's email/phone/IP taggers, BigScience
  * ROOTS privacy filtering): find spans, count them per document, and
  * replace each span with a typed placeholder token.
  *
  * Scale design: everything here is a per-row Catalyst column
  * expression (`regexp_count` / `regexp_replace`) — no UDFs, no
  * shuffle; the whole operator fuses into the scan's whole-stage
  * codegen and streams a 100 TB corpus in one pass. That is the same
  * plan shape as [[TextOps]] quality scoring.
  *
  * The patterns are deliberately restricted to the regex subset with
  * identical semantics in Java (Spark) and RE2 (DuckDB/Go), so the
  * operator is oracle-checkable verbatim: character classes, bounded
  * repetition, and `\b` word boundaries only — no backreferences, no
  * lookaround.
  */
object PiiRedact {

  /** RFC-5322-lite email matcher (the pragmatic form public pipelines
    * use; full RFC grammar needs lookaround that RE2 lacks). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone number. */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 literal. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction placeholders (contain no digits or '@'/'.' runs, so a
    * later pattern can never match inside an earlier replacement —
    * the email→phone→ip chain is order-independent). */
  val EmailTag = "[EMAIL]"
  val PhoneTag = "[PHONE]"
  val IpTag = "[IP]"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re))

  /** Text with every PII span replaced by its typed tag. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        PhoneRe,
        PhoneTag),
      Ipv4Re,
      IpTag)

  /** Adds `n_email` / `n_phone` / `n_ip` (long) and `redacted` columns
    * for `textCol`.
    *
    * Counts are CHAINED, mirroring the replacement order: `n_email`
    * is matched on the original text, `n_phone` on the email-redacted
    * text, `n_ip` on the email+phone-redacted text. Each count
    * therefore equals exactly the number of tags that replacement
    * step inserts, so the invariant `n_x == count of [X] tags in
    * redacted` holds even when a span matches two patterns (e.g.
    * `555-123-4567@example.com` is email-redacted first and is then
    * invisible to the phone matcher — counted once, tagged once). */
  def annotate(df: DataFrame, textCol: Column): DataFrame = {
    val afterEmail = regexp_replace(textCol, EmailRe, EmailTag)
    val afterPhone = regexp_replace(afterEmail, PhoneRe, PhoneTag)
    df
      .withColumn("n_email", regexp_count(textCol, lit(EmailRe)).cast("long"))
      .withColumn("n_phone", regexp_count(afterEmail, lit(PhoneRe)).cast("long"))
      .withColumn("n_ip", regexp_count(afterPhone, lit(Ipv4Re)).cast("long"))
      .withColumn("redacted", regexp_replace(afterPhone, Ipv4Re, IpTag))
  }
}
