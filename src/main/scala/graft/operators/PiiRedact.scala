package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction — the compliance pass every training-data
  * pipeline runs before text leaves curation. Map-only: per-row regex
  * scans, no shuffle, scales linearly with the corpus.
  *
  * The patterns are deliberately written in the common subset of Java
  * regex (Spark) and RE2 (DuckDB oracle): character classes, bounded
  * repetition, and ASCII `\b` word boundaries only — no backreferences
  * or lookaround (RE2 has neither). Keeping batch, streaming, and
  * oracle on these shared [[Column]] helpers is what makes redaction
  * verdicts engine-exact.
  */
object PiiRedact {

  /** Email addresses (pragmatic form, not full RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone numbers like `+1-555-0100`. */
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4 literals. */
  val IpRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redacted text: emails first (their domains contain dots that the
    * IPv4 pattern must never see), then IPs, then phones. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        IpRe, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Match counts with the SAME order-of-scan semantics as [[redact]]:
    * each pattern counts on the text as the redaction pass would see
    * it — IPs count after the email replacement, phones after email
    * AND IP replacement — so `n_<kind>` always equals the number of
    * `<KIND>` markers in the redacted output. (Counting phones on raw
    * text would disagree: `+1-555-0100@ex.org` is a legal email local
    * part that the redactor consumes as `<EMAIL>`, never `<PHONE>`.) */
  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")
  def countPhones(text: Column): Column =
    size(regexp_extract_all(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), IpRe, "<IP>"),
      lit(PhoneRe), lit(0))).cast("long")
  def countIps(text: Column): Column =
    size(regexp_extract_all(regexp_replace(text, EmailRe, "<EMAIL>"), lit(IpRe), lit(0))).cast("long")
}
