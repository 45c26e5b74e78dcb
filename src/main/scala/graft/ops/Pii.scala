package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass every training-data pipeline runs
  * before text leaves curation (emails, phone numbers, IP addresses →
  * typed placeholder tokens), plus per-type match counts for the
  * redaction audit report.
  *
  * Spark-first design: pure column expressions (`regexp_count` /
  * `regexp_replace`), so the whole scrub stays inside whole-stage
  * codegen and can run in the scan projection — no UDF, no extra pass.
  * At 100 TB this is a map-only stage: no shuffle, and with the counts
  * aggregated downstream the audit roll-up is one map-side-combined
  * hash aggregate.
  *
  * Semantics (documented contract, mirrored by the DuckDB oracle twin):
  *   - counts are per-pattern over the ORIGINAL text (so an IP inside
  *     an email's host counts as both — the audit counts what each
  *     detector saw, not what survived earlier redactions);
  *   - redaction is sequential email → phone → IPv4, so nested matches
  *     collapse into the outermost (email) placeholder.
  *
  * Patterns deliberately use the RE2-compatible subset (character
  * classes, bounded repeats, `\b`) so Java regex (Spark) and RE2
  * (DuckDB/re2-based engines) agree on every input.
  */
object Pii {

  /** Conservative email shape: local part, @, dotted host, alpha TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shape +C[C]-NNN-NNN[-N]NNNN. */
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Dotted-quad IPv4 (word-bounded; no octet range check — scrubbing
    * prefers false positives over leaking a real address). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val PhoneToken = "<PHONE>"
  val Ipv4Token = "<IP>"

  /** The redacted text: sequential email → phone → IPv4 replacement. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        PhoneRe, PhoneToken),
      Ipv4Re, Ipv4Token)

  /** Adds `n_emails`, `n_phones`, `n_ipv4` (counts over the original
    * text, BIGINT) and `redacted` to the frame. One codegen projection,
    * map-only. */
  def withPiiRedacted(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_emails", regexp_count(c, lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(c, lit(PhoneRe)).cast("long"))
      .withColumn("n_ipv4", regexp_count(c, lit(Ipv4Re)).cast("long"))
      .withColumn("redacted", redact(c))
  }
}
