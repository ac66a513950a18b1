package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training-data pipeline: detect and redact emails,
  * IPv4 addresses, and phone numbers.
  *
  * Patterns are deliberately restricted to the syntax subset that behaves
  * identically under Java regex (Spark) and RE2 (DuckDB/Go scrubbers):
  * no lookaround, no backreferences — so the same rule set is portable
  * across the ecosystem a real pipeline mixes. All pure Catalyst
  * (`regexp_count`/`regexp_replace` are codegen'd, narrow, shuffle-free):
  * at 100 TB this runs as a map-only pass at scan parallelism.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  // Digits with separators, 8..16 chars total, after an optional '+'.
  // Deliberately recall-biased, like most regex phone scrubbers: an
  // 8+-digit run with dashes/spaces (a date "2026-08-17 12", a numeric id)
  // also matches. That over-match is visible in `n_phones` — callers who
  // need precision gate on it (or swap PhoneRe for a stricter rule) rather
  // than silently losing recall.
  val PhoneRe = "\\+?[0-9][0-9 ()\\-]{6,14}[0-9]"

  /** Counts + redacted text. Redaction order matters: emails first (an
    * email's domain may contain digit runs), then IPs (dotted quads would
    * otherwise be partially eaten by the phone rule), then phones. Each
    * count is taken on the text AFTER the earlier rules ran, so the counts
    * are exactly the number of [EMAIL]/[IP]/[PHONE] tokens in `redacted` —
    * an IP inside an email's domain ("bob@10.0.0.1.example.com") is email,
    * not email AND ip. */
  def scrub(docs: DataFrame, text: Column): DataFrame = {
    val noEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val noIp = regexp_replace(noEmail, Ipv4Re, "[IP]")
    val clean = regexp_replace(noIp, PhoneRe, "[PHONE]")
    docs.select(
      col("doc_id"),
      regexp_count(text, lit(EmailRe)).as("n_emails"),
      regexp_count(noEmail, lit(Ipv4Re)).as("n_ips"),
      regexp_count(noIp, lit(PhoneRe)).as("n_phones"),
      clean.as("redacted"),
    )
  }
}
