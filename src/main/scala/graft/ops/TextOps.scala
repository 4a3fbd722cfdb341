package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction over a text column — the scrubbing pass a
 * training-data pipeline runs before anything leaves the raw zone.
 *
 * All patterns are codegen'd `regexp_count`/`regexp_replace` built-ins
 * (narrow per-row plan, no shuffle, no UDF) and deliberately avoid
 * lookaround so the same pattern text behaves identically under Java
 * regex and RE2-family engines.
 *
 * The driver testdata contains no PII-shaped strings (synthetic word
 * soup), so in addition to the inline-fixture specs the `pii_scrub` query
 * INJECTS deterministic PII per document and redacts it with this
 * pipeline; its oracle is regex-free (states counts and the exact
 * redacted text arithmetically), proving the Java patterns match the
 * injected spans precisely and nothing else.
 */
object TextOps {

  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  // >= 8 chars of digits/space/dash/parens between two digits; dots are NOT
  // in the class, so IPv4 octet runs stay too short to match
  val phoneRe: String = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** Adds per-row PII counts and a `text_redacted` column with emails, then
    * IPs, then phone runs replaced by typed placeholders. Each pattern is
    * counted on the text with the EARLIER patterns already redacted, so the
    * counts agree exactly with what `text_redacted` replaced: a digit run
    * inside an email local part ('123456789@x.com') or a dotted-quad email
    * domain counts once as an email, never again as a phone/IP (the
    * placeholders contain no digits, so they can't re-match). */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val afterEmail = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Re, "<IP>")
    df.withColumn("n_emails", regexp_count(col(textCol), lit(emailRe)).cast("long"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(ipv4Re)).cast("long"))
      .withColumn("n_phones", regexp_count(afterIp, lit(phoneRe)).cast("long"))
      .withColumn("text_redacted", regexp_replace(afterIp, phoneRe, "<PHONE>"))
  }
}
