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

  /** Credential/secret detection — the pre-training leak gate next to
    * [[redactPii]] (a detect-secrets-style scanner: pattern candidates,
    * then a Shannon-entropy confirmation, so a low-entropy lookalike is
    * reported but not flagged). Two detector families over the raw text:
    * AWS-style access-key ids (`AKIA` + 16 upper-hex, word-bounded) and
    * bare 32-hex blobs (API tokens, leaked digests). Each candidate gets
    * its exact character-distribution Shannon entropy in integer
    * micro-nats — per distinct character the term
    * `round(1e6·(k/n)·ln(n/k))` (rounded per class, then an exact BIGINT
    * sum: order-independent, the bm25 micro-unit idiom) — and is flagged
    * at ≥ 2.0 nats, the standard high-entropy bar for hex alphabets.
    *
    * Output: one row per detected candidate (doc_id, kind, tok,
    * token_len, n_distinct_chars, ent_micro, flagged).
    *
    * Scale shape: entirely PER-ROW — regex extraction, candidate
    * explode, and the entropy itself (in-row HOFs over the ≤ 36-char
    * token, O(distinct·len) per candidate). ZERO shuffles, no state —
    * so the same plan runs unchanged on an unbounded stream (the
    * ingest-time leak gate: scan documents as they arrive), proven in
    * StreamingJobsSpec. */
  def secretScan(df: DataFrame, textCol: String): DataFrame = {
    val aws = df.selectExpr("doc_id",
      s"explode(regexp_extract_all($textCol, '\\\\bAKIA[0-9A-F]{16}\\\\b', 0)) AS tok")
      .withColumn("kind", lit("aws"))
    val hex = df.selectExpr("doc_id",
      s"explode(regexp_extract_all($textCol, '\\\\b[0-9a-f]{32}\\\\b', 0)) AS tok")
      .withColumn("kind", lit("hex"))
    // per distinct character the micro-nat term round(1e6·(k/n)·ln(n/k)),
    // rounded per class then summed EXACTLY (order-independent integers —
    // the bm25 micro-unit idiom); Java split with limit -1 keeps a
    // trailing empty element, hence the filter
    val entExpr =
      "aggregate(transform(array_distinct(chs), c -> " +
        "CAST(round(1000000.0D" +
        " * (CAST(size(filter(chs, x -> x = c)) AS DOUBLE) / CAST(size(chs) AS DOUBLE))" +
        " * ln(CAST(size(chs) AS DOUBLE) / CAST(size(filter(chs, x -> x = c)) AS DOUBLE))" +
        ") AS BIGINT)), 0L, (a, x) -> a + x)"
    aws.unionByName(hex)
      .selectExpr("doc_id", "kind", "tok",
        "filter(split(tok, ''), c -> c <> '') AS chs")
      .selectExpr("doc_id", "kind", "tok",
        "CAST(size(chs) AS BIGINT) AS token_len",
        "CAST(size(array_distinct(chs)) AS BIGINT) AS n_distinct_chars",
        s"$entExpr AS ent_micro")
      .selectExpr("doc_id", "kind", "tok", "token_len", "n_distinct_chars",
        "ent_micro", "ent_micro >= 2000000L AS flagged")
  }
}
