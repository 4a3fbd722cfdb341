package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Training-data-pipeline operators over `documents` — the capability class
 * the reference lacks but a 100 TB corpus engine needs: dedup, text quality
 * scoring, token counting. Everything here is pure Catalyst expressions
 * (higher-order array functions, regex, hash built-ins) — no UDFs, fully
 * codegen'd, filter/prune pushed to the parquet scan.
 */
object PipelineQueries {

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative. At scale this is one hash-shuffle on a
    * 128-bit key — the standard exact-dedup pass. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Per-document text statistics: token count (whitespace), regex-token
    * count (BPE-ish word/number/punct split), average token length, punct
    * count, stopword count. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .selectExpr("doc_id", "text",
        "filter(split(trim(text), ' '), t -> t <> '') AS toks")
      .selectExpr(
        "doc_id",
        "CAST(size(toks) AS BIGINT) AS n_tokens",
        "CAST(size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0)) AS BIGINT) AS n_rtokens",
        "CAST(aggregate(toks, 0, (a, t) -> a + length(t)) AS DOUBLE) / CAST(nullif(size(toks), 0) AS DOUBLE) AS avg_token_len",
        "CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) AS BIGINT) AS punct_cnt",
        "CAST(size(filter(toks, t -> array_contains(array('the','a','of','and','to','in','is','on','for','with'), t))) AS BIGINT) AS stop_cnt")

  /** Quality score in [0,1]: length saturation + punctuation cleanliness +
    * stopword density, the usual cheap pre-filter before expensive dedup. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    textStats(spark, dir).selectExpr(
      "doc_id",
      "CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE))" +
        " + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(punct_cnt AS DOUBLE) / (CAST(punct_cnt AS DOUBLE) + CAST(100.0 AS DOUBLE)))" +
        " + CAST(0.3 AS DOUBLE) * (CAST(stop_cnt AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE)) AS quality")
}

object PipelineOracles {
  val dedupExact: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM documents GROUP BY 1""".stripMargin

  private val toks = "list_filter(string_split(trim(text), ' '), t -> t <> '')"

  val textStats: String =
    s"""SELECT doc_id,
       |  CAST(len($toks) AS BIGINT) AS n_tokens,
       |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS n_rtokens,
       |  CAST(list_sum(list_transform($toks, t -> length(t))) AS DOUBLE)
       |    / CAST(nullif(len($toks), 0) AS DOUBLE) AS avg_token_len,
       |  CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS punct_cnt,
       |  CAST(len(list_filter($toks,
       |    t -> list_contains(['the','a','of','and','to','in','is','on','for','with'], t))) AS BIGINT) AS stop_cnt
       |FROM documents""".stripMargin

  val textQuality: String =
    s"""WITH s AS ($textStats)
       |SELECT doc_id,
       |  CAST(0.4 AS DOUBLE) * least(CAST(n_tokens AS DOUBLE) / CAST(200.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
       |  + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(punct_cnt AS DOUBLE) / (CAST(punct_cnt AS DOUBLE) + CAST(100.0 AS DOUBLE)))
       |  + CAST(0.3 AS DOUBLE) * (CAST(stop_cnt AS DOUBLE) / CAST(nullif(n_tokens, 0) AS DOUBLE)) AS quality
       |FROM s""".stripMargin

  val all: Map[String, String] = Map(
    "dedup_exact"  -> dedupExact,
    "text_stats"   -> textStats,
    "text_quality" -> textQuality,
  )
}
