package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data curation: every decision derives
 * from a content hash, never `rand()`, so a sample is reproducible across
 * engines, cluster sizes, retries, and re-runs (the property `train_split`
 * already relies on — a resampled corpus is an invalidated experiment).
 *
 * Two modes with different scale shapes:
 *  - [[hashRateSample]]: keep a fixed FRACTION per stratum — a stateless
 *    per-row filter, no shuffle, the 100 TB default;
 *  - [[stratifiedQuota]]: keep a fixed COUNT per stratum — needs a
 *    per-stratum rank, i.e. one shuffle on the stratum key. With few huge
 *    strata the rank sort is the bottleneck; pre-thin with
 *    [[hashRateSample]] at a safe multiple of quota/|stratum| first, then
 *    rank the survivors (the standard top-K-by-random-key reduction).
 */
object SamplingOps {

  /** 60-bit md5-derived sampling hash of `keyExpr` — decimal-uniform and
    * restatable bit-for-bit in the DuckDB oracle. */
  private def sampleHash(keyExpr: String): String =
    DedupOps.md5Long(keyExpr)

  /** Keep rows where hash(key) mod 1e6 < rate × 1e6 — deterministic
    * Bernoulli-style sampling, per-stratum rates via `rateExpr` (a SQL
    * expression that may reference row columns, e.g. a CASE over langs).
    * Adds `sample_bucket` (the hash residue) for audit. */
  def hashRateSample(df: DataFrame, keyExpr: String, rateExpr: String): DataFrame =
    df.withColumn("sample_bucket", expr(s"pmod(${sampleHash(keyExpr)}, 1000000)"))
      .filter(expr(s"sample_bucket < CAST(round(($rateExpr) * 1000000.0D) AS BIGINT)"))

  /** Keep the `quota` lowest-hash rows per stratum (all rows of a stratum
    * smaller than its quota). Output adds `rk` (1-based rank within the
    * stratum, hash order) — stable under corpus growth: a new document
    * displaces at most one sampled row of its stratum. `keyExpr` must be
    * injective per row (include the row id) so the hash order is a total
    * order up to 60-bit collisions — the same residual ambiguity the
    * oracle's identical sort carries. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyExpr: String,
                      quota: Int): DataFrame =
    stratifiedQuota(df, stratumCol, keyExpr, quota, None)

  /** As [[stratifiedQuota]], with the scale path: `prefilter = Some(rate)`
    * keeps only the globally lowest `rate` fraction of the hash space
    * (`h < rate × 2^60` — a stateless narrow filter) BEFORE the
    * per-stratum rank, so the rank sort sees `rate × N` rows instead of
    * the corpus. Because the quota sample IS the per-stratum lowest-hash
    * rows, the prefiltered result EQUALS the exact result whenever every
    * stratum still has ≥ quota rows inside the slab — size
    * `rate ≳ safety × quota / min-stratum-size` (hash counts concentrate
    * tightly; safety 3–5 makes a miss astronomically unlikely, and a
    * stratum returning < quota rows is the observable tell). This is the
    * same exact-vs-scale duality as the percentile sketch: identical
    * answer, survivable plan. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyExpr: String,
                      quota: Int, prefilter: Option[Double]): DataFrame = {
    val hashed = df.withColumn("__h", expr(sampleHash(keyExpr)))
    val thinned = prefilter match {
      case Some(rate) =>
        val cut = (rate * (1L << 60).toDouble).toLong
        hashed.filter(col("__h") < cut)
      case None => hashed
    }
    thinned
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col("__h").asc)).cast("long"))
      .filter(col("rk") <= quota)
      .drop("__h")
  }
}
