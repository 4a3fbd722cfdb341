package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Scan-parallelism hygiene for CPU-heavy fan-out stages (per-token md5,
 * shingle explodes, pair scoring): work that sits UPSTREAM of the first
 * exchange runs at the scan's parallelism, and a small corpus arriving as
 * one parquet split therefore serializes the whole map side on a single
 * task — the r9 forensics measured the chunk-retrieval scoring loop at
 * 5 s single-task vs ~0.5 s distributed at sf0.1, and the same mechanism
 * taxes every shingling pass over the one-split documents table.
 *
 * [[ensureMin]] raises the partition count ONLY when it is below the
 * session's default parallelism: a 100 TB corpus already arrives in
 * thousands of splits and passes through untouched, so this is a local
 * small-input fix, never an extra corpus-scale shuffle.
 */
object Parallelism {

  /** `df` repartitioned to the default parallelism if currently below it;
    * streaming frames (no materializable RDD pre-execution) and
    * already-split inputs pass through unchanged. */
  def ensureMin(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
