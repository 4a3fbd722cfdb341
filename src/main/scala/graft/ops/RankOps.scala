package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Top-N per window/partition (SURVEY.md §2.6, T1/T2). The reference buffers
 * one window's rows in keyed `ListState`/`MapState`, fires a timer at
 * windowEnd+1ms, sorts in memory and takes N
 * (hot-items-analysis/.../HotItem.java:134-192,
 * network-flow-analysis/.../HotPage.java:140-204). In Spark this is a
 * declarative rank-over-window: `row_number().over(partitionBy(part)
 * .orderBy(order))` — planned as a single sort within each partition after
 * the aggregate's shuffle, no driver-side buffering, and AQE handles skewed
 * partitions.
 *
 * Callers MUST pass a total order (tie-break column) — `row_number` over a
 * partial order is nondeterministic across runs/engines.
 */
object RankOps {

  /** Keep the top `n` rows per `part` ordered by `order` (desc-first order
    * columns supplied by the caller). Emits `rn` (1-based, BIGINT). */
  def topN(df: DataFrame, n: Int, part: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= n)
  }
}
