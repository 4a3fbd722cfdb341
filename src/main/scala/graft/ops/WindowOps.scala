package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation, the core of the reference's operator
 * surface (SURVEY.md §2.5, A1-A8). The reference implements every windowed
 * count as a Flink `AggregateFunction` (partial) + `WindowFunction`
 * (finalize) pair (e.g. hot-items-analysis/.../HotItem.java:94-129);
 * Spark's hash aggregate does partial→final automatically and `window()`
 * exposes the bounds, so each pair collapses to one declarative
 * `groupBy(window(ts, size, slide), keys).agg(...)` that Catalyst plans with
 * map-side partial aggregation and whole-stage codegen.
 *
 * Scale notes (100 TB): the only shuffle is the hash exchange on
 * (window, keys) feeding the final aggregate; partial aggregation runs
 * map-side so shuffled volume is O(distinct keys × windows-per-event), not
 * O(events). Sliding windows expand each row into size/slide window copies
 * *after* filtering/pruning, so keep slide coarse relative to size.
 */
object WindowOps {

  /** Sliding event-time count per key: `groupBy(window(ts,size,slide), keys)`.
    * Reference: A1 (HotItem.java:73-74), A6-A8 (market-analysis). */
  def slidingCount(df: DataFrame, ts: Column, size: String, slide: String,
                   keys: Column*): DataFrame =
    df.groupBy(window(ts, size, slide) +: keys: _*)
      .agg(count(lit(1)).as("cnt"))

  /** Tumbling event-time count per key. Reference: A3 (PageView.java:76-80)
    * — the reference's 10-way salt + second-stage merge is Flink-parallelism
    * plumbing; Spark's partial/final hash agg makes it a single groupBy. */
  def tumblingCount(df: DataFrame, ts: Column, size: String,
                    keys: Column*): DataFrame =
    slidingCount(df, ts, size, size, keys: _*)

  /** Tumbling exact distinct count per key (A4, UniqueVisitor.java:64-79).
    * Exact count-distinct shuffles by (window, keys); fine when the distinct
    * column is bounded, see DistinctOps for the sketch/bitmap variants that
    * hold at 10^8+ cardinality. */
  def tumblingDistinct(df: DataFrame, ts: Column, size: String,
                       distinctCol: Column, keys: Column*): DataFrame =
    df.groupBy(window(ts, size, size) +: keys: _*)
      .agg(count_distinct(distinctCol).as("uv"))

  /** Gap-based session aggregation per key: `session_window(ts, gap)` —
    * the third event-time window type beside tumbling/sliding. A session
    * spans first-event ts to last-event ts + gap; state is merged as
    * sessions coalesce (streaming: watermark closes sessions). */
  def sessionCount(df: DataFrame, ts: Column, gap: String, keys: Column*): DataFrame =
    df.groupBy(session_window(ts, gap).as("window") +: keys: _*)
      .agg(count(lit(1)).as("cnt"))

  /** Replace the `window` struct column with epoch-second bounds
    * (`window_start`, `window_end` as BIGINT) for engine-agnostic
    * comparison; the reference emits `window.getEnd()` millis the same way
    * (HotItem.java:119-129). */
  def epochWindow(df: DataFrame): DataFrame =
    df.withColumn("window_start", col("window.start").cast("long"))
      .withColumn("window_end", col("window.end").cast("long"))
      .drop("window")
}
