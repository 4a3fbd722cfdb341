package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming forms of the windowed-count family (SURVEY.md §2.5):
 * `readStream → withWatermark → groupBy(window, keys) → count`, the direct
 * mapping of the reference's event-time windows + watermark assigners
 * (HotItem.java:62-74). Append mode emits a window exactly once, when the
 * watermark passes its end — the streaming analogue of Flink's on-watermark
 * window fire; state for closed windows is dropped automatically
 * (watermark-bounded state, the 100 TB mandate of SURVEY.md §7.4-7).
 *
 * The same composition runs in batch (watermark is a no-op there), which is
 * what the batch queries in graft.queries use — one operator definition,
 * two execution modes, per the SURVEY §7.1 design rule.
 */
object StreamOps {

  /** Sliding event-time count per key over a watermarked stream. `tsCol`
    * must be a TimestampType column of the (streaming) DataFrame. */
  def slidingCount(stream: DataFrame, tsCol: String, watermarkDelay: String,
                   size: String, slide: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), size, slide) +: keys: _*)
      .agg(count(lit(1)).as("cnt"))

  def tumblingCount(stream: DataFrame, tsCol: String, watermarkDelay: String,
                    size: String, keys: Column*): DataFrame =
    slidingCount(stream, tsCol, watermarkDelay, size, size, keys: _*)

  /** Streaming distinct-user count per tumbling window via the fixed-size
    * HLL sketch (the streaming-safe distinct; exact per-window distinct in
    * streaming needs unbounded per-window state). */
  def tumblingApproxDistinct(stream: DataFrame, tsCol: String,
                             watermarkDelay: String, size: String,
                             distinctCol: Column, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), size, size) +: keys: _*)
      .agg(approx_count_distinct(distinctCol).as("uv_approx"))
}
