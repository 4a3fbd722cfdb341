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

  /** Gap-based session aggregation per key over a watermarked stream —
    * sessions close (and their state drops) when the watermark passes
    * last-event + gap. Output: session struct (start/end) + keys + cnt. */
  def sessionCount(stream: DataFrame, tsCol: String, watermarkDelay: String,
                   gap: String, keys: Column*): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("session") +: keys: _*)
      .agg(count(lit(1)).as("cnt"))

  /** Streaming ingest dedup on a content hash: drops any row whose hash
    * was already seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the streaming twin of the batch
    * `dedup_exact` groupBy. State per hash lives only until the watermark
    * passes its event time + delay, so memory is bounded by the horizon's
    * arrival rate; unbounded-history dedup in a stream would need unbounded
    * state and belongs in the batch layer. */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
                           watermarkDelay: String, contentCol: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("content_hash", md5(col(contentCol)))
      .dropDuplicatesWithinWatermark("content_hash")

  /** A2 late-data observability (SURVEY §7.4-2): total input rows dropped
    * as later-than-watermark across the query's retained progress history —
    * the measurable twin of the reference's dropped-late side output
    * (HotPage.java:77,88). Structured Streaming counts drops per stateful
    * operator (`numRowsDroppedByWatermark`); this sums them. Progress
    * retention is bounded (spark.sql.streaming.numRecentProgressUpdates,
    * default 100 batches) — poll per trigger for lifetime-exact totals. */
  def droppedLateRows(query: org.apache.spark.sql.streaming.StreamingQuery): Long =
    query.recentProgress.iterator
      .flatMap(_.stateOperators.iterator.map(_.numRowsDroppedByWatermark))
      .sum
}
