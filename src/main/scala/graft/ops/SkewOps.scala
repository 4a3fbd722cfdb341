package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew handling (SURVEY.md §2.2 P4 / §4): the reference salts its global PV
 * count by hand — map to a random 0-9 key, count per salt, re-key and merge
 * (PageView.java:66-166) — because a single hot key serializes one Flink
 * subtask. Spark's windowed counts don't need it (partial aggregation
 * spreads the map-side work), and AQE splits skewed shuffle partitions at
 * runtime; this operator exists for the cases those don't cover: a massive
 * per-key aggregation whose REDUCE side is dominated by a few hot keys
 * (e.g. count/sum per user where one user is 30% of a 100 TB table).
 *
 * Two-phase plan: add a salt in [0, buckets), partial-aggregate on
 * (keys, salt) — shrinking the hot key's rows by `buckets`× before the
 * second shuffle — then final-aggregate on (keys). Only alebraic aggregates
 * (count/sum/min/max) compose this way.
 */
object SkewOps {

  /** Salted two-phase count per key set. */
  def saltedCount(df: DataFrame, buckets: Int, keys: Column*): DataFrame =
    df.withColumn("__salt", (rand(42) * buckets).cast("int"))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("cnt"))

  /** Salted two-phase sum. */
  def saltedSum(df: DataFrame, value: Column, buckets: Int, keys: Column*): DataFrame =
    df.withColumn("__salt", (rand(42) * buckets).cast("int"))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(value).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as("sum"))
}
