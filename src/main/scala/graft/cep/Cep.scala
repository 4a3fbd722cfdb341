package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * "cep-lite": the reference's pattern-detection surface (SURVEY.md §2.8)
 * as declarative Spark. Flink CEP compiles `begin(...).times(n)
 * .consecutive().within(d)` into an NFA over keyed state
 * (login-fail-detect/.../LoginFailWithCEP.java:62-68); Spark has no
 * MATCH_RECOGNIZE, but the two pattern shapes the reference uses reduce to:
 *
 *  - `times(n).consecutive().within(d)`  → a run-length check over
 *    `lag`/windowed sums per key in event-time order (this file, batch) or
 *    a per-key state machine in `flatMapGroupsWithState`
 *    (graft.streaming.ConsecutiveDetector, streaming);
 *  - `followedBy(b).within(d)` with timeout side-output → a time-band
 *    semi/anti join (graft.ops.JoinOps.followedByWithin, batch) or an
 *    EventTimeTimeout state machine (graft.streaming.FollowedByDetector).
 *
 * The batch formulations are pure window functions — codegen'd, one
 * hash-partition shuffle on the key, no per-row JVM state — and double as
 * the oracle-checkable ground truth the streaming variants are property-
 * tested against (SURVEY.md §5).
 */
object Cep {

  /**
   * Emit one match per event that closes a run of `n` consecutive
   * predicate-hits within `withinSec` seconds, per key, in event-time order
   * (ties broken by `idCol` — a total order is required for determinism).
   *
   * "Consecutive" is over the key's full event sequence (a non-hit breaks
   * the run), matching Flink's `.times(n).consecutive()` with the default
   * no-skip strategy: overlapping runs each emit
   * (LoginFailWithCEP.java:62-68 semantics).
   *
   * Output: key, first_id, last_id, first_ts, last_ts (epoch s), n_hits.
   */
  def consecutiveHits(df: DataFrame, key: Column, tsSec: Column, id: Column,
                      hit: Column, n: Int, withinSec: Long): DataFrame = {
    require(n >= 2, "a run needs at least 2 events")
    // windows are defined over the post-projection names, not the caller's
    val w = Window.partitionBy(col("key")).orderBy(col("ts_sec").asc, col("id").asc)
    val runW = w.rowsBetween(-(n - 1), 0)
    df.select(key.as("key"), tsSec.as("ts_sec"), id.as("id"), hit.as("hit"))
      .withColumn("hits_in_run", sum(col("hit").cast("long")).over(runW))
      .withColumn("first_ts", lag(col("ts_sec"), n - 1).over(w))
      .withColumn("first_id", lag(col("id"), n - 1).over(w))
      .filter(col("hits_in_run") === n &&
        col("ts_sec") - col("first_ts") <= withinSec)
      .select(col("key"), col("first_id"), col("id").as("last_id"),
        col("first_ts"), col("ts_sec").as("last_ts"),
        lit(n.toLong).as("n_hits"))
  }

  /**
   * C2 immediate-variant login-fail (LoginFail.java:145-196): warn on every
   * adjacent pair of hits within `withinSec`. Equivalent to
   * `consecutiveHits(n = 2)`; kept as a named operator because the
   * reference wires exactly this (n=2) variant.
   */
  def adjacentHits(df: DataFrame, key: Column, tsSec: Column, id: Column,
                   hit: Column, withinSec: Long): DataFrame =
    consecutiveHits(df, key, tsSec, id, hit, 2, withinSec)
}
