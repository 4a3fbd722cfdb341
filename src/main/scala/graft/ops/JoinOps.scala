package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Two-stream operators (SURVEY.md §2.7): the reference's whole join surface
 * is an equi-key + time-band interval join (order-pay-detect/...
 * /TxPayMatchByJoin.java:63-67) and a keyed co-process reconciliation with
 * unmatched side-outputs (TxPayMatch.java:82-170). Declaratively:
 *
 *  - interval join  → inner join with `rightTs BETWEEN leftTs+lower AND
 *    leftTs+upper` — Spark plans the equi-key part as a hash join and
 *    evaluates the band as a post-condition; at scale both sides shuffle
 *    once on the key.
 *  - reconcile      → matched (inner) ∪ unmatched-left (anti) ∪
 *    unmatched-right (anti), emitted as a tagged union — the side-output
 *    pattern (SURVEY.md §1.4). Three hash joins on the same key, which AQE
 *    plans off one shuffle per input side; no nested-loop full-outer.
 *  - followedByWithin → C4/C5 "A then B within d, else timeout": semi/anti
 *    time-band join splitting A rows into matched/timeout.
 */
object JoinOps {

  /** J2: inner equi-join on `key` with `rTs` in [lTs+lowerSec, lTs+upperSec].
    * Caller projects/aliases columns to avoid name collisions. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyEq: Column,
                   lTs: Column, rTs: Column, lowerSec: Long, upperSec: Long): DataFrame =
    left.join(right,
      keyEq && rTs >= lTs + lowerSec && rTs <= lTs + upperSec, "inner")

  /** J1 side-outputs: rows of `left` with no band-matching `right` partner
    * and vice versa, as a tagged union. `leftCols`/`rightCols` name the
    * projected output of each side (same arity/names for the union). */
  def unmatched(left: DataFrame, right: DataFrame, keyEq: Column,
                lTs: Column, rTs: Column, lowerSec: Long, upperSec: Long,
                leftTag: String, rightTag: String,
                leftCols: Seq[Column], rightCols: Seq[Column]): DataFrame = {
    val cond = keyEq && rTs >= lTs + lowerSec && rTs <= lTs + upperSec
    val ul = left.join(right, cond, "left_anti")
      .select(lit(leftTag).as("tag") +: leftCols: _*)
    // same band from the right row's perspective: lTs ∈ [rTs-upper, rTs-lower]
    val ur = right.join(left, cond, "left_anti")
      .select(lit(rightTag).as("tag") +: rightCols: _*)
    ul.union(ur)
  }

  /** As-of join: for each left row, the latest right row with the same key
    * and rightTs ≤ leftTs (point-in-time attribute lookup — e.g. "the
    * user's most recent signup before this event").
    *
    * Implementation is the union-and-carry formulation, not a range join:
    * tag both inputs, union, and carry the last right value forward with
    * `last(ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)` — ONE
    * hash shuffle on the key and one sort, no per-row range probe, no
    * row-count explosion; this is the shape that survives 100 TB (a range
    * join would be a broadcast-nested-loop or an interval explosion).
    *
    * `valueCols` are the right-side columns to carry. Right rows sort
    * before left rows on ts ties (side 0 < 1): a right row AT leftTs is
    * visible to it. Two RIGHT rows with the same (key, ts) are ambiguous
    * (any as-of join is); callers should ensure right-side (key, ts)
    * uniqueness — trivially true for µs-resolution event times. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               lTs: String, rTs: String, valueCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(lTs))
      .withColumns(valueCols.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val r = right.select(Seq(col(key), col(rTs).as("__ts"), lit(0).as("__side")) ++
      valueCols.map(col): _*)
    val unioned = l.select(l.columns.filterNot(_ == "__side").map(col) :+ col("__side"): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side", "__ts")
  }

  /** C4/C5 batch form: for each `a` row, 'matched' if some `b` row shares
    * the key with ts in (aTs, aTs+withinSec], else 'timeout'. Semi + anti
    * join, statuses unioned. */
  def followedByWithin(a: DataFrame, b: DataFrame, keyEq: Column,
                       aTs: Column, bTs: Column, withinSec: Long,
                       matchedTag: String, timeoutTag: String): DataFrame = {
    val cond = keyEq && bTs > aTs && bTs <= aTs + withinSec
    a.join(b, cond, "left_semi").withColumn("status", lit(matchedTag))
      .union(a.join(b, cond, "left_anti").withColumn("status", lit(timeoutTag)))
  }

  /** C5 FULL taxonomy — the reference's four-way order-pay outcome
    * (order-pay-detect/.../OrderTimeoutWithoutCEP.java:91-160) over inputs
    * with AT MOST ONE `a` (create) and ONE `b` (pay) row per key:
    *
    *  - both sides, bTs < aTs + within → `matchedTag` ("payed successfully";
    *    a pay at-or-before the create — the reference's out-of-order 1.1
    *    branch — also matches, since bTs < aTs < aTs+within);
    *  - both sides, bTs ≥ aTs + within → `lateTag` ("payed but already
    *    timeout" — the 2.1.2 arrival-tolerant branch);
    *  - b only → `orphanTag` ("already payed but not found created log");
    *  - a only → `timeoutTag` ("order pay timeout").
    *
    * One full-outer hash join on the key — both sides shuffle once; at
    * scale AQE broadcasts whichever side is small. Streaming twin:
    * graft.streaming.Detectors.followedByFull. */
  def followedByFullStatus(a: DataFrame, b: DataFrame, key: String,
                           aTs: String, bTs: String, withinSec: Long,
                           matchedTag: String, lateTag: String,
                           orphanTag: String, timeoutTag: String): DataFrame =
    a.join(b, Seq(key), "full_outer")
      .withColumn("status",
        when(col(aTs).isNull, lit(orphanTag))
          .when(col(bTs).isNull, lit(timeoutTag))
          .when(col(bTs) < col(aTs) + withinSec, lit(matchedTag))
          .otherwise(lit(lateTag)))
}
