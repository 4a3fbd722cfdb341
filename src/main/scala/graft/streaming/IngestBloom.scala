package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{broadcast, col, not}

/**
 * Bloom-routed replay-idempotency filter over an ever-ingested key set —
 * the fix for the per-batch O(corpus) term SCALE.md names in every
 * lifecycle fold's ADD path: `delivery.join(ingestedIds, "left_anti")`
 * must consult the corpus-sized maintained id set on EVERY micro-batch,
 * even though almost every delivery key is brand new (checkpointed
 * frames carry no size stats, so the anti-join additionally plans as a
 * corpus shuffle without AQE's runtime rescue).
 *
 * This is the RocksDB-memtable/SST-bloom idiom, driver-held: the bloom
 * over-approximates the set of keys EVER ingested (removals don't
 * retract — a bloom cannot delete), so
 *
 *  - "definitely not present" keys (the common case: fresh documents)
 *    are admitted with NO probe of the maintained view at all;
 *  - "maybe present" keys (true re-deliveries, remove-then-re-add
 *    cycles, and false positives at `fpp` rate) fall back to the exact
 *    membership probe — a broadcast-probe scan of the maintained view
 *    (semi-join with the BOUNDED maybe-set broadcast, never a corpus
 *    shuffle), which yields ground truth. A removed-then-re-added key is
 *    bloom-positive but absent from the view, so it re-admits correctly;
 *    a replayed delivery is bloom-positive and present, so it drops.
 *
 * Expected per-batch cost: O(delivery) when no key is bloom-positive —
 * the corpus-independent fold the 100 TB shape needs — and one
 * scan-only view probe otherwise. Driver memory is the bloom itself
 * (~1.2 bytes/key at 0.1 % fpp for the default 2^21 capacity); at plant
 * scale the expectation parameter is a deploy knob, and the structure
 * shards naturally by key range if one driver bloom outgrows memory.
 *
 * The routing itself is DRIVER-side over the delivery's collected key
 * set — a delivery-sized witness collect, bounded by the lifecycle
 * contract (same class as the feed's own per-batch materialization).
 * Collecting makes the decision immutable: the returned frame is a
 * literal-only filter of `cand`, safe under lazy re-evaluation, with no
 * executor closure over the mutable bloom (a closure-captured bloom UDF
 * was measured to poison sibling plans under the foreachBatch session).
 */
private[graft] final class IngestBloom(ids0: DataFrame, keyCol: String,
                                       expected: Long, fpp: Double) {
  private val n = math.max(expected, 1L)
  // stat.bloomFilter NPEs on an empty frame (fresh-state bootstrap is
  // the common case) — build the empty-compatible sketch directly
  private val bloom =
    if (ids0.isEmpty) org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
    else ids0.stat.bloomFilter(keyCol, n, fpp)

  /** Rows of the delivery-sized, key-distinct `cand` whose key has NOT
    * been ingested, consulting `presentOf` (the exact maintained set)
    * only for the bloom's maybe-set; every key this call returns is
    * folded into the bloom before returning (route-and-admit is one
    * atomic driver-side step — the caller needs no further protocol).
    * `presentOf` receives the bounded maybe-key frame (one `keyCol`
    * column) and returns the subset that EXISTS in the maintained set —
    * [[IngestBloom.viewProbe]] for an unbucketed view (one
    * broadcast-probe scan), or `st.probe(_)` for a key-bucketed
    * [[SegmentedState]] (a plan-time-pruned point read — the r15
    * verdict #2 wiring: the maybe-probe then never scans the
    * corpus-sized view at all). */
  def admitFresh(cand: DataFrame,
                 presentOf: DataFrame => DataFrame): DataFrame = {
    val keys = cand.select(keyCol).na.drop().distinct()
      .collect().map(_.getLong(0))
    val maybe = keys.filter(bloom.mightContainLong)
    val present: Set[Long] =
      if (maybe.isEmpty) Set.empty
      else {
        // exact truth for the bounded maybe-set
        val spark = cand.sparkSession
        val mk = spark.createDataFrame(
          java.util.Arrays.asList(maybe.map(Row(_)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(keyCol,
              org.apache.spark.sql.types.LongType, nullable = false))))
        presentOf(mk).select(keyCol).collect().map(_.getLong(0)).toSet
      }
    keys.foreach(k => if (!present(k)) bloom.putLong(k))
    if (present.isEmpty) cand
    else cand.filter(not(col(keyCol).isin(present.toSeq: _*)))
  }
}

private[graft] object IngestBloom {
  /** Default capacity/precision: 2^21 keys at 0.1 % false-positive rate
    * (~3.6 MB of driver bits) — sized for the probe corpora with 20×
    * headroom; a plant deployment sizes `expected` to its corpus. */
  val DefaultExpected: Long = 1L << 21
  val DefaultFpp: Double = 0.001

  /** The unbucketed `presentOf`: one broadcast-probe SCAN of the
    * maintained view per maybe-set (semi-join with the bounded maybe
    * frame broadcast — never a corpus-side exchange). */
  def viewProbe(idsView: => DataFrame, keyCol: String)
      : DataFrame => DataFrame =
    mk => idsView.join(broadcast(mk), Seq(keyCol), "left_semi")
}
