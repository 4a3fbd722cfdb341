package graft

import org.apache.spark.sql.SparkSession

/**
 * Engine-tuned session factory: one place that encodes the scale defaults
 * (SURVEY.md §7.4-7) so every entry point — Verify, Bench, user code —
 * starts from the same plan-quality baseline.
 *
 *  - AQE on: runtime coalescing, skew-join splitting, join re-planning;
 *  - shuffle partitions sized to the machine, not Spark's default 200
 *    (on a real cluster: ~2-3× total executor cores, or AQE-coalesced);
 *  - RocksDB state store for streaming: keeps flatMapGroupsWithState /
 *    windowed-agg state off-heap and spillable — required at 10^8+ keys;
 *  - UTC session timezone (event-time determinism + oracle parity);
 *  - graft SQL functions injected via [[GraftExtensions]].
 */
object GraftSession {
  def builder(appName: String, cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .withExtensions(new GraftExtensions)
}
