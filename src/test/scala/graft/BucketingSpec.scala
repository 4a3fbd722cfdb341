package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing as the co-located-join tool (SURVEY §7.4-7): a fact table
  * bucketed on the join key joins a same-bucketed aggregate with ZERO
  * shuffle exchanges — the 100 TB pattern for repeated joins on one key
  * (pay the shuffle once at write time, never again at read time). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-partitioned join plans without any shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val evs = Tables.events(spark, sf0001).select("user_id", "event_type")
    val agg = Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val expected = evs.join(agg, "user_id").count()
    val bcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      evs.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/l").saveAsTable("b_events")
      agg.write.bucketBy(8, "user_id").sortBy("user_id")
        .option("path", s"$tmp/r").saveAsTable("b_agg")
      // disable broadcast so only bucket co-location can avoid the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_events").join(spark.table("b_agg"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcastBefore)
      spark.sql("DROP TABLE IF EXISTS b_events")
      spark.sql("DROP TABLE IF EXISTS b_agg")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    val before = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // tiny thresholds so the sf-test volumes count as "skewed"
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // key 0 carries ~50k wide rows; the rest of the keyspace is thin
      val pad = "x" * 120
      val left = spark.range(60000)
        .selectExpr(s"CASE WHEN id < 50000 THEN 0L ELSE id % 37 END AS k",
          s"concat('$pad', id) AS payload")
      val right = spark.range(37).selectExpr("id AS k", "id * 10 AS v")
        .union(spark.range(37).selectExpr("id AS k", "id * 11 AS v"))
      val joined = left.join(right, "k")
      // drive THIS queryExecution (count() would plan a separate collapsed
      // query and leave joined's adaptive plan unexecuted)
      assert(joined.collect().length == 120000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed join:\n${finalPlan.take(2000)}")
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter from a selective build side prunes the probe scan") {
    // The third 100 TB join-pruning tool next to bucketing and AQE skew
    // handling: when one join side is made selective by a filter, Spark
    // can inject a bloom filter built from it into the OTHER side's scan
    // (spark.sql.optimizer.runtime.bloomFilter.*), discarding non-joining
    // probe rows before the shuffle - at scale that is the difference
    // between shuffling the full fact table and shuffling the matching
    // slice. Thresholds are lowered so test-scale volumes qualify.
    val before = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val fact = Tables.lineitem(spark, sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val n = joined.collect().length
      // the injected filter lives in the OPTIMIZED plan as a
      // might_contain(scalar-subquery building bloom_filter_agg over the
      // selective side) wrapped around the probe-side scan
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the probe side:\n${plan.take(3000)}")
      // the filter must be semantically transparent
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(fact.join(dim, col("l_orderkey") === col("o_orderkey")).collect().length == n)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
