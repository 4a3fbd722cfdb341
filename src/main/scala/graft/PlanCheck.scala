package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the scale-critical queries so the
  * shuffle/broadcast/pushdown shape can be reviewed (SURVEY.md §7.4-7). */
object PlanCheck {
  /** `runMain graft.PlanCheck <dir> --inventory` prints one markdown row
    * per SparkEntry query: shuffle and broadcast exchanges in the
    * pre-execution adaptive plan — the audit table behind PLANS.md.
    * (Codegen spans only materialize at execution under AQE, so they are
    * not countable here; iterative queries — dedup_clusters, pq_* — show
    * their FINAL composed plan, their training/loop actions having already
    * run during query construction.) */
  private def inventory(spark: SparkSession, dir: String): Unit = {
    println("| query | shuffle exch | broadcast exch |")
    println("|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val lines = plan.linesIterator.toSeq
        val bcast = lines.count(_.contains("BroadcastExchange"))
        // ReusedExchange nodes reference an exchange planned elsewhere
        // (possibly a broadcast one) — counting them as fresh shuffles
        // would overstate the plan's exchange cost
        val shuffle = lines.count(l =>
          l.contains("Exchange ") && !l.contains("BroadcastExchange") &&
            !l.contains("ReusedExchange"))
        println(s"| $name | $shuffle | $bcast |")
      } catch {
        case e: Throwable => println(s"| $name | plan error: ${e.getMessage} | |")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet else Set(
      "q3_top_orders", "q5_nation_revenue", "hot_items_topn", "tx_match",
      "dedup_minhash", "embed_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.length > 1 && args(1) == "--inventory") {
      inventory(spark, dir)
      spark.stop()
      return
    }
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // percentile modes: the default (approx sketch) must plan WITHOUT a
    // Window — the exact rank form funnels the table through one sort
    // partition per group, which is the documented scale-killer
    println("\n========== value_percentiles default (approx) ==========")
    val defPlan = SparkEntry.queries("value_percentiles")(spark, dir)
      .queryExecution.executedPlan.toString
    require(!defPlan.contains("Window"),
      "default value_percentiles plan must not contain a Window sort")
    println(defPlan.linesIterator.take(6).mkString("\n"))
    println("OK: no Window/per-group global sort in default percentile plan")

    // the forward-store probe must PRUNE at plan time: a bounded takedown
    // batch's bucket set becomes PartitionFilters on the store's _kb
    // partition column (directories never listed into the scan), with the
    // id In-filter pushed into the surviving files — the PushedFilters
    // discipline applied to persisted state (r13 verdict item #4)
    println("\n========== bm25_downfold_probe (partition-pruned store probe) ==========")
    val dfPlan = SparkEntry.queries("bm25_downfold_probe")(spark, dir)
      .queryExecution.executedPlan.toString
    // literal In lists print as INSET once past the In→InSet threshold
    require(dfPlan.linesIterator.exists(l =>
        l.contains("PartitionFilters: [") && l.contains("_kb") &&
          (l.contains("INSET") || l.contains(" IN "))),
      "forward-store probe must carry a non-empty _kb partition filter")
    require(dfPlan.linesIterator.exists(l =>
        l.contains("doc_id") &&
          (l.contains("PushedFilters: [In(doc_id") ||
            l.contains("DataFilters: [doc_id") && l.contains("INSET"))),
      "forward-store probe must push the id In-filter into the parquet scan")
    println("OK: PartitionFilters[_kb INSET ...] + pushed In(doc_id ...) present")

    // the deployed decontamination direction: the FIXED eval index joins
    // as a BROADCAST build side (the corpus-scaling train store is never
    // in this plan at all), and the delivery bounds are pushed into the
    // documents scan — nothing in the timed plan is corpus-sized
    println("\n========== contamination_delivery (broadcast eval index) ==========")
    val cdPlan = SparkEntry.queries("contamination_delivery")(spark, dir)
      .queryExecution.executedPlan.toString
    require(cdPlan.contains("BroadcastHashJoin"),
      "delivery decontamination must broadcast the fixed eval index")
    val lo = graft.queries.PipelineQueries.ContamDeliveryLo
    require(cdPlan.linesIterator.exists(l =>
        l.contains("PushedFilters: [") &&
          l.contains(s"GreaterThanOrEqual(doc_id,$lo)")),
      s"delivery lower bound (doc_id >= $lo, PipelineQueries.ContamDeliveryLo)" +
        " must be pushed into the documents parquet scan")
    println("OK: BroadcastHashJoin on eval index + pushed delivery bounds")

    // the IVF-PQ serve must prune the cell-partitioned codes store at
    // plan time: the probed-cell union (a bounded literal) appears as
    // PartitionFilters on `cell` — unprobed cell directories are never
    // listed into the scan
    println("\n========== pq_topk_ivf (cell-pruned codes store) ==========")
    val ivfPlan = SparkEntry.queries("pq_topk_ivf")(spark, dir)
      .queryExecution.executedPlan.toString
    require(ivfPlan.linesIterator.exists(l =>
        l.contains("PartitionFilters: [") && l.contains("cell") &&
          (l.contains("INSET") || l.contains(" IN "))),
      "IVF-PQ serve must carry a non-empty cell partition filter on the codes scan")
    println("OK: PartitionFilters[cell ...] present on the codes store scan")

    // PQ encode must be a narrow pass: the codebook is plan literals, so
    // assigning codes to the whole corpus cannot justify any exchange
    println("\n========== pq_codes (encode must not shuffle) ==========")
    val pqPlan = SparkEntry.queries("pq_codes")(spark, dir)
      .queryExecution.executedPlan.toString
    require(!pqPlan.contains("Exchange"),
      "PQ encode must be a narrow no-shuffle pass over the corpus")
    println("OK: no Exchange in PQ encode plan")

    // pagerank checkpoints each round: the final plan must not grow with
    // the iteration count (pre-r4 it replayed all previous rounds' lineage)
    println("\n========== pagerankFixed (constant-size round plan) ==========")
    val prEdges = spark.range(0, 200)
      .selectExpr("id AS src", "(id * 7 + 1) % 200 AS dst")
    // localMaxEdges = 0 forces the distributed rounds — the small-graph
    // local path is a single LocalRelation and would pass vacuously
    def prPlanLines(iters: Int): Int =
      graft.ops.ClusterOps.pagerankFixed(prEdges, iters, localMaxEdges = 0)
        .queryExecution.executedPlan.toString.linesIterator.size
    val pr3 = prPlanLines(3)
    val pr9 = prPlanLines(9)
    require(pr3 == pr9,
      s"pagerank round plan must be constant-size (iters=3: $pr3 lines, iters=9: $pr9)")
    println(s"OK: plan is $pr3 lines at iters=3 and iters=9")

    // the secret scanner's stateless contract (streams depend on it):
    // regex candidates + in-row entropy — no exchange anywhere
    println("\n========== secret_scan (stateless per-row scan) ==========")
    val ssPlan = SparkEntry.queries("secret_scan")(spark, dir)
      .queryExecution.executedPlan.toString
    require(!ssPlan.contains("Exchange"),
      "secret_scan must stay a zero-shuffle per-row scan (its streaming " +
        "deployment plans the SAME stateless query)")
    println("OK: no Exchange in secret_scan plan")

    // rate-mode sampling is a stateless filter — no exchange anywhere
    println("\n========== hashRateSample (stateless filter) ==========")
    val rsPlan = graft.ops.SamplingOps.hashRateSample(
        graft.sources.Tables.documents(spark, dir),
        "concat(CAST(doc_id AS STRING), '|', md5(text))", "0.1")
      .queryExecution.executedPlan.toString
    require(!rsPlan.contains("Exchange"),
      "rate sampling must be a narrow no-shuffle filter")
    println("OK: no Exchange in rate-sample plan")

    // the config-gated distinct→HLL optimizer rule, observed end-to-end
    println("\n========== approxDistinct rewrite ==========")
    val s2 = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      GraftSession.builder("graft-plancheck").master("local[4]").getOrCreate()
    }
    graft.sources.Tables.events(s2, dir).createOrReplaceTempView("ev")
    val q = "SELECT count(DISTINCT user_id) AS uv FROM ev"
    s2.conf.set("spark.graft.approxDistinct", "false")
    println(s"exact:  uv=${s2.sql(q).collect().head.getLong(0)}")
    s2.conf.set("spark.graft.approxDistinct", "true")
    println(s"approx: uv=${s2.sql(q).collect().head.getLong(0)}")
    println(s2.sql(q).queryExecution.optimizedPlan.toString.linesIterator
      .take(2).mkString("\n"))
    spark.stop()
  }
}
