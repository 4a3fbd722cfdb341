package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Drop Spark-side state a finished query leaked (persisted RDDs from
    * iterative fixpoints' `localCheckpoint`, cached plans), so each timed
    * run starts from the same clean session. Without this, queries late in
    * the alphabet were measured against the accumulated block-manager
    * residue of ~80 earlier queries — the r5 artifact recorded same-code
    * inflations up to 10× on tail queries for exactly this reason.
    * Unpersist is BLOCKING: with blocking=false the block removal raced
    * the next rep's execution (the r6 forensics suspect for the
    * item_pagerank 4–23 s rep spread — checkpoint blocks of a previous
    * rep being evicted mid-measurement). */
  private[graft] def resetState(spark: SparkSession): Unit = {
    try {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    } catch { case e: Throwable => System.err.println(s"[bench] reset: $e") }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // median-of-N per query (N=3 default): one shot was hostage to ambient
    // host contention — the r5 gate artifact disagreed with same-code
    // reruns by up to 10× on single queries
    // malformed env values degrade to the defaults rather than aborting
    // the whole bench run with a NumberFormatException
    val reps = scala.util.Try(sys.env("SPARK_GRAFT_BENCH_REPS").trim.toInt)
      .getOrElse(3).max(1)
    val spark = GraftSession.builder("graft-bench", cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-query untimed warmup reps (below) replace the old global "warm
    // the first query" pass: JIT/codegen warmup of a CODEPATH otherwise
    // lands on whichever query reaches it first alphabetically — the r6
    // artifact recorded dedup_clusters (first user of the CC fixpoint
    // path) 3.8× SLOWER than its own superset query train_split_safe for
    // exactly this reason, and the same mechanism inverted the pair the
    // other way in r5. One still-global pass warms the session itself.
    val warmups = scala.util.Try(sys.env("SPARK_GRAFT_BENCH_WARMUPS").trim.toInt)
      .getOrElse(1).max(0)
    try spark.range(16).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // prime the persisted-state setup stages OUTSIDE any timed rep: the
    // dedup_clusters_persist / _takedown_persist queries exist to price
    // delivery/takedown-sized cost, and with SPARK_GRAFT_BENCH_WARMUPS=0
    // their lazy one-time base resolution would otherwise land inside
    // timed rep 0 (and its CC runs inside CC_ROUNDS.json), contradicting
    // the very claim the rows measure
    try {
      graft.queries.ClusterState.baseStatePaths(spark, sfDir,
        graft.queries.ClusterState.PersistDeliveryMod)
      graft.queries.ClusterState.fullStatePaths(spark, sfDir)
      graft.ops.ClusterOps.CcStats.drain()
    } catch { case e: Throwable => System.err.println(s"[bench] state prime: $e") }
    // per-(query, rep) CC fixpoint forensics: variant, round count, and
    // per-round wall millis, drained from ClusterOps.CcStats after each
    // timed rep — the r7 verdict's open question (driver-measured
    // dedup_clusters at 5x its builder-local cost with identical plans)
    // needs per-round evidence FROM THE GATE ENVIRONMENT to name the
    // mechanism; CC_ROUNDS.json below is that artifact.
    val ccRounds = scala.collection.mutable.ArrayBuffer[(String, Int, graft.ops.ClusterOps.CcStats.Run)]()
    // wall-clock anchor for per-rep start offsets (BENCH_RUNS "starts"):
    // the r8 gate artifact showed two alphabetically ADJACENT queries
    // inflated together with a mid-query recovery (hot_pages rep 3 back at
    // r7 cost) — a transient host-contention window. Absolute rep timing
    // makes such windows directly visible across query boundaries instead
    // of inferred from adjacency.
    val benchT0 = System.nanoTime()
    val allRuns = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // untimed: compiles/loads this query's whole codepath (codegen
      // classes, expression JIT, parquet footers) so rep 1 measures the
      // plan, not the first-touch costs
      (0 until warmups).foreach { _ =>
        resetState(spark)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // failures surface in timed reps
      }
      graft.ops.ClusterOps.CcStats.drain() // warmup runs don't pollute the artifact
      val times = (0 until reps).map { rep =>
        resetState(spark)
        val t0 = System.nanoTime()
        val startOff = (t0 - benchT0) / 1e9
        // noop sink forces full materialization of every output column —
        // count() would let Catalyst prune the computed columns away.
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.ClusterOps.CcStats.drain().foreach(r => ccRounds += ((name, rep, r)))
        // a crashed run must be distinguishable from a fast success:
        // elapsed-until-failure rides along negated
        (if (ok) sec else -sec, startOff)
      }
      name -> times
    }
    // a query is failed if ANY rep crashed; otherwise score the median rep
    val results = allRuns.map { case (name, times) =>
      val secs = times.map(_._1)
      name -> secs.find(_ < 0).getOrElse(secs.sorted.apply(secs.length / 2))
    }.toMap
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    // millisecond precision keeps the artifact line short: the round-3
    // capture lost 11 of 78 per-query times because the full-precision
    // line outgrew the driver's stdout tail buffer
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"warmups":$warmups,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    // durable copies first: even if the stdout tail is clipped again, the
    // full metrics object survives as a whole file in the repo; the
    // per-rep detail (for variance audits) goes to its own file so the
    // stdout line stays within the driver's tail buffer
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_LAST.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val runsJson = allRuns.sortBy(_._1)
        .map { case (k, ts) => "\"" + k + "\":" + ts.map(t => fmt(t._1)).mkString("[", ",", "]") }
        .mkString("{\"reps\":" + reps + ",\"runs\":{", ",", "},") +
        // per-rep start offsets (seconds since bench start): lets a
        // variance audit see whether inflated reps share one wall-clock
        // window across adjacent queries (host contention) or track the
        // query itself (a real plan cost)
        allRuns.sortBy(_._1)
          .map { case (k, ts) => "\"" + k + "\":" + ts.map(t => fmt(t._2)).mkString("[", ",", "]") }
          .mkString("\"starts\":{", ",", "}}\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_RUNS.json"),
        runsJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // interpolated identifiers are JSON-escaped: today's query keys and
      // CC variants are clean, but a future key containing a quote or
      // backslash must not silently emit an invalid artifact
      def esc(s: String): String =
        s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
                    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
      val ccJson = ccRounds
        .map { case (q, rep, r) =>
          s"""{"query":"${esc(q)}","rep":$rep,"variant":"${esc(r.variant)}","rounds":${r.rounds},""" +
            s""""total_ms":${r.totalMillis},"round_ms":${r.roundMillis.mkString("[", ",", "]")}}"""
        }
        .mkString("[", ",\n ", "]\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("CC_ROUNDS.json"),
        ccJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable => System.err.println(s"[bench] file write: $e") }
    spark.stop()
    // the JSON line is the FINAL stdout of the process — nothing (not even
    // Spark shutdown chatter) may land after it in the captured tail
    println(json)
  }
}
