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
      // ContextCleaner only reaps a query's shuffle files after its
      // ShuffleDependency objects are GC'd; without an explicit GC a
      // shuffle-heavy query's files accrete across its OWN reps on a
      // disk-pressured host (the r9 escalating-rep residue:
      // cluster_scorecard reps 1.16 → 7.23 → 17.1 s with unchanged work,
      // the driver-local union-find inside it degrading 18 → 715 ms).
      // The brief sleep gives the async cleaner thread a window to drain
      // the reference queue before the next rep starts writing.
      // SPARK_GRAFT_BENCH_GC=0 disables (for A/B-ing the mechanism).
      if (gcEachReset) { System.gc(); Thread.sleep(100) }
    } catch { case e: Throwable => System.err.println(s"[bench] reset: $e") }
  }

  private val gcEachReset: Boolean =
    !sys.env.get("SPARK_GRAFT_BENCH_GC").map(_.trim).contains("0")

  /** Cumulative stop-the-world GC millis of this JVM (all collectors). */
  private def gcMillis(): Long = {
    var s = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach(b => s += math.max(0L, b.getCollectionTime))
    s
  }

  /** Bytes currently held by Spark block-manager directories (shuffle
    * .data/.index files + spilled blocks) under java.io.tmpdir — the
    * on-disk residue ContextCleaner is responsible for reaping. Sampled
    * per rep so the artifact can correlate inflated reps with disk
    * accretion (r9 "What's wrong #3" forensics). */
  private def blockMgrDiskBytes(): Long = {
    def size(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foldLeft(0L)((a, c) => a + size(c))
    try {
      val tmp = new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
        .foldLeft(0L)((a, d) => a + size(d))
    } catch { case _: Throwable => -1L }
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
      graft.queries.IndexState.bm25BasePaths(spark, sfDir)
      graft.queries.IndexState.bm25FullPaths(spark, sfDir)
      graft.queries.IndexState.nbModelPaths(spark, sfDir)
      graft.queries.IndexState.contamIndexPaths(spark, sfDir)
      graft.queries.IndexState.contamEvalIndexPaths(spark, sfDir)
      graft.queries.IndexState.bm25ForwardPaths(spark, sfDir)
      graft.queries.IndexState.denseStorePaths(spark, sfDir)
      graft.queries.IndexState.pqCodesPaths(spark, sfDir)
      graft.queries.IndexState.pqCellCodesPaths(spark, sfDir)
      graft.queries.IndexState.bm25ImpactPaths(spark, sfDir)
      graft.queries.IndexState.bm25ImpactRankedPaths(spark, sfDir)
      graft.queries.IndexState.rrfBruteFusedPaths(spark, sfDir)
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
    // AUDIT-TWIN CADENCE (r13 verdict #6): rrf_overlap_pq exists only to
    // audit the PERSISTED brute-fusion baseline against the PQ serving
    // stack — it is the widest plan in the suite BY CONSTRUCTION (both
    // fusion stacks under one shared rank) and its verdict cannot change
    // unless the persisted state it audits changes. So it re-times only
    // when the fingerprint-keyed state root moved (corpus regenerated)
    // or GRAFT_AUDIT_FORCE=1; otherwise the previous BENCH_LAST value is
    // carried forward and the line marks it in "audit_cached". Its
    // CORRECTNESS row is untouched — Verify still runs it every round;
    // only the redundant re-TIMING is tiered. r15 (r14 verdict #6):
    // the persist twin joins the tier — it audits the SAME stored
    // brute-fusion baseline (suite cost #3 at 3.49 s) and its verdict
    // is equally pinned to the state fingerprint; both audit rows now
    // re-time only when the state root moves. The per-round
    // serving-path gate rows remain the live hybrid_rrf_pq family.
    val auditTwins = Set("rrf_overlap_pq", "rrf_overlap_pq_persist")
    val stateToken = graft.queries.ClusterState.stateRootToken(sfDir)
    // r17 (r16 verdict #2): the carried-forward timing was keyed ONLY on
    // the persisted-state root, so an optimization changing the SERVING
    // stack under an unchanged state root (exactly what r16's exactRerank
    // narrowing did) would silently reuse a stale number. The stamp now
    // also carries the query's canonicalized-plan semantic hash: any plan
    // change — code or state — forces a re-time. Building the plan runs
    // query CONSTRUCTION (bounded codebook fits), not the timed reps the
    // tier exists to skip. A legacy state-token-only stamp never matches
    // the extended format, so the first r17 bench re-times both twins
    // (the verdict's requested one-shot refresh) without needing
    // GRAFT_AUDIT_FORCE.
    // md5 of the canonicalized plan TEXT, not semanticHash(): the text is
    // deterministic across JVMs (exprIds normalized, state paths literal),
    // while semanticHash may fold in process-local object hashes — a
    // nondeterministic key would force a spurious re-time every run
    def planHash(name: String): String =
      try {
        val txt = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.optimizedPlan.canonicalized.toString
        java.security.MessageDigest.getInstance("MD5")
          .digest(txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(b => f"$b%02x").mkString
      } catch { case e: Throwable =>
        System.err.println(s"[bench] audit plan hash $name: $e"); "plan_err"
      }
    val stampNow: Map[String, String] =
      auditTwins.map(t => t -> s"$stateToken|${planHash(t)}").toMap
    def readIfExists(p: String): Option[String] =
      try {
        val f = java.nio.file.Paths.get(p)
        if (java.nio.file.Files.isRegularFile(f))
          Some(new String(java.nio.file.Files.readAllBytes(f),
            java.nio.charset.StandardCharsets.UTF_8))
        else None
      } catch { case _: Throwable => None }
    val stampOf: Map[String, String] = readIfExists("AUDIT_STAMP.json")
      .map(_.linesIterator.flatMap { l =>
        l.split("\t", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
      }.toMap).getOrElse(Map.empty)
    val lastVal: Map[String, Double] = readIfExists("BENCH_LAST.json")
      .map { s =>
        auditTwins.flatMap { t =>
          ("\"" + java.util.regex.Pattern.quote(t) + "\":([0-9.]+)").r
            .findFirstMatchIn(s).map(m => t -> m.group(1).toDouble)
        }.toMap
      }.getOrElse(Map.empty)
    val auditForce = sys.env.get("GRAFT_AUDIT_FORCE").map(_.trim).contains("1")
    val auditCached: Map[String, Double] = auditTwins.flatMap { t =>
      if (!auditForce && stampOf.get(t).contains(stampNow(t)))
        lastVal.get(t).filter(_ >= 0).map(t -> _)
      else None
    }.toMap
    val allRuns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => auditCached.contains(q._1)).map { case (name, fn) =>
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
        val gc0 = gcMillis()
        val t0 = System.nanoTime()
        val startOff = (t0 - benchT0) / 1e9
        // noop sink forces full materialization of every output column —
        // count() would let Catalyst prune the computed columns away.
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); false }
        val sec = (System.nanoTime() - t0) / 1e9
        // per-rep forensics (r9 "What's wrong #3"): GC millis spent INSIDE
        // the rep and block-manager disk bytes at rep end — distinguishes
        // heap/GC pressure from shuffle-file accretion when reps escalate
        val gcMs = gcMillis() - gc0
        val diskB = blockMgrDiskBytes()
        graft.ops.ClusterOps.CcStats.drain().foreach(r => ccRounds += ((name, rep, r)))
        // a crashed run must be distinguishable from a fast success:
        // elapsed-until-failure rides along negated
        (if (ok) sec else -sec, startOff, gcMs, diskB)
      }
      name -> times
    }
    // a query is failed if ANY rep crashed; otherwise score the median rep
    val results = allRuns.map { case (name, times) =>
      val secs = times.map(_._1)
      name -> secs.find(_ < 0).getOrElse(secs.sorted.apply(secs.length / 2))
    }.toMap ++ auditCached
    // stamp the state token for every audit twin now in sync (just timed,
    // or carried forward against an unchanged root)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("AUDIT_STAMP.json"),
      auditTwins.toSeq.sorted.map(t => s"$t\t${stampNow(t)}\n").mkString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] stamp: $e") }
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
    val cachedJson = auditCached.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,"warmups":$warmups,"queries":$qs,"failed":$failedJson,"audit_cached":$cachedJson,"sf":"$sfDir"}"""
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
          .mkString("\"starts\":{", ",", "},") +
        // per-rep stop-the-world GC millis inside each rep + block-manager
        // disk megabytes at rep end (r9 escalating-rep forensics: is an
        // inflated rep paying GC, reading past residue, or neither?)
        allRuns.sortBy(_._1)
          .map { case (k, ts) => "\"" + k + "\":" + ts.map(_._3.toString).mkString("[", ",", "]") }
          .mkString("\"gc_ms\":{", ",", "},") +
        allRuns.sortBy(_._1)
          .map { case (k, ts) => "\"" + k + "\":" +
            // -1 = sampling failed; keep the sentinel instead of
            // truncating it into a plausible-looking 0 MB
            ts.map(t => (if (t._4 < 0) -1L else t._4 / (1024 * 1024)).toString)
              .mkString("[", ",", "]") }
          .mkString("\"disk_mb\":{", ",", "}}\n")
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
