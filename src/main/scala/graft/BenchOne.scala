package graft

import org.apache.spark.sql.SparkSession

/**
 * Single-query timing probe: `runMain graft.BenchOne q1 [q2 ...]` times just
 * the named [[SparkEntry.queries]] entries under the exact Bench protocol
 * (same session config, same state reset, same noop sink, per-query untimed
 * warmup) and prints per-rep seconds plus the formatted physical plan on
 * request (`SPARK_GRAFT_EXPLAIN=1`).
 *
 * Exists for regression forensics: when a driver-side BENCH_r{N} row moves
 * with no code change on its path (r8: hot_items_topn 0.32→2.43 s), the
 * builder needs same-protocol local reps and a plan snapshot to tell
 * environment noise from a real plan change without paying a full 100-query
 * bench run per hypothesis.
 */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default matches Bench's — a forensics probe at a DIFFERENT
    // parallelism than the row it investigates would misattribute plan
    // effects to the environment (the driver exports 32 for gate runs;
    // export the same when reproducing a gate row)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = scala.util.Try(sys.env("SPARK_GRAFT_BENCH_REPS").trim.toInt)
      .getOrElse(3).max(1)
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val spark = GraftSession.builder("graft-bench-one", cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(16).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench-one] warmup: $e") }
    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs.getOrElse(name, sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      if (explain) { println(s"== $name plan =="); df.explain("formatted") }
      // untimed warmup, then timed reps — mirrors Bench's median protocol
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench-one] $name warmup: $e") }
      graft.ops.ClusterOps.CcStats.drain()
      val times = (0 until reps).map { rep =>
        Bench.resetState(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.ClusterOps.CcStats.drain().foreach(r =>
          println(f"  [cc] $name rep=$rep ${r.variant} rounds=${r.rounds} total_ms=${r.totalMillis} round_ms=${r.roundMillis.mkString(",")}"))
        sec
      }
      println(f"$name%-28s reps=${times.map(t => f"$t%.3f").mkString("[", ", ", "]")} median=${times.sorted.apply(times.length / 2)}%.3f")
    }
    spark.stop()
  }
}
