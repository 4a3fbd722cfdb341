package graft

/** Executed-plan forensics: `runMain graft.ExecPlan <query> [sfDir]` runs
  * one [[SparkEntry.queries]] entry and prints its FINAL adaptive plan —
  * the only place AQE decisions (ReusedExchange/stage reuse, coalesced
  * shuffle reads, broadcast demotions) are visible; [[BenchOne]]'s
  * `explain` shows the pre-execution plan, which cannot confirm them.
  * Found the dsir_weights exchange-reuse question in r9: the static plan
  * shows two copies of the corpus explode subtree, the executed plan shows
  * one materialization + a ReusedExchange. Full plan text lands in
  * /tmp/exec_plan.txt for diffing. */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-exec-plan", 32)
      .master("local[32]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    println("SCANS=" + "Scan parquet".r.findAllIn(p).size +
      " REUSEDEXCH=" + "ReusedExchange".r.findAllIn(p).size +
      " EXCH=" + "(?<!Reused)Exchange".r.findAllIn(p).size)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/exec_plan.txt"), p)
  }
}
