package graft

/** Plan-artifact dumper for the optimization rounds:
  * `runMain graft.PlanDump <outDir> <suffix> <query> [query ...]`
  * writes `<outDir>/<query>_<suffix>.txt` with the FORMATTED physical plan
  * of each named [[SparkEntry.queries]] entry (the `explain("formatted")`
  * text the round deliverables require), under the same session geometry
  * as the gate bench (local[32], shuffle partitions = 32). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-plan-dump", cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        val scans = "Scan parquet".r.findAllIn(txt).size
        val exch = "\\bExchange\\b".r.findAllIn(txt).size
        val bjoin = "BroadcastHashJoin".r.findAllIn(txt).size
        val smj = "SortMergeJoin".r.findAllIn(txt).size
        println(s"[plandump] $name scans=$scans exchanges=$exch bhj=$bjoin smj=$smj")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: $e")
      }
    }
    spark.stop()
  }
}
