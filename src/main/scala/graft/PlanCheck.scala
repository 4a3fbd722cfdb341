package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the scale-critical queries so the
  * shuffle/broadcast/pushdown shape can be reviewed (SURVEY.md §7.4-7). */
object PlanCheck {
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
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      println(s"\n========== $name ==========")
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
