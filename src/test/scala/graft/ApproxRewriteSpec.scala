package graft

import org.apache.spark.sql.SparkSession

/** The config-gated optimizer rule: COUNT(DISTINCT) → HyperLogLog++ when
  * spark.graft.approxDistinct=true, untouched otherwise. */
class ApproxRewriteSpec extends SparkSpec {

  private def freshSession(): SparkSession = {
    spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate()
  }

  private def restore(): Unit = {
    SparkSession.setActiveSession(spark)
    SparkSession.setDefaultSession(spark)
  }

  test("rule rewrites exact distinct to HLL only under the flag") {
    val s = freshSession()
    try {
      val q = "SELECT count(DISTINCT user_id) AS uv FROM ev"
      graft.sources.Tables.events(s, sf0001).createOrReplaceTempView("ev")

      s.conf.set("spark.graft.approxDistinct", "false")
      val exactPlan = s.sql(q).queryExecution.optimizedPlan.toString
      assert(!exactPlan.contains("approx_count_distinct"))
      val exact = s.sql(q).collect().head.getLong(0)

      s.conf.set("spark.graft.approxDistinct", "true")
      val approxPlan = s.sql(q).queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("approx_count_distinct"), approxPlan)
      val approx = s.sql(q).collect().head.getLong(0)
      // HLL++ is exact in sparse mode at this cardinality (<200 users)
      assert(approx == exact)
    } finally {
      s.conf.set("spark.graft.approxDistinct", "false")
      restore()
    }
  }
}
