package graft

import org.apache.spark.sql.functions._

import graft.ops.SkewOps

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase count equals plain groupBy count") {
    val df = (0 until 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 97}", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedCount(df, 8, col("k"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salted two-phase sum equals plain groupBy sum") {
    val df = (0 until 5000).map(i => (s"k${i % 13}", i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v")).as[(String, Long)].collect().toMap
    val salted = SkewOps.saltedSum(df, col("v"), 4, col("k"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("itemPairs basket-skew guard fails fast on an oversized basket") {
    // at sf0.001 every user's distinct-item basket exceeds 1, so a cap of
    // 1 must detonate the guard, and the error must carry the remediation
    val e = intercept[Exception] {
      graft.queries.BehaviorQueries
        .itemPairs(spark, sf0001, maxItemsPerUser = 1L)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxItemsPerUser")), messages(e).mkString(" | "))
  }

  test("itemPairs result is identical under a passing guard cap") {
    val loose = graft.queries.BehaviorQueries.itemPairs(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val tight = graft.queries.BehaviorQueries
      .itemPairs(spark, sf0001, maxItemsPerUser = 100000L)
      .collect().map(_.toSeq).toSet
    assert(loose == tight && loose.nonEmpty)
  }
}
