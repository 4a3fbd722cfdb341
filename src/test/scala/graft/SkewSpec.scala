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
}
