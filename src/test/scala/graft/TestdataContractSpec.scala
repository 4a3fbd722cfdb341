package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The driver regenerates /root/testdata each round, and its generator has
  * already changed an encoding silently once (events ts: raw INT64 nanos →
  * TIMESTAMP(MICROS), round 8 — which quietly emptied every watermark
  * window until diagnosed). This spec pins the parts of the testdata
  * contract every query family leans on, so the NEXT generator change
  * fails loudly with a named invariant instead of surfacing as downstream
  * oracle drift. Deliberately tolerant of representation detail (no exact
  * Spark type equality where both encodings are handled); strict on column
  * names, key uniqueness, and the shapes the operators assume. */
class TestdataContractSpec extends SparkSpec {
  import spark.implicits._

  private def cols(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.schema.map(_.name).toSet

  test("TPC-H-ish tables carry the expected columns and are non-empty") {
    val expected = Map(
      "region" -> Set("r_regionkey", "r_name"),
      "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate"))
    val readers = Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      "region" -> (Tables.region _), "nation" -> (Tables.nation _),
      "customer" -> (Tables.customer _), "supplier" -> (Tables.supplier _),
      "part" -> (Tables.part _), "orders" -> (Tables.orders _),
      "lineitem" -> (Tables.lineitem _))
    expected.foreach { case (name, want) =>
      val df = readers(name)(spark, sf0001)
      assert(cols(df) == want, s"$name columns drifted: ${cols(df)}")
      assert(df.limit(1).count() == 1, s"$name is empty")
    }
  }

  test("documents: unique non-null doc ids, non-null text, declared metadata") {
    val d = Tables.documents(spark, sf0001)
    assert(cols(d) == Set("doc_id", "text", "lang", "source", "n_chars"),
      s"documents columns drifted: ${cols(d)}")
    val (n, nd, nullText) = d.agg(count(lit(1)), countDistinct(col("doc_id")),
      count(when(col("text").isNull || col("doc_id").isNull, 1)))
      .as[(Long, Long, Long)].head()
    assert(n > 0 && n == nd, s"doc_id not unique: $n rows, $nd distinct")
    assert(nullText == 0, "null doc_id/text would silently vanish from dedup joins")
  }

  test("embeddings: unique vec ids and one uniform vector dimension") {
    val e = Tables.embeddings(spark, sf0001)
    assert(cols(e) == Set("vec_id", "embedding", "label"),
      s"embeddings columns drifted: ${cols(e)}")
    val dims = e.select(size(col("embedding")).as("d")).distinct()
      .as[Int].collect().toSet
    assert(dims.size == 1 && dims.head > 0,
      s"ANN/PQ assume one fixed dim; got $dims")
    val (n, nd) = e.agg(count(lit(1)), countDistinct(col("vec_id")))
      .as[(Long, Long)].head()
    assert(n > 0 && n == nd, s"vec_id not unique: $n rows, $nd distinct")
  }

  test("orders/lineitem join keys are never null") {
    val badO = Tables.orders(spark, sf0001).filter(col("o_orderkey").isNull).count()
    val badL = Tables.lineitem(spark, sf0001).filter(col("l_orderkey").isNull).count()
    assert(badO == 0 && badL == 0,
      "null join keys drop rows from inner joins without any error")
  }
}
