package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Relational core over the TPC-H-ish star schema: scan → filter → join →
 * aggregate → rank, the batch backbone the reference lacks entirely (its
 * only join surface is keyed co-process / interval join, SURVEY.md §2.7) but
 * that a 100 TB engine needs.
 *
 * Float-sum determinism: money columns are exact 2-decimal values stored as
 * doubles, so every aggregate works in exact DECIMAL arithmetic — cast the
 * inputs to DECIMAL(_,2) per row (unambiguous: the doubles sit at most an
 * ulp from the 2-decimal value), multiply exactly, then scale each per-row
 * term to an integer minor unit (cents / 1e-4 / 1e-6) and SUM as BIGINT.
 * Final money outputs are therefore plain BIGINT: rounds 1-2 showed the
 * external hash gate diverging on DECIMAL outputs that local bit-exact
 * comparison (tools/check.py, DuckDB logical values + types) could not
 * reproduce — int64 is the one encoding every reader canonicalizes the
 * same way. Derived averages divide the exact integer sum in IEEE double
 * with an identical op order in both engines (single rounding per step).
 * BIGINT holds minor-unit sums up to ~9.2e18 — far beyond bench scale; a
 * 100 TB deployment summing past that should emit DECIMAL(38,s) instead
 * and accept an engine-specific encoding (the per-row arithmetic is
 * unchanged).
 *
 * Scale notes: dimension tables (region/nation/supplier/customer) are
 * broadcast — no shuffle on the fact side for those joins; the only big
 * exchanges are lineitem⋈orders (on the order key) and the final
 * aggregation, both AQE-managed. Filters on scan columns push down to
 * parquet (verified via explain: PushedFilters on l_shipdate/o_orderdate).
 */
object RelationalQueries {

  /** Exact per-row revenue term in decimal: price × (1 − discount),
    * scale 4, precision ≤ 18 — exact in both Spark and DuckDB. */
  private val revenueTerm =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val chargeTerm =
    s"($revenueTerm) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"

  /** TPC-H Q1-style pricing summary over lineitem. */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))").as("sum_qty_x100"),
        expr("SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))").as("sum_base_price_cents"),
        expr(s"SUM(CAST(($revenueTerm) * 10000 AS BIGINT))").as("sum_disc_price_e4"),
        expr(s"SUM(CAST(($chargeTerm) * 1000000 AS BIGINT))").as("sum_charge_e6"),
        // hundredths sums stay < 2^53, so int→double is exact and each
        // division is a single correctly-rounded IEEE op in both engines.
        expr("CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*)").as("avg_qty"),
        count(lit(1)).as("cnt"))

  /** TPC-H Q3-style: top-10 revenue orders for one market segment. */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      // o_orderdate is TIMESTAMP_NTZ; NTZ→LTZ under the UTC session then →
      // epoch seconds, matching DuckDB's naive epoch_us().
      .withColumn("order_date", col("o_orderdate").cast("timestamp").cast("long"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("order_date"), col("o_orderpriority"))
      .agg(expr(s"SUM(CAST(($revenueTerm) * 10000 AS BIGINT))").as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "order_date", "o_orderpriority", "revenue_e4")
  }

  /** TPC-H Q6-style: pure filter-and-sum over lineitem — the pushdown
    * showcase (every predicate reaches the parquet scan). */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(expr(
        "SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2)) * 10000 AS BIGINT))")
        .as("revenue_e4"))

  /** Revenue by (nation, order year) with ROLLUP subtotals — grouping-set
    * aggregation the reference lacks entirely.
    *
    * Two-phase: aggregate at the FINEST grouping first (one pass over
    * lineitem computing the exact decimal term once per row), then
    * rollup over the |nations|×|years|-row frame. Rollup directly over
    * the join would Expand every lineitem row ×3 grouping sets — the
    * per-row exact-decimal multiply evaluated three times and 3× rows
    * through the partial aggregate. Sound because the quantized SUM is
    * exact-integer reassociative (sums of sums). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .groupBy(col("n_name"), col("order_year"))
      .agg(expr(s"SUM(CAST(($revenueTerm) * 10000 AS BIGINT))").as("rev_fine"))
      .rollup(col("n_name"), col("order_year"))
      .agg(sum(col("rev_fine")).as("revenue_e4"))
      // sentinel-fill the subtotal NULLs: engine-agnostic compares (and many
      // downstream consumers) choke on mixed null/typed grouping columns
      .select(coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("order_year"), lit(-1L)).as("order_year"), col("revenue_e4"))

  /** Order totals by (market segment, year) with CUBE — all four grouping
    * sets, sentinel-filled like rollup_revenue. */
  def cubeSales(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .withColumn("order_year", year(col("o_orderdate")).cast("long"))
      .cube(col("c_mktsegment"), col("order_year"))
      .agg(expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))").as("sales_cents"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("order_year"), lit(-1L)).as("order_year"),
        col("sales_cents"), col("n_orders"))

  /** Q18-style big spenders: customers with ≥ 15 orders and their exact
    * decimal total (HAVING over a join aggregation). */
  def bigSpenders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))").as("total_spent_cents"))
      .filter(col("n_orders") >= 15)

  /** Customers with no orders in 2001 (time-scoped NOT EXISTS → anti join
    * against the filtered orders side). */
  def inactiveCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** Each customer's maximum-value order(s) — the correlated-scalar-subquery
    * shape, planned as a window max + filter (one shuffle, no re-scan). */
  def maxOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("mx", max(col("o_totalprice")).over(w))
      .filter(col("o_totalprice") === col("mx"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** RFM customer segmentation — the classic commerce cohorting
    * (recency / frequency / monetary quartiles): per customer the days
    * since their last order (anchored at the corpus-wide max order date —
    * a frozen snapshot date, not wall clock), order count, and the exact
    * cent total (the [[bigSpenders]] DECIMAL→BIGINT idiom). Quartile
    * scores via ntile(4) with customer-key tie-breaks so both engines
    * bucket identically (recency ordered DESC — most recent earns 4);
    * the 'r-f-m' segment label is what a marketing pipeline joins
    * campaigns against. One orders-keyed aggregation + three window
    * ntiles over the |customers|-row frame + a 1-row anchor broadcast.
    *
    * Scale note: the fact-sized work (the orders scan + aggregation) is
    * fully distributed; the unpartitioned ntile sorts run over the
    * DIMENSION-sized per-customer frame (4 narrow columns). Beyond
    * ~1e8 customers that single-task sort needs the standard two-pass
    * distributed ranking (range-partitioned sort + per-partition offset)
    * or approx-percentile cutoffs — the exact ntile is kept here because
    * the oracle contract demands deterministic equal-fill buckets. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val anchor = ord.agg(max(col("o_orderdate")).as("anchor"))
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        expr("SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))")
          .as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .selectExpr("o_custkey",
        "CAST(datediff(anchor, last_order) AS BIGINT) AS recency_days",
        "frequency", "monetary_cents")
    perCust
      .withColumn("r", ntile(4).over(
        Window.orderBy(col("recency_days").desc, col("o_custkey").asc)).cast("long"))
      .withColumn("f", ntile(4).over(
        Window.orderBy(col("frequency").asc, col("o_custkey").asc)).cast("long"))
      .withColumn("m", ntile(4).over(
        Window.orderBy(col("monetary_cents").asc, col("o_custkey").asc)).cast("long"))
      .selectExpr("o_custkey", "recency_days", "frequency", "monetary_cents",
        "r", "f", "m",
        "concat(CAST(r AS STRING), '-', CAST(f AS STRING), '-', CAST(m AS STRING)) AS segment")
  }

  /** TPC-H Q5-style: revenue per nation for one region/year, customer and
    * supplier in the same nation. All dims broadcast. */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).withColumnRenamed("c_nationkey", "cn_key")
    val sup = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") && col("cn_key") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(expr(s"SUM(CAST(($revenueTerm) * 10000 AS BIGINT))").as("revenue_e4"))
  }
}

object RelationalOracles {
  private val revenueTerm =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
  private val chargeTerm =
    s"($revenueTerm) * (CAST(1.0 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"

  val q1Pricing: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_x100,
       |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       |  CAST(SUM(CAST(($revenueTerm) * 10000 AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
       |  CAST(SUM(CAST(($chargeTerm) * 1000000 AS BIGINT)) AS BIGINT) AS sum_charge_e6,
       |  CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
       |  count(*) AS cnt
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  val q3TopOrders: String =
    s"""SELECT o_orderkey, (epoch_us(o_orderdate) // 1000000) AS order_date, o_orderpriority,
       |  CAST(SUM(CAST(($revenueTerm) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1999-01-01'
       |  AND l_shipdate > TIMESTAMP '1999-01-01'
       |GROUP BY o_orderkey, order_date, o_orderpriority
       |ORDER BY revenue_e4 DESC, o_orderkey ASC
       |LIMIT 10""".stripMargin

  val q5NationRevenue: String =
    s"""SELECT n_name,
       |  CAST(SUM(CAST(($revenueTerm) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name""".stripMargin

  val q6Forecast: String =
    """SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2)) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  val rollupRevenue: String =
    s"""SELECT coalesce(n_name, 'ALL') AS n_name,
       |  coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS order_year,
       |  CAST(SUM(CAST(($revenueTerm) * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY ROLLUP(n_name, CAST(year(o_orderdate) AS BIGINT))""".stripMargin

  val bigSpenders: String =
    """SELECT c_custkey, c_name, count(*) AS n_orders,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS total_spent_cents
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |HAVING count(*) >= 15""".stripMargin

  val inactiveCustomers: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |  AND o.o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin

  val maxOrderPerCustomer: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_totalprice = (
      |  SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  val cubeSales: String =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
      |  coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS order_year,
      |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sales_cents,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY CUBE(c_mktsegment, CAST(year(o_orderdate) AS BIGINT))""".stripMargin

  /** [[RelationalQueries.rfmSegments]] restatement: same anchor, same
    * exact cent totals, same ntile(4) windows with customer-key
    * tie-breaks (both engines implement standard SQL NTILE, so equal
    * bucket fill + a total order ⇒ identical scores). */
  val rfmSegments: String =
    """WITH a AS (SELECT max(o_orderdate) AS anchor FROM orders),
      |pc AS (SELECT o_custkey, max(o_orderdate) AS last_order,
      |         CAST(count(*) AS BIGINT) AS frequency,
      |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS monetary_cents
      |       FROM orders GROUP BY 1),
      |rr AS (SELECT o_custkey,
      |         CAST(date_diff('day', last_order, anchor) AS BIGINT) AS recency_days,
      |         frequency, monetary_cents
      |       FROM pc CROSS JOIN a),
      |q AS (SELECT *,
      |        CAST(ntile(4) OVER (ORDER BY recency_days DESC, o_custkey ASC) AS BIGINT) AS r,
      |        CAST(ntile(4) OVER (ORDER BY frequency ASC, o_custkey ASC) AS BIGINT) AS f,
      |        CAST(ntile(4) OVER (ORDER BY monetary_cents ASC, o_custkey ASC) AS BIGINT) AS m
      |      FROM rr)
      |SELECT o_custkey, recency_days, frequency, monetary_cents, r, f, m,
      |  CAST(r AS VARCHAR) || '-' || CAST(f AS VARCHAR) || '-' || CAST(m AS VARCHAR) AS segment
      |FROM q""".stripMargin

  val all: Map[String, String] = Map(
    "cube_sales"         -> cubeSales,
    "big_spenders"       -> bigSpenders,
    "inactive_customers" -> inactiveCustomers,
    "max_order_per_cust" -> maxOrderPerCustomer,
    "q1_pricing"        -> q1Pricing,
    "q3_top_orders"     -> q3TopOrders,
    "q5_nation_revenue" -> q5NationRevenue,
    "q6_forecast"       -> q6Forecast,
    "rfm_segments"      -> rfmSegments,
    "rollup_revenue"    -> rollupRevenue,
  )
}
