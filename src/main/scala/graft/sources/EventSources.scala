package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The reference's source surface (SURVEY.md §2.1) re-expressed:
 *
 *  - S1 text/CSV file sources with fixed, hand-declared schemas (never
 *    inferred — a malformed row yields nulls under PERMISSIVE mode rather
 *    than the reference's NumberFormatException, or fails fast with
 *    mode=FAILFAST for strict parity);
 *  - P1/P3 split-and-box CSV parses → `spark.read.schema(...).csv`;
 *  - P2 apache.log parse → split + to_timestamp;
 *  - S2 Kafka source → readStream builder (broker config is deploy-time);
 *  - S3 simulated random source → deterministic `rate` source transform.
 *
 * Batch and streaming readers share each schema: `readCsv` for replay /
 * backfill, `streamCsv` for directory-watching streams.
 */
object EventSources {

  /** UserBehavior.csv: userId,itemId,categoryId,behavior,timestamp(s)
    * (reference: hot-items-analysis/.../beans/UserBehavior.java:11-15,
    * parse at HotItem.java:57-61). */
  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("itemId", LongType),
    StructField("categoryId", IntegerType), StructField("behavior", StringType),
    StructField("timestamp", LongType)))

  /** AdClickLog.csv: userId,adId,province,city,timestamp(s)
    * (market-analysis/.../beans/AdClickEvent.java:10-14). */
  val adClickSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("adId", LongType),
    StructField("province", StringType), StructField("city", StringType),
    StructField("timestamp", LongType)))

  /** LoginLog.csv: userId,ip,loginState,timestamp(s)
    * (login-fail-detect/.../beans/LoginEvent.java:10-13). */
  val loginSchema: StructType = StructType(Seq(
    StructField("userId", LongType), StructField("ip", StringType),
    StructField("loginState", StringType), StructField("timestamp", LongType)))

  /** OrderLog.csv: orderId,eventType,txId,timestamp(s)
    * (order-pay-detect/.../beans/OrderEvent.java:10-13). */
  val orderSchema: StructType = StructType(Seq(
    StructField("orderId", LongType), StructField("eventType", StringType),
    StructField("txId", StringType), StructField("timestamp", LongType)))

  /** ReceiptLog.csv: txId,payChannel,timestamp(s)
    * (order-pay-detect/.../beans/ReceiptEvent.java:10-12). */
  val receiptSchema: StructType = StructType(Seq(
    StructField("txId", StringType), StructField("payChannel", StringType),
    StructField("timestamp", LongType)))

  /** S1 batch: fixed-schema CSV + event-time column `ts` from the epoch-
    * seconds column (timestamp_seconds = the reference's ×1000 extractor,
    * HotItem.java:62-67). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              epochCol: String = "timestamp", strict: Boolean = false): DataFrame =
    spark.read.schema(schema)
      .option("mode", if (strict) "FAILFAST" else "PERMISSIVE")
      .csv(path)
      .withColumn("ts", timestamp_seconds(col(epochCol)))

  /** S1 streaming replay: same schema over a watched directory. */
  def streamCsv(spark: SparkSession, dir: String, schema: StructType,
                epochCol: String = "timestamp"): DataFrame =
    spark.readStream.schema(schema).csv(dir)
      .withColumn("ts", timestamp_seconds(col(epochCol)))

  /** P2: apache.log lines → (ip, userId, ts, method, url). Space-split,
    * fields 0/3/5/6, event time parsed from dd/MM/yyyy:HH:mm:ss
    * (network-flow-analysis/.../HotPage.java:50-54). */
  def parseApacheLog(lines: DataFrame, lineCol: String = "value"): DataFrame =
    lines
      .withColumn("f", split(col(lineCol), " "))
      .select(
        col("f").getItem(0).as("ip"),
        lit(0L).as("userId"),
        to_timestamp(col("f").getItem(3), "dd/MM/yyyy:HH:mm:ss").as("ts"),
        col("f").getItem(5).as("method"),
        col("f").getItem(6).as("url"))

  /** The reader options `kafkaLines` passes to the kafka source — the
    * Spark restatement of the reference's consumer config
    * (HotItem.java:46-54: bootstrap.servers + topic subscribe; group id /
    * deserializers are connector-managed in Spark, auto.offset.reset maps
    * to `startingOffsets`). Factored out so the contract is unit-testable
    * without a broker. */
  def kafkaOptions(brokers: String, topic: String,
                   options: Map[String, String] = Map.empty): Map[String, String] =
    Map("kafka.bootstrap.servers" -> brokers, "subscribe" -> topic) ++ options

  /** The projection `kafkaLines` applies to the kafka wire schema (key /
    * value binary, topic, partition, offset, timestamp, timestampType):
    * UTF-8 value + broker timestamp as the event-time candidate. */
  val kafkaProjection: Seq[String] =
    Seq("CAST(value AS STRING) AS value", "timestamp AS ts")

  /** S2: Kafka topic as a string-value stream (HotItem.java:46-54 —
    * group/offset options are caller-supplied deploy config).
    *
    * Coverage limit, stated plainly: this build environment ships neither
    * the `spark-sql-kafka` connector jar nor any Kafka broker/client
    * classes, so this builder has CONTRACT-level tests only (option map +
    * wire-schema projection, SourcesSinksSpec) and has never executed a
    * live produce→consume round-trip here. On a real deployment add the
    * spark-sql-kafka-0-10 package; the code path is the standard
    * `readStream.format("kafka")` — nothing engine-specific to port. */
  def kafkaLines(spark: SparkSession, brokers: String, topic: String,
                 options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.readStream.format("kafka")
    kafkaOptions(brokers, topic, options)
      .foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
      .load()
      .selectExpr(kafkaProjection: _*)
  }

  /** The cyclic (userId, behavior, channel) mapping of the reference's
    * random marketing source, as SQL expressions over a monotone counter
    * column — shared by the streaming rate twin and the oracle-backed
    * batch query (`marketing_sim`). */
  def marketingMapping(valueCol: String): Seq[String] = {
    val behaviors = Seq("CLICK", "DOWNLOAD", "INSTALL", "UNINSTALL")
    val channels = Seq("app store", "wechat", "weibo", "browser")
    Seq(
      s"$valueCol % 1000 AS userId",
      s"element_at(array(${behaviors.map(b => s"'$b'").mkString(",")}), CAST($valueCol % 4 + 1 AS INT)) AS behavior",
      s"element_at(array(${channels.map(c => s"'$c'").mkString(",")}), CAST(($valueCol DIV 4) % 4 + 1 AS INT)) AS channel")
  }

  /** S3: deterministic twin of the reference's random marketing source
    * (AppMarketingByChannel.java:65-97): `rate` stream at `rowsPerSecond`,
    * behavior/channel drawn cyclically from the reference's fixed lists. */
  def marketingRate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
      .selectExpr(marketingMapping("value") :+ "timestamp AS ts": _*)
}
