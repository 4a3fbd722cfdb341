package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.sources.EventSources

/** Fixed-schema CSV sources, apache-log parse, rate-source twin, tagged
  * splitter sink, and the SparkSessionExtensions function injection. */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-schema CSV source parses reference-shaped rows") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "UserBehavior.csv")
    val w = new java.io.PrintWriter(f)
    w.println("543462,1715136,4756105,pv,1511658000")
    w.println("662867,2244074,1575622,buy,1511658060")
    w.println("malformed,row,,,")
    w.close()
    val df = EventSources.readCsv(spark, f.getAbsolutePath,
      EventSources.userBehaviorSchema)
    assert(df.count() == 3)
    val good = df.filter(col("userId").isNotNull)
    assert(good.count() == 2)
    assert(good.filter(col("behavior") === "pv").select("itemId")
      .as[Long].head() == 1715136L)
    // event-time column derived from epoch seconds
    assert(good.select(col("ts").cast("long")).as[Long].collect().toSet ==
      Set(1511658000L, 1511658060L))
  }

  test("FAILFAST csv mode rejects malformed rows (reference throw-parity)") {
    val dir = Files.createTempDirectory("graft_csv_strict").toFile
    val f = new java.io.File(dir, "bad.csv")
    val w = new java.io.PrintWriter(f)
    w.println("543462,1715136,4756105,pv,1511658000")
    w.println("not,a,number,row,xxx")
    w.close()
    val strict = EventSources.readCsv(spark, f.getAbsolutePath,
      EventSources.userBehaviorSchema, strict = true)
    intercept[org.apache.spark.SparkException] {
      strict.collect()
    }
  }

  test("apache log parse extracts ip/ts/method/url") {
    val lines = Seq(
      "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /presentations/logstash-monitorama-2013/images/kibana-search.png",
      "83.149.9.216 - - 17/05/2015:10:05:43 +0000 POST /api/submit").toDF("value")
    val parsed = EventSources.parseApacheLog(lines)
    val rows = parsed.select("ip", "method", "url").as[(String, String, String)]
      .collect().toSet
    assert(rows == Set(
      ("83.149.9.216", "GET", "/presentations/logstash-monitorama-2013/images/kibana-search.png"),
      ("83.149.9.216", "POST", "/api/submit")))
    assert(parsed.select(col("ts").cast("long")).as[Long].head() == 1431857103L)
  }

  test("tagged-union splitter routes each tag to its own sink") {
    case object Collector {
      val seen = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    }
    val input = MemoryStream[(String, Long)](21, spark, None)
    val q = Sinks.splitByTag(input.toDF().toDF("tag", "v"), "tag",
      Map(
        "a" -> ((df: org.apache.spark.sql.DataFrame) =>
          Collector.seen.synchronized { Collector.seen("a") += df.count() }),
        "b" -> ((df: org.apache.spark.sql.DataFrame) =>
          Collector.seen.synchronized { Collector.seen("b") += df.count() })),
      otherwise = Some(df =>
        Collector.seen.synchronized { Collector.seen("other") += df.count() }))
      .start()
    try {
      input.addData(Seq(("a", 1L), ("a", 2L), ("b", 3L), ("c", 4L), ("c", 5L), ("c", 6L)))
      q.processAllAvailable()
      assert(Collector.seen("a") == 2 && Collector.seen("b") == 1 &&
        Collector.seen("other") == 3)
    } finally q.stop()
  }

  test("kafka source contract: consumer config and wire-schema projection") {
    // reference consumer config (HotItem.java:46-54) → reader options
    val opts = EventSources.kafkaOptions("localhost:9092", "hotitems",
      Map("startingOffsets" -> "earliest"))
    assert(opts("kafka.bootstrap.servers") == "localhost:9092")
    assert(opts("subscribe") == "hotitems")
    assert(opts("startingOffsets") == "earliest")
    // caller options may not clobber the topic/brokers they passed explicitly
    assert(EventSources.kafkaOptions("b", "t", Map("subscribe" -> "other"))("subscribe") == "other")

    // the projection applied to the kafka wire schema (binary key/value +
    // topic/partition/offset/timestamp) yields (value: string, ts: timestamp)
    val wire = Seq((
        "k1".getBytes("UTF-8"), "hello,1,pv".getBytes("UTF-8"), "hotitems",
        0, 42L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 0))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val out = wire.selectExpr(EventSources.kafkaProjection: _*)
    assert(out.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("value", "string"), ("ts", "timestamp")))
    assert(out.select("value").as[String].head() == "hello,1,pv")
  }

  test("kafka sink contract: producer config and wire-schema projection") {
    val opts = graft.sinks.Sinks.kafkaSinkOptions("localhost:9092", "alerts",
      Map("kafka.compression.type" -> "lz4"))
    assert(opts("kafka.bootstrap.servers") == "localhost:9092")
    assert(opts("topic") == "alerts")
    assert(opts("kafka.compression.type") == "lz4")
    // the producer projection must yield exactly the sink's wire schema:
    // key/value as STRING (broker serializes to bytes)
    val out = Seq((7L, "warn", 3L)).toDF("user_id", "level", "cnt")
      .selectExpr(graft.sinks.Sinks.kafkaWireProjection(
        "user_id", "concat(level, ':', cnt)"): _*)
    assert(out.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "string"), ("value", "string")))
    assert(out.as[(String, String)].head() == (("7", "warn:3")))
  }

  test("GraftExtensions injects custom functions into a fresh session") {
    spark // materialize the suite session (and its SparkContext) first
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext but builds NEW session state, so
      // withExtensions actually applies
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s2.sql(
        "SELECT exact_distinct(c) AS d, rolling_min5('hello world') AS h, " +
          "size(winnow_fps('the quick brown fox jumps', 5)) AS w " +
          "FROM VALUES (1L),(2L),(2L) t(c)")
        .collect().head
      assert(row.getLong(0) == 2L)
      assert(row.getLong(1) > 0L)
      assert(row.getInt(2) > 0)
    } finally {
      prev.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
  test("events reader lands on the true microsecond timeline for any ts encoding") {
    // The driver's generator changed the events ts encoding between rounds
    // (INT64 raw nanos -> TIMESTAMP(MICROS) NTZ). The probe in
    // Tables.eventsTsType must land either encoding on the same real
    // timeline the DuckDB oracle sees via epoch_us: TimestampType out, and
    // an epoch in a sane year (the old div-by-1000 on microsecond data
    // compressed 2024 timestamps into 1970 and silently emptied every
    // watermark-closed streaming window).
    val ev = graft.sources.Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val (lo, hi) = ev.agg(min(col("ts").cast("long")), max(col("ts").cast("long")))
      .as[(Long, Long)].head()
    val y2000 = 946684800L
    assert(lo > y2000, s"min ts $lo predates 2000 - ts encoding misread (1970 = compressed timeline)")
    assert(hi - lo > 3600L, s"event-time span ${hi - lo}s under an hour - windowed/watermark queries would be degenerate")
  }
}
