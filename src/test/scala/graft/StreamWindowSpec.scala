package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.WindowOps
import graft.streaming.StreamOps

/** Streaming/batch prefix-consistency for the windowed-count family: the
  * streaming append-mode result after the watermark passes equals the batch
  * result over the same data (SURVEY.md §5 "streaming parity"). */
case class Ev(tsSec: Long, k: String)

class StreamWindowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sliding count equals batch over closed windows") {
    val rnd = new scala.util.Random(11)
    val evs = (0 until 500).map { _ =>
      Ev(10000L + rnd.nextInt(5000), s"k${rnd.nextInt(3)}")
    }
    val batch = WindowOps.epochWindow(
        WindowOps.slidingCount(evs.toDF().withColumn("ts", timestamp_seconds(col("tsSec"))),
          col("ts"), "10 minutes", "5 minutes", col("k")))
      .select("window_start", "window_end", "k", "cnt")
      .as[(Long, Long, String, Long)].collect().toSet

    val input = MemoryStream[Ev](10, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val counts = StreamOps.slidingCount(stream, "ts", "1 minute",
      "10 minutes", "5 minutes", col("k"))
    val q = WindowOps.epochWindow(counts)
      .select("window_start", "window_end", "k", "cnt")
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      boundedDisorder(evs, rnd, 50L)(_.tsSec)
        .foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Ev(1000000L, "sentinel")) // close every window
      q.processAllAvailable()
      val got = spark.table("win_out").as[(Long, Long, String, Long)].collect()
        .toSet.filterNot(_._3 == "sentinel")
      assert(got == batch)
    } finally q.stop()
  }

  test("update mode re-emits a window when late-but-in-watermark rows arrive") {
    // A2/T2 semantics (SURVEY §7.4-2): Flink's allowedLateness re-fire ≈
    // Spark update mode — a late row within the watermark upserts its window
    val input = MemoryStream[Ev](12, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val counts = graft.streaming.StreamOps.tumblingCount(
      stream, "ts", "10 minutes", "5 minutes", col("k"))
    val q = graft.ops.WindowOps.epochWindow(counts)
      .select("window_start", "k", "cnt")
      .writeStream.format("memory").queryName("upd_out").outputMode("update").start()
    try {
      input.addData(Ev(1000, "a"), Ev(1010, "a"))
      q.processAllAvailable()
      // late row for the same window, still within the 10 min watermark
      input.addData(Ev(1005, "a"))
      q.processAllAvailable()
      val perBatch = spark.table("upd_out").as[(Long, String, Long)].collect()
      // the window was emitted at least twice, final count visible = 3
      assert(perBatch.count(_._1 == 900L) >= 2)
      assert(perBatch.filter(_._1 == 900L).map(_._3).max == 3L)
    } finally q.stop()
  }

  test("rows later than the watermark are dropped AND counted (A2 observability)") {
    val input = MemoryStream[Ev](13, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val counts = StreamOps.tumblingCount(stream, "ts", "1 minute", "5 minutes", col("k"))
    val q = graft.ops.WindowOps.epochWindow(counts)
      .select("window_start", "k", "cnt")
      .writeStream.format("memory").queryName("late_cnt").outputMode("append").start()
    try {
      input.addData(Ev(1000, "a"))
      q.processAllAvailable()
      input.addData(Ev(100000, "a")) // watermark jumps far past the first window
      q.processAllAvailable()
      input.addData(Ev(1001, "a")) // hopelessly late → dropped, but observable
      q.processAllAvailable()
      assert(StreamOps.droppedLateRows(q) == 1L)
      // and the dropped row did not mutate its (already emitted) window
      val w0 = spark.table("late_cnt").as[(Long, String, Long)].collect()
        .filter(_._1 == 900L)
      assert(w0.map(_._3).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("streaming session windows equal batch once the watermark closes them") {
    val rnd = new scala.util.Random(23)
    val evs = (0 until 400).map { _ =>
      Ev(10000L + rnd.nextInt(3000), s"k${rnd.nextInt(5)}")
    }
    val batch = evs.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
      .groupBy(session_window(col("ts"), "2 minutes").as("session"), col("k"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session.start").cast("long"), col("session.end").cast("long"),
        col("k"), col("cnt"))
      .as[(Long, Long, String, Long)].collect().toSet
    val input = MemoryStream[Ev](14, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val q = StreamOps.sessionCount(stream, "ts", "1 minute", "2 minutes", col("k"))
      .select(col("session.start").cast("long").as("s"),
        col("session.end").cast("long").as("e"), col("k"), col("cnt"))
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      boundedDisorder(evs, rnd, 50L)(_.tsSec)
        .foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Ev(1000000L, "sentinel"))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[(Long, Long, String, Long)].collect()
        .toSet.filterNot(_._3 == "sentinel")
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming ingest dedup drops in-horizon duplicates, re-admits after expiry") {
    val input = MemoryStream[Ev](15, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val q = StreamOps.dedupWithinWatermark(stream, "ts", "60 seconds", "k")
      .select("tsSec", "k")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(Ev(1000, "doc-x"), Ev(1010, "doc-x"), Ev(1020, "doc-y"))
      q.processAllAvailable()
      // duplicate within the 60 s horizon → dropped
      input.addData(Ev(1030, "doc-x"))
      q.processAllAvailable()
      // watermark jumps far past 1000+60 → doc-x state expires
      input.addData(Ev(10000, "advance"))
      q.processAllAvailable()
      // same content re-arrives after expiry → admitted again
      input.addData(Ev(10010, "doc-x"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[(Long, String)].collect().sorted.toSeq
      assert(got == Seq((1000L, "doc-x"), (1020L, "doc-y"), (10000L, "advance"),
        (10010L, "doc-x")))
    } finally q.stop()
  }

  test("streaming approx distinct produces a row per closed window") {
    val evs = (0 until 300).map(i => Ev(10000L + i * 10, s"u${i % 37}"))
    val input = MemoryStream[Ev](11, spark, None)
    val stream = input.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
    val q = StreamOps.tumblingApproxDistinct(stream, "ts", "0 seconds",
        "10 minutes", col("k"))
      .writeStream.format("memory").queryName("uv_out").outputMode("append").start()
    try {
      input.addData(evs)
      q.processAllAvailable()
      input.addData(Ev(1000000L, "sentinel"))
      q.processAllAvailable()
      assert(spark.table("uv_out").count() >= 5)
    } finally q.stop()
  }
}
