package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.cep.Cep
import graft.streaming.Detectors
import graft.streaming.Detectors.{KeyedEvent, RunMatch}

/**
 * The CEP property from SURVEY.md §5: the streaming state-machine detector
 * must agree with the declarative batch lag formulation — including under
 * out-of-order arrival, where the watermark buffer restores event-time
 * order.
 */
class CepParitySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val events: Seq[KeyedEvent] = (0 until 400).map { i =>
    KeyedEvent(key = rnd.nextInt(5).toLong, tsSec = 1000L + rnd.nextInt(2000),
      id = i.toLong, hit = rnd.nextDouble() < 0.6)
  }

  private def batchExpected(n: Int, within: Long): Set[RunMatch] = {
    val df = events.toDF()
    Cep.consecutiveHits(df, col("key"), col("tsSec"), col("id"), col("hit"), n, within)
      .as[RunMatch].collect().toSet
  }

  test("batch-mode detector matches the lag formulation") {
    val got = Detectors.consecutive(events.toDS(), n = 3, withinSec = 300,
      streaming = false).collect().toSet
    assert(got == batchExpected(3, 300))
    assert(got.nonEmpty)
  }

  test("streaming detector with out-of-order arrival matches batch") {
    val input = MemoryStream[KeyedEvent](1, spark, None)
    val withWm = input.toDS()
      .withColumn("ts", timestamp_seconds(col("tsSec")))
      .withWatermark("ts", "100 seconds")
      .as[KeyedEvent]
    val q = Detectors.consecutive(withWm, n = 3, withinSec = 300, streaming = true)
      .writeStream.format("memory").queryName("cep_out").outputMode("append").start()
    try {
      // out-of-order arrival, disorder bounded below the watermark delay
      boundedDisorder(events, rnd, 90L)(_.tsSec).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
      // sentinel far in the future pushes the watermark past every event
      input.addData(KeyedEvent(99L, 1000000L, 9999L, hit = false))
      q.processAllAvailable()
      val got = spark.table("cep_out").as[RunMatch].collect().toSet
      assert(got == batchExpected(3, 300))
    } finally q.stop()
  }

  test("success resets the run (reference LoginFail semantics)") {
    val seq = Seq(
      KeyedEvent(1, 10, 1, hit = true), KeyedEvent(1, 20, 2, hit = true),
      KeyedEvent(1, 25, 3, hit = false), // success clears
      KeyedEvent(1, 30, 4, hit = true), KeyedEvent(1, 40, 5, hit = true),
      KeyedEvent(1, 45, 6, hit = true))
    val got = Detectors.consecutive(seq.toDS(), n = 3, withinSec = 1000,
      streaming = false).collect().toSet
    // only 4,5,6 forms a 3-run; 1,2 was cut by the success at id 3
    assert(got == Set(RunMatch(1, 4, 6, 30, 45, 3)))
  }
}
