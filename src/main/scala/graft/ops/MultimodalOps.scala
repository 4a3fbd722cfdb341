package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: media (image/audio/video) rides through the
 * engine as an opaque `binary` payload column plus typed metadata, and
 * feature extraction runs as a partition-batched transform over the binary
 * column — the Spark-side schema/partitioning/batching is real; only the
 * codec call is stubbed (no image/audio libraries in this container).
 *
 * Scale notes: payloads stay columnar (parquet binary) end-to-end; the
 * decode pass is a narrow mapPartitions (no shuffle), so it parallelizes
 * per input split and the downstream feature table is a normal DataFrame.
 */
object MultimodalOps {

  /** Attach a binary payload + metadata to a text table (the testdata has
    * no real media blobs, so documents' UTF-8 bytes stand in as payloads —
    * the plumbing is format-agnostic). */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("content_hash", md5(col("payload")))

  /** One extracted feature row per media payload. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      // 4-chunk byte-mean profile — stands in for decoded image stats
      chunk_means: Array[Double],
      // deterministic stand-in for a codec's frame/sample count
      n_frames: Long)

  /**
   * STUB DECODE — a real deployment decodes the payload with an image/audio
   * codec here (this container ships none). The stub derives deterministic
   * features from the raw bytes so the partition-batched plumbing, schema
   * and tests are real and the codec is the only swap-in point.
   */
  private def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val chunks = new Array[Double](4)
    if (n > 0) {
      val step = math.max(n / 4, 1)
      var c = 0
      while (c < 4) {
        val from = math.min(c * step, n); val until = if (c == 3) n else math.min((c + 1) * step, n)
        var s = 0L; var i = from
        while (i < until) { s += bytes(i) & 0xff; i += 1 }
        chunks(c) = if (until > from) s.toDouble / (until - from) else 0.0
        c += 1
      }
    }
    MediaFeatures(docId, n.toLong, chunks, n.toLong / 64 + 1)
  }

  /** Feature extraction over (doc_id, payload): batched per partition,
    * mirroring a mapInPandas/Arrow-batch decode pipeline. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(rows => rows.map { case (id, bytes) => decodeStub(id, bytes) })(enc)
  }
}
