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

  /** One extracted feature row per media payload. The chunk sums/lengths
    * are exact integers (auditable against an oracle); the means are the
    * derived double view. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      // 4-chunk byte-sum/length profile — stands in for decoded image stats
      chunk_sums: Array[Long],
      chunk_lens: Array[Long],
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
    val sums = new Array[Long](4)
    val lens = new Array[Long](4)
    val means = new Array[Double](4)
    if (n > 0) {
      val step = math.max(n / 4, 1)
      var c = 0
      while (c < 4) {
        val from = math.min(c * step, n); val until = if (c == 3) n else math.min((c + 1) * step, n)
        var s = 0L; var i = from
        while (i < until) { s += bytes(i) & 0xff; i += 1 }
        sums(c) = s
        lens(c) = (until - from).toLong
        // exact-int division: both sides < 2^53, correctly rounded once
        means(c) = if (until > from) s.toDouble / (until - from) else 0.0
        c += 1
      }
    }
    MediaFeatures(docId, n.toLong, sums, lens, means, n.toLong / 64 + 1)
  }

  /** Feature extraction over (doc_id, payload): batched per partition,
    * mirroring a mapInPandas/Arrow-batch decode pipeline. */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(rows => rows.map { case (id, bytes) => decodeStub(id, bytes) })(enc)
  }

  /** One resized-thumbnail row per payload. */
  case class Resized(doc_id: Long, width: Int, height: Int, thumb: Array[Byte])

  /**
   * STUB RESIZE — a real deployment decodes + scales with an image codec.
   * The stub treats the payload as a (len/width)×width byte raster and
   * box-averages it down to `w`×`h`, so output shape, batching and
   * determinism match a real thumbnailer.
   */
  def resizeStub(payloads: DataFrame, w: Int, h: Int): Dataset[Resized] = {
    val enc = Encoders.product[Resized]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(rows => rows.map { case (id, bytes) =>
        val srcW = math.max(math.sqrt(bytes.length.toDouble).toInt, 1)
        val srcH = math.max(bytes.length / srcW, 1)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val sx = x * srcW / w; val sy = y * srcH / h
            val idx = math.min(sy * srcW + sx, bytes.length - 1)
            out(y * w + x) = bytes(math.max(idx, 0))
            x += 1
          }
          y += 1
        }
        Resized(id, w, h, out)
      })(enc)
  }

  /** One row per sampled "frame" (fixed-stride chunks of the payload) —
    * the frame-sampling shape of a video pipeline, codec STUBBED. */
  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, checksum: Long)

  def frameSampleStub(payloads: DataFrame, frameBytes: Int, every: Int): Dataset[Frame] = {
    val enc = Encoders.product[Frame]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(rows => rows.flatMap { case (id, bytes) =>
        val nFrames = math.max(bytes.length / frameBytes, 1)
        (0L until nFrames.toLong by every.toLong).map { f =>
          val from = (f * frameBytes).toInt
          val until = math.min(from + frameBytes, bytes.length)
          var sum = 0L
          var i = from
          while (i < until) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
          Frame(id, f, from.toLong, sum)
        }
      })(enc)
  }
}
