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

  // ---- real image decode (pure JVM: custom header parse + javax.imageio)

  /** Deterministic real-format image per doc id: a solid-color
    * `(1 + id%64) × (1 + id*7%48)` RGB raster written as an actual PNG
    * (even ids) or baseline JPEG (odd ids) via the JDK's ImageIO — REAL
    * format bytes, no native deps. The fill color is (id%256, id*3%256,
    * id*5%256), so pixel sums are arithmetically stated by the oracle.
    * Stands in for a corpus whose blobs arrived from storage. */
  def synthImages(ids: DataFrame): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    ids.select(col("doc_id")).as(Encoders.scalaLong)
      .mapPartitions { it =>
        it.map { id =>
          val w = (1 + id % 64).toInt
          val h = (1 + (id * 7) % 48).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (((id % 256).toInt << 16) | (((id * 3) % 256).toInt << 8) |
            ((id * 5) % 256).toInt)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val fmt = if (id % 2 == 0) "png" else "jpg"
          javax.imageio.ImageIO.write(img, fmt, bos)
          (id, bos.toByteArray)
        }
      }(enc).toDF("doc_id", "payload")
  }

  case class ImageMeta(doc_id: Long, format: String, width: Long,
                       height: Long, bit_depth: Long, channels: Long)

  /** Header-only image metadata over (doc_id, payload): format,
    * dimensions, bit depth, channels via [[graft.functions.ImageHeader]] —
    * a narrow mapPartitions that reads ≤ a few hundred bytes per blob
    * (never a full pixel decode), the shape a 100 TB metadata sweep needs.
    * Non-image payloads classify as 'unknown' with −1 fields. */
  def imageMeta(payloads: DataFrame): Dataset[ImageMeta] = {
    val enc = Encoders.product[ImageMeta]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.map { case (id, bytes) =>
        val info = graft.functions.ImageHeader.parse(bytes)
        ImageMeta(id, info.format, info.width, info.height, info.bitDepth,
          info.channels)
      })(enc)
  }

  case class PixelSums(doc_id: Long, n_px: Long, sum_r: Long, sum_g: Long,
                       sum_b: Long)

  /** REAL pixel decode over PNG payloads: ImageIO (the JDK's codec)
    * decompresses the raster and per-channel integer sums come off the
    * decoded pixels — lossless format, so the sums are bit-deterministic
    * and oracle-stateable. Narrow mapPartitions, no shuffle; JPEG/unknown
    * payloads are skipped (lossy decode is decoder-dependent, so a
    * deterministic engine only sums lossless rasters). */
  def pixelSums(payloads: DataFrame): Dataset[PixelSums] = {
    val enc = Encoders.product[PixelSums]
    payloads.select(col("doc_id"), col("payload"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (!graft.functions.ImageHeader.parse(bytes).format.equals("png")) None
        else {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          if (img == null) None
          else {
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            Some(PixelSums(id, img.getWidth.toLong * img.getHeight, sr, sg, sb))
          }
        }
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
