package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import graft.functions.ImageHeader
import graft.ops.MultimodalOps

/** The pure-JVM header parser against the JDK's own codec (an independent
  * decoder) on real generated files, plus malformed-payload classification
  * and the end-to-end synth→parse→decode pipeline. */
class ImageHeaderSpec extends SparkSpec {
  import spark.implicits._

  private def write(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def fill(img: BufferedImage, rgb: Int): BufferedImage = {
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      img.setRGB(x, y, rgb)
    img
  }

  test("png header parse agrees with ImageIO across sizes and color types") {
    for ((w, h, typ, channels) <- Seq(
        (1, 1, BufferedImage.TYPE_INT_RGB, 3L),
        (64, 48, BufferedImage.TYPE_INT_RGB, 3L),
        (640, 2, BufferedImage.TYPE_INT_ARGB, 4L),
        (3, 999, BufferedImage.TYPE_BYTE_GRAY, 1L))) {
      val bytes = write(fill(new BufferedImage(w, h, typ), 0x336699), "png")
      val info = ImageHeader.parse(bytes)
      val round = ImageIO.read(new ByteArrayInputStream(bytes))
      assert(info.format == "png")
      assert(info.width == round.getWidth && info.height == round.getHeight,
        s"${w}x$h: got ${info.width}x${info.height}")
      assert(info.bitDepth == 8L && info.channels == channels, s"type $typ")
    }
  }

  test("jpeg header parse walks real marker segments to the SOF") {
    for ((w, h) <- Seq((1, 1), (64, 48), (333, 77))) {
      val bytes = write(fill(
        new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB), 0xAA5511), "jpg")
      val info = ImageHeader.parse(bytes)
      assert(info.format == "jpeg" && info.width == w && info.height == h,
        s"${w}x$h: got ${info.width}x${info.height}")
      assert(info.bitDepth == 8L && info.channels == 3L)
    }
  }

  test("gif header parse reads little-endian dimensions") {
    val bytes = write(fill(
      new BufferedImage(300, 7, BufferedImage.TYPE_INT_RGB), 0x010203), "gif")
    val info = ImageHeader.parse(bytes)
    assert(info.format == "gif" && info.width == 300L && info.height == 7L)
    assert(info.channels == 1L)
  }

  test("non-image and truncated payloads classify as unknown, never throw") {
    val png = write(fill(
      new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB), 0), "png")
    for (bad <- Seq(
        "just some text".getBytes("UTF-8"),
        Array.emptyByteArray,
        png.take(9),            // signature cut mid-IHDR
        Array.fill[Byte](64)(0xff.toByte))) {
      assert(ImageHeader.parse(bad) == ImageHeader.Unknown)
    }
    // jpeg SOI but the stream ends before any SOF
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(ImageHeader.parse(noSof) == ImageHeader.Unknown)
  }

  test("synth corpus round-trips: headers and pixel sums match the stated contract") {
    val ids = Seq(0L, 1L, 2L, 63L, 64L, 127L, 255L, 256L, 500L).toDF("doc_id")
    val metas = MultimodalOps.imageMeta(MultimodalOps.synthImages(ids))
      .collect().map(m => m.doc_id -> m).toMap
    ids.as[Long].collect().foreach { id =>
      val m = metas(id)
      assert(m.format == (if (id % 2 == 0) "png" else "jpeg"), s"id $id")
      assert(m.width == 1 + id % 64 && m.height == 1 + (id * 7) % 48, s"id $id")
      assert(m.bit_depth == 8L && m.channels == 3L, s"id $id")
    }
    val px = MultimodalOps.pixelSums(MultimodalOps.synthImages(ids))
      .collect().map(p => p.doc_id -> p).toMap
    // only the lossless (png, even-id) half decodes to exact sums
    assert(px.keySet == Set(0L, 2L, 64L, 256L, 500L))
    px.values.foreach { p =>
      val id = p.doc_id
      val n = (1 + id % 64) * (1 + (id * 7) % 48)
      assert(p.n_px == n)
      assert(p.sum_r == n * (id % 256) && p.sum_g == n * ((id * 3) % 256) &&
        p.sum_b == n * ((id * 5) % 256), s"id $id")
    }
  }
}
