package graft.functions

/**
 * Pure-JVM image header decoding — the scale path of the multimodal
 * metadata pass: reads format, dimensions, bit depth and channel count
 * from the first bytes of a PNG / JPEG / GIF payload WITHOUT decoding
 * pixels (a 100 TB metadata sweep must not run a full codec per blob;
 * header parsing touches ≤ a few hundred bytes however large the image).
 *
 * Formats are parsed from their public specifications:
 *  - PNG: 8-byte signature, then the IHDR chunk — width/height as
 *    big-endian u32 at offsets 16/20, bit depth at 24, color type at 25
 *    (channels: gray 1, rgb 3, palette 1, gray+alpha 2, rgba 4).
 *  - JPEG: marker walk from SOI (FFD8) skipping variable-length segments
 *    until a start-of-frame marker (C0-CF except C4/C8/CC); the SOF
 *    payload holds precision, height, width, component count.
 *  - GIF: 6-byte signature (GIF87a/GIF89a), then width/height as
 *    LITTLE-endian u16; bit depth from the packed color-resolution
 *    field; channels 1 (palette-indexed).
 *
 * Unknown or truncated payloads return format "unknown" with −1 fields —
 * a corpus sweep classifies rather than throws. Validated in specs
 * against `javax.imageio` (an independent JDK decoder) on real generated
 * files, and against hand-stated fixtures.
 */
object ImageHeader {

  case class ImageInfo(format: String, width: Long, height: Long,
                       bitDepth: Long, channels: Long)

  val Unknown: ImageInfo = ImageInfo("unknown", -1L, -1L, -1L, -1L)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  def parse(bytes: Array[Byte]): ImageInfo = {
    if (bytes == null || bytes.length < 10) return Unknown
    if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else if (isGif(bytes)) parseGif(bytes)
    else Unknown
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
      u8(b, 6) == 0x1a && u8(b, 7) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def parsePng(b: Array[Byte]): ImageInfo = {
    // signature(8) + IHDR length(4) + "IHDR"(4) + 13-byte payload
    if (b.length < 26 || b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return Unknown
    val colorType = u8(b, 25)
    val channels = colorType match {
      case 0 => 1L // grayscale
      case 2 => 3L // truecolor
      case 3 => 1L // palette-indexed
      case 4 => 2L // gray + alpha
      case 6 => 4L // truecolor + alpha
      case _ => -1L
    }
    ImageInfo("png", be32(b, 16), be32(b, 20), u8(b, 24).toLong, channels)
  }

  private def parseJpeg(b: Array[Byte]): ImageInfo = {
    var i = 2
    while (i + 3 < b.length) {
      // fill bytes before a marker are legal
      if (u8(b, i) != 0xff) return Unknown
      var j = i
      while (j < b.length && u8(b, j) == 0xff) j += 1
      if (j >= b.length) return Unknown
      val m = u8(b, j)
      val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
      if (isSof) {
        // segment: len(2) precision(1) height(2) width(2) nComponents(1)
        if (j + 8 >= b.length) return Unknown
        return ImageInfo("jpeg", be16(b, j + 6).toLong, be16(b, j + 4).toLong,
          u8(b, j + 3).toLong, u8(b, j + 8).toLong)
      } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i = j + 1 // standalone marker, no length field
      } else if (m == 0xd9 || m == 0xda) {
        return Unknown // EOI / start-of-scan before any SOF: no dimensions
      } else {
        if (j + 2 >= b.length) return Unknown
        i = j + 1 + be16(b, j + 1)
      }
    }
    Unknown
  }

  private def parseGif(b: Array[Byte]): ImageInfo = {
    if (b.length < 11) return Unknown
    val packed = u8(b, 10)
    ImageInfo("gif", le16(b, 6).toLong, le16(b, 8).toLong,
      ((packed >> 4) & 0x7).toLong + 1L, 1L)
  }
}
