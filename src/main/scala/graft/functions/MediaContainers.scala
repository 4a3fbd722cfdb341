package graft.functions

/**
 * Pure-JVM audio/video container decoding — completes the multimodal
 * metadata triad next to [[ImageHeader]]: WAV (RIFF) and MP4 (ISO BMFF,
 * ISO/IEC 14496-12) parsed from their public specifications. Like the
 * image path, the header sweep touches only the container structure —
 * it never inflates media payloads — which is the shape a 100 TB
 * metadata pass needs. PCM decode (the one codec the JVM can do
 * bit-exactly with zero native deps) is offered separately for WAV.
 *
 * Reference behavior anchor: the reference pipelines treat media ids as
 * opaque attributes (e.g. itemId in hot-items-analysis
 * UserBehavior.java:1-60); this engine upgrades media to first-class
 * binary columns with typed, verifiable decode.
 *
 * Unknown/truncated payloads classify as "unknown" with -1 fields —
 * a corpus sweep classifies rather than throws.
 */
object MediaContainers {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  // ---------------------------------------------------------------- WAV

  /** Parsed RIFF/WAVE facts. `nSamples` counts sample FRAMES (one frame =
    * one sample per channel); `dataOffset`/`dataLen` locate the PCM
    * payload for the decode pass. */
  case class WavInfo(format: String, audioFormat: Long, channels: Long,
                     sampleRate: Long, bitsPerSample: Long, nSamples: Long,
                     dataOffset: Int, dataLen: Int)

  val UnknownWav: WavInfo = WavInfo("unknown", -1L, -1L, -1L, -1L, -1L, -1, -1)

  /** RIFF chunk walk per the public WAVE spec: "RIFF" size "WAVE", then
    * chunks of (4cc, u32 LE size, payload, pad-to-even). Reads `fmt ` for
    * the format facts and `data` for the sample count; other chunks
    * (LIST, fact, cue ...) are skipped structurally. */
  def parseWav(b: Array[Byte]): WavInfo = {
    if (b == null || b.length < 44) return UnknownWav
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return UnknownWav
    var i = 12
    var audioFormat = -1L; var channels = -1L; var sampleRate = -1L
    var bits = -1L; var blockAlign = -1L
    var dataOffset = -1; var dataLen = -1
    while (i + 8 <= b.length) {
      val id = fourcc(b, i)
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue - 8 || i + 8 + size > b.length) {
        // truncated chunk: stop the walk, keep whatever parsed so far
        i = b.length
      } else {
        if (id == "fmt " && size >= 16) {
          audioFormat = le16(b, i + 8).toLong
          channels = le16(b, i + 10).toLong
          sampleRate = le32(b, i + 12)
          blockAlign = le16(b, i + 20).toLong
          bits = le16(b, i + 22).toLong
        } else if (id == "data") {
          dataOffset = i + 8
          dataLen = size.toInt
        }
        i += 8 + size.toInt + (size.toInt & 1) // chunks are even-aligned
      }
    }
    if (channels <= 0 || sampleRate <= 0 || bits <= 0 || dataOffset < 0)
      return UnknownWav
    val frameBytes = math.max(blockAlign, channels * (bits / 8))
    val nSamples = if (frameBytes > 0) dataLen / frameBytes else -1L
    WavInfo("wav", audioFormat, channels, sampleRate, bits, nSamples,
      dataOffset, dataLen)
  }

  /** Exact PCM decode for 16-bit LE signed WAV (the canonical PCM layout):
    * returns (sum of samples, sum of |samples|) across all channels —
    * integer facts an oracle can state. Non-PCM16 payloads → (0, -1). */
  def pcmSums16(b: Array[Byte]): (Long, Long) = {
    val info = parseWav(b)
    if (info.format != "wav" || info.audioFormat != 1L || info.bitsPerSample != 16L)
      return (0L, -1L)
    var sum = 0L; var sumAbs = 0L
    var i = info.dataOffset
    val end = info.dataOffset + (info.dataLen & ~1)
    while (i + 2 <= end) {
      val s = (le16(b, i).toShort).toLong
      sum += s; sumAbs += math.abs(s)
      i += 2
    }
    (sum, sumAbs)
  }

  // ---------------------------------------------------------------- MP4

  /** Parsed ISO-BMFF facts: `brand` from ftyp, movie timescale/duration
    * from moov/mvhd (version 0 and 1 layouts), presentation width/height
    * from the first trak/tkhd (16.16 fixed point), plus the mdat payload
    * length and byte sum (the cheap integrity probe a sweep computes
    * while the bytes are hot). */
  case class Mp4Info(format: String, brand: String, timescale: Long,
                     duration: Long, width: Long, height: Long,
                     mdatBytes: Long, mdatSum: Long)

  val UnknownMp4: Mp4Info =
    Mp4Info("unknown", "", -1L, -1L, -1L, -1L, -1L, -1L)

  /** Top-level box walk per ISO/IEC 14496-12 §4.2: each box is
    * (u32 BE size, 4cc type), size==1 → u64 largesize follows, size==0 →
    * box extends to end of file. Containers (moov, trak, mdia) recurse. */
  def parseMp4(b: Array[Byte]): Mp4Info = {
    if (b == null || b.length < 16) return UnknownMp4
    // an MP4 must lead with a box whose type is a known top-level 4cc
    val firstType = fourcc(b, 4)
    if (firstType != "ftyp" && firstType != "moov" && firstType != "mdat" &&
        firstType != "free" && firstType != "wide" && firstType != "skip")
      return UnknownMp4

    var brand = ""
    var timescale = -1L; var duration = -1L
    var width = -1L; var height = -1L
    var mdatBytes = -1L; var mdatSum = -1L

    def walk(from: Int, to: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i)
        val typ = fourcc(b, i + 4)
        var header = 8
        var size = size32
        if (size32 == 1L) {
          if (i + 16 > to) return
          size = be64(b, i + 8); header = 16
        } else if (size32 == 0L) {
          size = (to - i).toLong
        }
        if (size < header || i + size > to) return // malformed: stop
        val p = i + header // payload start
        val pEnd = (i + size).toInt
        typ match {
          case "ftyp" if brand.isEmpty && p + 4 <= pEnd =>
            brand = fourcc(b, p)
          case "mvhd" if p + 4 <= pEnd =>
            val version = u8(b, p)
            if (version == 1 && p + 32 <= pEnd) {
              timescale = be32(b, p + 20); duration = be64(b, p + 24)
            } else if (version == 0 && p + 20 <= pEnd) {
              timescale = be32(b, p + 12); duration = be32(b, p + 16)
            }
          case "tkhd" if width < 0 && p + 4 <= pEnd =>
            val version = u8(b, p)
            // width/height are the LAST 8 payload bytes (16.16 fixed);
            // spec offsets: verflags(4) + times/ids (v0 20 B, v1 32 B) +
            // reserved(8) + layer/alt/volume/reserved(8) + matrix(36)
            val wOff = if (version == 1) p + 88 else p + 76
            if (wOff + 8 <= pEnd) {
              width = be32(b, wOff) >> 16
              height = be32(b, wOff + 4) >> 16
            }
          case "mdat" =>
            mdatBytes = (pEnd - p).toLong
            var s = 0L; var j = p
            while (j < pEnd) { s += u8(b, j); j += 1 }
            mdatSum = s
          case "moov" | "trak" | "mdia" if depth < 8 =>
            walk(p, pEnd, depth + 1)
          case _ => () // free/skip/unknown: structural skip
        }
        i = pEnd
      }
    }

    walk(0, b.length, 0)
    if (brand.isEmpty && timescale < 0) UnknownMp4
    else Mp4Info("mp4", brand, timescale, duration, width, height,
      mdatBytes, mdatSum)
  }

  // ------------------------------------------------- MP4 sample table

  /** Per-sample layout from the stbl sample table: `sizes(i)` from stsz,
    * `offsets(i)` the ABSOLUTE file offset from stco (this corpus writes
    * one sample per chunk, the simplest legal layout), `mdatStart` the
    * mdat payload's file offset — so callers can state offsets relative
    * to the payload. */
  case class Mp4Samples(format: String, sizes: Array[Long],
                        offsets: Array[Long], mdatStart: Long)

  val UnknownMp4Samples: Mp4Samples =
    Mp4Samples("unknown", Array.empty, Array.empty, -1L)

  /** Sample-table walk per ISO/IEC 14496-12 §8.7.3 (stsz) / §8.7.5
    * (stco): recurse moov → trak → mdia → minf → stbl, read the
    * per-sample size list and the chunk-offset list. This is how a real
    * video pipeline LOCATES frames — the sample table is the index; the
    * payload bytes are then read at the table's offsets, never scanned.
    * Malformed tables (count overrunning the box) classify as unknown.
    * Multi-trak files: stsz and stco are only accepted as a pair found
    * under the SAME stbl (the first stbl carrying both wins), so trak A's
    * sizes can never be paired with trak B's offsets. */
  def parseMp4Samples(b: Array[Byte]): Mp4Samples = {
    // same leading-box gate as parseMp4 — deliberately NOT the full parse,
    // which sums mdat bytes; the sample-table walk touches headers only
    if (b == null || b.length < 16) return UnknownMp4Samples
    val firstType = fourcc(b, 4)
    if (firstType != "ftyp" && firstType != "moov" && firstType != "mdat" &&
        firstType != "free" && firstType != "wide" && firstType != "skip")
      return UnknownMp4Samples
    var sizes: Array[Long] = null
    var offsets: Array[Long] = null
    var mdatStart = -1L
    // per-stbl capture buffers: committed to sizes/offsets only when BOTH
    // boxes were found under one stbl (see scaladoc)
    var curSizes: Array[Long] = null
    var curOffsets: Array[Long] = null

    def walk(from: Int, to: Int, depth: Int, inStbl: Boolean): Unit = {
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i)
        val typ = fourcc(b, i + 4)
        var header = 8
        var size = size32
        if (size32 == 1L) {
          if (i + 16 > to) return
          size = be64(b, i + 8); header = 16
        } else if (size32 == 0L) {
          size = (to - i).toLong
        }
        if (size < header || i + size > to) return
        val p = i + header
        val pEnd = (i + size).toInt
        typ match {
          case "stsz" if inStbl && curSizes == null && p + 12 <= pEnd =>
            // verflags(4) + sample_size(4) + sample_count(4) [+ count×u32]
            val fixed = be32(b, p + 4)
            val n = be32(b, p + 8)
            if (fixed != 0L) {
              if (n <= (1 << 20)) curSizes = Array.fill(n.toInt)(fixed)
            } else if (n <= (1 << 20) && p + 12 + 4 * n <= pEnd) {
              curSizes = Array.tabulate(n.toInt)(k => be32(b, p + 12 + 4 * k))
            }
          case "stco" if inStbl && curOffsets == null && p + 8 <= pEnd =>
            // verflags(4) + entry_count(4) + count×u32 absolute offsets
            val n = be32(b, p + 4)
            if (n <= (1 << 20) && p + 8 + 4 * n <= pEnd) {
              curOffsets = Array.tabulate(n.toInt)(k => be32(b, p + 8 + 4 * k))
            }
          case "mdat" if mdatStart < 0 =>
            mdatStart = p.toLong
          case "stbl" if depth < 10 =>
            curSizes = null; curOffsets = null
            walk(p, pEnd, depth + 1, inStbl = true)
            if (sizes == null && curSizes != null && curOffsets != null) {
              sizes = curSizes; offsets = curOffsets
            }
          case "moov" | "trak" | "mdia" | "minf" if depth < 10 =>
            walk(p, pEnd, depth + 1, inStbl = false)
          case _ => ()
        }
        i = pEnd
      }
    }

    walk(0, b.length, 0, inStbl = false)
    if (sizes == null || offsets == null || mdatStart < 0) UnknownMp4Samples
    else Mp4Samples("mp4", sizes, offsets, mdatStart)
  }
}
