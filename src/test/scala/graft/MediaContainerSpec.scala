package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaContainers

/** WAV/MP4 container parsing: the WAV path is cross-checked against
  * `javax.sound.sampled.AudioSystem` (an independent JDK decoder of the
  * same bytes); the MP4 path against a hand-stated ISO/IEC 14496-12
  * fixture composed byte-by-byte IN THIS SPEC (independent of the
  * engine's writer). Malformed payloads must classify, not throw. */
class MediaContainerSpec extends AnyFunSuite {

  // -- helpers: build a WAV through the JDK encoder (same as synthAudio)
  private def jdkWav(channels: Int, rate: Float, frames: Int,
                     sample: (Int, Int) => Int): Array[Byte] = {
    val pcm = new Array[Byte](frames * channels * 2)
    for (i <- 0 until frames; c <- 0 until channels) {
      val v = sample(i, c)
      val off = (i * channels + c) * 2
      pcm(off) = (v & 0xff).toByte
      pcm(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("parseWav agrees with AudioSystem on JDK-encoded files") {
    for (id <- 0L until 40L) {
      val channels = (1 + id % 2).toInt
      val rate = (id % 3) match { case 0 => 8000f; case 1 => 16000f; case _ => 44100f }
      val frames = (64 + id % 256).toInt
      val bytes = jdkWav(channels, rate, frames,
        (i, c) => ((id * 31 + i * 7 + c * 13) % 2048 - 1024).toInt)

      val mine = MediaContainers.parseWav(bytes)
      val jdk = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(mine.format == "wav")
      assert(mine.audioFormat == 1L) // PCM
      assert(mine.channels == jdk.getFormat.getChannels.toLong)
      assert(mine.sampleRate == jdk.getFormat.getSampleRate.toLong)
      assert(mine.bitsPerSample == jdk.getFormat.getSampleSizeInBits.toLong)
      assert(mine.nSamples == jdk.getFrameLength.toLong)
    }
  }

  test("pcmSums16 matches an independent per-sample fold") {
    for (id <- Seq(0L, 1L, 2L, 7L, 255L)) {
      val channels = (1 + id % 2).toInt
      val frames = (64 + id % 256).toInt
      var expSum = 0L; var expAbs = 0L
      val bytes = jdkWav(channels, 8000f, frames, { (i, c) =>
        val v = ((id * 31 + i * 7 + c * 13) % 2048 - 1024).toInt
        expSum += v; expAbs += math.abs(v)
        v
      })
      assert(MediaContainers.pcmSums16(bytes) == ((expSum, expAbs)))
    }
  }

  test("parseWav skips unknown chunks and tolerates truncation") {
    val base = jdkWav(1, 8000f, 16, (i, _) => i)
    // splice a LIST chunk between "WAVE" and the first chunk
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = base.take(12) ++ extra ++ base.drop(12)
    val mine = MediaContainers.parseWav(spliced)
    assert(mine.format == "wav" && mine.nSamples == 16L)
    // truncation inside the data chunk: classify, don't throw
    val cut = MediaContainers.parseWav(base.take(30))
    assert(cut.format == "unknown")
    assert(MediaContainers.parseWav(Array[Byte](1, 2, 3)).format == "unknown")
    assert(MediaContainers.parseWav("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40))
      .format == "unknown")
  }

  // -- MP4: hand-stated fixture, composed here from the ISO layout tables
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("parseMp4 reads a hand-stated v0 fixture") {
    // ftyp: size 24, brand "isom", minor 0, compat "isom" "mp42"
    val ftyp = be32(24) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      "isom".getBytes ++ "mp42".getBytes
    // mvhd v0: verflags + creation + modification + timescale=1000 +
    // duration=7500 + rate + volume+reserved + reserved(8) + matrix(36) +
    // predefined(24) + nextTrack  → payload 100, box 108
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(7500) ++ be32(0x00010000L) ++ be32(0x01000000L) ++
      be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      new Array[Byte](24) ++ be32(2)
    // tkhd v0: verflags + creation + mod + trackId + reserved + duration +
    // reserved(8) + layer/alt/vol/res (8) + matrix(36) + width/height 16.16
    // → payload 84, box 92; width 640, height 360
    val tkhd = be32(92) ++ "tkhd".getBytes ++ be32(7) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(7500) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0) ++
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
      be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L) ++
      be32(640L << 16) ++ be32(360L << 16)
    val trak = be32(8L + tkhd.length) ++ "trak".getBytes ++ tkhd
    val moov = be32(8L + mvhd.length + trak.length) ++ "moov".getBytes ++ mvhd ++ trak
    val payload = Array.tabulate(10)(i => (i * 3).toByte)
    val mdat = be32(18) ++ "mdat".getBytes ++ payload

    val info = MediaContainers.parseMp4(ftyp ++ moov ++ mdat)
    assert(info.format == "mp4")
    assert(info.brand == "isom")
    assert(info.timescale == 1000L)
    assert(info.duration == 7500L)
    assert(info.width == 640L && info.height == 360L)
    assert(info.mdatBytes == 10L)
    assert(info.mdatSum == (0 until 10).map(_ * 3).sum.toLong)
  }

  test("parseMp4 handles engine-written v0/v1 blobs and malformed input") {
    // both version layouts via the engine writer (ids of both parities)
    for (id <- 0L until 24L) {
      val info = MediaContainers.parseMp4(graft.ops.MultimodalOps.buildMp4(id))
      assert(info.format == "mp4" && info.brand == "isom")
      assert(info.timescale ==
        ((id % 3) match { case 0 => 600L; case 1 => 1000L; case _ => 90000L }))
      assert(info.duration == 500L + (id * 11) % 9000)
      assert(info.width == 16L * (1 + id % 120))
      assert(info.height == 16L * (1 + (id * 3) % 68))
      assert(info.mdatBytes == 32L + id % 64)
    }
    assert(MediaContainers.parseMp4("garbage".getBytes ++ new Array[Byte](20))
      .format == "unknown")
    assert(MediaContainers.parseMp4(new Array[Byte](4)).format == "unknown")
    // box size overruns the buffer: stop, classify from what parsed
    val bad = be32(4096) ++ "ftyp".getBytes ++ "isom".getBytes
    assert(MediaContainers.parseMp4(bad).format == "unknown")
  }

  test("parseMp4 reads a 64-bit largesize mdat box") {
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val payload = Array.tabulate(6)(i => (i + 1).toByte)
    // size==1 → u64 largesize follows the type; header is 16 bytes
    val mdat = be32(1) ++ "mdat".getBytes ++ be64(16L + payload.length) ++ payload
    val info = MediaContainers.parseMp4(ftyp ++ mdat)
    assert(info.format == "mp4" && info.brand == "isom")
    assert(info.mdatBytes == 6L)
    assert(info.mdatSum == 21L)
  }

  test("parseMp4 classifies a truncated mvhd v1 box without reading past it") {
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    // mvhd v1 whose payload stops 4 bytes INTO the 8-byte duration field:
    // verflags(4, version=1) + creation(8) + modification(8) +
    // timescale(4) + 4 of 8 duration bytes → payload 28, box 36. Placed
    // last in the buffer so an unguarded be64 read would throw.
    val mvhd = be32(36) ++ "mvhd".getBytes ++
      be32(0x01000000L) ++ new Array[Byte](16) ++ be32(1000) ++ be32(0)
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes ++ mvhd
    val info = MediaContainers.parseMp4(ftyp ++ moov)
    assert(info.format == "mp4" && info.brand == "isom")
    // the partial duration must not be decoded from out-of-box bytes
    assert(info.timescale == -1L && info.duration == -1L)
  }

  test("parseMp4Samples walks the real sample table; classifies when absent") {
    for (id <- 0L until 12L) {
      val t = MediaContainers.parseMp4Samples(
        graft.ops.MultimodalOps.buildMp4Frames(id))
      assert(t.format == "mp4")
      val n = (3 + id % 6).toInt
      assert(t.sizes.length == n && t.offsets.length == n)
      assert(t.sizes.toSeq == (0 until n).map(i => 8 + (id * 7 + i * 3) % 24))
      // offsets are ABSOLUTE file positions, contiguous (1 sample/chunk)
      assert(t.offsets.head == t.mdatStart)
      (1 until n).foreach(i =>
        assert(t.offsets(i) == t.offsets(i - 1) + t.sizes(i - 1)))
    }
    // a table-less MP4 (the metadata corpus) classifies rather than lies
    assert(MediaContainers.parseMp4Samples(
      graft.ops.MultimodalOps.buildMp4(3L)).format == "unknown")
    assert(MediaContainers.parseMp4Samples(
      "junk".getBytes ++ new Array[Byte](20)).format == "unknown")
  }

  test("parseMp4Samples reads the fixed-sample-size stsz form") {
    // stsz with sample_size != 0: no per-sample list, count applies the
    // fixed size — the other legal stsz layout (§8.7.3.2)
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val stsz = be32(20) ++ "stsz".getBytes ++ be32(0) ++ be32(10) ++ be32(3)
    // ftyp(16) + moov/trak/mdia/minf/stbl headers (8 each) + stsz(20) +
    // stco(28) + mdat header (8) → payload at 112
    val mdatStart = 16L + 8 + 8 + 8 + 8 + 8 + 20 + 28 + 8
    val stco = be32(28) ++ "stco".getBytes ++ be32(0) ++ be32(3) ++
      be32(mdatStart) ++ be32(mdatStart + 10) ++ be32(mdatStart + 20)
    val stbl = be32(8L + stsz.length + stco.length) ++ "stbl".getBytes ++ stsz ++ stco
    val minf = be32(8L + stbl.length) ++ "minf".getBytes ++ stbl
    val mdia = be32(8L + minf.length) ++ "mdia".getBytes ++ minf
    val trak = be32(8L + mdia.length) ++ "trak".getBytes ++ mdia
    val moov = be32(8L + trak.length) ++ "moov".getBytes ++ trak
    val mdat = be32(38) ++ "mdat".getBytes ++ Array.tabulate(30)(_.toByte)
    val t = MediaContainers.parseMp4Samples(ftyp ++ moov ++ mdat)
    assert(t.format == "mp4")
    assert(t.sizes.toSeq == Seq(10L, 10L, 10L))
    assert(t.offsets.toSeq == Seq(mdatStart, mdatStart + 10, mdatStart + 20))
    assert(t.mdatStart == mdatStart)
  }

  test("parseWav classifies non-PCM float WAV without sample sums") {
    // IEEE-float WAV (audioFormat 3) through the JDK encoder
    val frames = 32
    val pcm = new Array[Byte](frames * 4)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until frames).foreach(i => bb.putFloat(i * 0.25f))
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val info = MediaContainers.parseWav(bos.toByteArray)
    assert(info.format == "wav")
    assert(info.audioFormat == 3L || info.audioFormat == 0xfffeL) // float or extensible
    assert(info.bitsPerSample == 32L && info.nSamples == frames.toLong)
    // 16-bit PCM decode must refuse, not mis-sum
    assert(MediaContainers.pcmSums16(bos.toByteArray) == ((0L, -1L)))
  }

  test("image header parse survives an EXIF APP1 segment before SOF") {
    // real JPEG from ImageIO, then splice an APP1 (EXIF) segment right
    // after SOI — the marker walk must skip it and still find the SOF dims
    val img = new java.awt.image.BufferedImage(
      17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val exifPayload = "Exif  fakedata".getBytes("US-ASCII")
    val app1 = Array(0xff.toByte, 0xe1.toByte,
      (((exifPayload.length + 2) >> 8) & 0xff).toByte,
      ((exifPayload.length + 2) & 0xff).toByte) ++ exifPayload
    val spliced = jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    val info = graft.functions.ImageHeader.parse(spliced)
    assert(info.format == "jpeg" && info.width == 17L && info.height == 9L)
  }
  test("parseMp4Samples pairs stsz/stco per stbl, never across traks") {
    // trak A's stbl carries ONLY stsz; trak B's stbl carries both. The
    // walk must take trak B's PAIR — pairing A's sizes with B's offsets
    // (the pre-fix behavior under independent global null-guards) would
    // read frames at the wrong positions.
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    def stblOf(boxes: Array[Byte]*): Array[Byte] = {
      val inner = boxes.reduce(_ ++ _)
      val stbl = be32(8L + inner.length) ++ "stbl".getBytes ++ inner
      val minf = be32(8L + stbl.length) ++ "minf".getBytes ++ stbl
      val mdia = be32(8L + minf.length) ++ "mdia".getBytes ++ minf
      be32(8L + mdia.length) ++ "trak".getBytes ++ mdia
    }
    val stszA = be32(20) ++ "stsz".getBytes ++ be32(0) ++ be32(99) ++ be32(2)
    val stszB = be32(28) ++ "stsz".getBytes ++ be32(0) ++ be32(0) ++ be32(2) ++
      be32(5) ++ be32(7)
    val trakA = stblOf(stszA)
    // mdat payload position: ftyp(16) + moov header(8) + trakA + trakB + mdat header(8)
    def withTraks(traks: Array[Byte]): (Array[Byte], Long) = {
      val moov = be32(8L + traks.length) ++ "moov".getBytes ++ traks
      val mdatStart = 16L + moov.length + 8L
      (ftyp ++ moov, mdatStart)
    }
    // compose once to LEARN mdatStart, then rebuild with the right offsets
    val probeB = stblOf(stszB,
      be32(24) ++ "stco".getBytes ++ be32(0) ++ be32(2) ++ be32(0) ++ be32(0))
    val (_, mdatStart) = withTraks(trakA ++ probeB)
    val stcoB = be32(24) ++ "stco".getBytes ++ be32(0) ++ be32(2) ++
      be32(mdatStart) ++ be32(mdatStart + 5)
    val (head, _) = withTraks(trakA ++ stblOf(stszB, stcoB))
    val mdat = be32(20) ++ "mdat".getBytes ++ Array.tabulate(12)(_.toByte)
    val t = MediaContainers.parseMp4Samples(head ++ mdat)
    assert(t.format == "mp4")
    assert(t.sizes.toSeq == Seq(5L, 7L)) // trak B's sizes, NOT trak A's 99s
    assert(t.offsets.toSeq == Seq(mdatStart, mdatStart + 5))

    // complementary halves split across traks: no stbl holds a pair →
    // classify as unknown rather than stitching a cross-trak table
    val (head2, _) = withTraks(trakA ++ stblOf(stcoB))
    assert(MediaContainers.parseMp4Samples(head2 ++ mdat).format == "unknown")
  }
}
