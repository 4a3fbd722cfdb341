package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.cep.Cep
import graft.streaming.Detectors
import graft.streaming.Detectors.{KeyedEvent, TxEvent}

/**
 * Property-based invariants (SURVEY.md §5): random event streams from
 * ScalaCheck generators, engine-level invariants that must hold for every
 * interleaving.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genEvents: Gen[List[KeyedEvent]] = for {
    n <- Gen.choose(50, 200)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 4L)
      ts <- Gen.choose(1000L, 2500L)
      hit <- Gen.prob(0.55)
    } yield (key, ts, hit))
  } yield evs.zipWithIndex.map { case ((k, t, h), i) => KeyedEvent(k, t, i.toLong, h) }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("property: WAV round-trips through the JDK encoder for random PCM") {
    val genWav = for {
      channels <- Gen.choose(1, 2)
      rateIx <- Gen.choose(0, 2)
      frames <- Gen.choose(1, 300)
      seed <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (channels, Seq(8000f, 16000f, 44100f)(rateIx), frames, seed)
    samples(genWav, 60).foreach { case (channels, rate, frames, seed) =>
      val pcm = new Array[Byte](frames * channels * 2)
      var expSum = 0L; var expAbs = 0L
      for (i <- 0 until frames * channels) {
        val v = (((seed + i * 2654435761L) % 2048) - 1024).toInt
        expSum += v; expAbs += math.abs(v)
        pcm(i * 2) = (v & 0xff).toByte
        pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      val info = graft.functions.MediaContainers.parseWav(bos.toByteArray)
      assert(info.format == "wav" && info.channels == channels.toLong &&
        info.sampleRate == rate.toLong && info.bitsPerSample == 16L &&
        info.nSamples == frames.toLong)
      assert(graft.functions.MediaContainers.pcmSums16(bos.toByteArray) ==
        ((expSum, expAbs)))
    }
  }

  test("property: container parsers classify, never throw, on arbitrary bytes") {
    val genBytes = for {
      n <- Gen.choose(0, 200)
      bs <- Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte))
      // bias toward magic-number prefixes so the parsers' deep paths run
      prefix <- Gen.oneOf(Array.emptyByteArray, "RIFF".getBytes,
        Array[Byte](0, 0, 0, 24) ++ "ftyp".getBytes,
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))
    } yield prefix ++ bs.toArray
    samples(genBytes, 300).foreach { bytes =>
      val w = graft.functions.MediaContainers.parseWav(bytes)
      val m = graft.functions.MediaContainers.parseMp4(bytes)
      val i = graft.functions.ImageHeader.parse(bytes)
      assert(w.format == "wav" || w.format == "unknown")
      assert(m.format == "mp4" || m.format == "unknown")
      assert(i.format != null)
      graft.functions.MediaContainers.pcmSums16(bytes) // must not throw
    }
  }

  test("property: engine MP4 blobs parse back to their id-derived facts") {
    samples(Gen.choose(0L, 100000L), 80).foreach { id =>
      val info = graft.functions.MediaContainers.parseMp4(
        graft.ops.MultimodalOps.buildMp4(id))
      assert(info.brand == "isom")
      assert(info.timescale ==
        ((id % 3) match { case 0 => 600L; case 1 => 1000L; case _ => 90000L }))
      assert(info.duration == 500L + (id * 11) % 9000)
      assert(info.width == 16L * (1 + id % 120))
      assert(info.height == 16L * (1 + (id * 3) % 68))
    }
  }

  test("property: incrementalDedup verdicts are sound on random corpora") {
    // small random vocab corpora: exact verdicts must match base text
    // verbatim, new verdicts must have no identical base text, and every
    // delivery doc gets exactly one decision
    val genCorpus = for {
      nBase <- Gen.choose(3, 12)
      nDel <- Gen.choose(3, 10)
      texts <- Gen.listOfN(nBase + nDel, for {
        n <- Gen.choose(5, 12)
        ws <- Gen.listOfN(n, Gen.choose(0, 7).map(i => s"tok$i"))
      } yield ws.mkString(" "))
    } yield (nBase, texts)
    samples(genCorpus, 12).foreach { case (nBase, texts) =>
      val base = texts.take(nBase).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val delivery = texts.drop(nBase).zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
      val out = graft.ops.DedupOps
        .incrementalDedup(base, delivery, "text", 3, 16, 4, 0.5)
        .as[(Long, String, Long)].collect()
      assert(out.length == texts.length - nBase)
      val baseTexts = texts.take(nBase).zipWithIndex
        .map { case (t, i) => i.toLong -> t }.toMap
      val delTexts = texts.drop(nBase).zipWithIndex
        .map { case (t, i) => (1000L + i) -> t }.toMap
      out.foreach { case (id, verdict, dupOf) =>
        verdict match {
          case "exact" =>
            assert(baseTexts(dupOf) == delTexts(id), s"doc $id exact mismatch")
          case "near" =>
            assert(baseTexts.contains(dupOf) && baseTexts(dupOf) != delTexts(id))
          case "new" =>
            assert(dupOf == -1L)
            assert(!baseTexts.values.exists(_ == delTexts(id)),
              s"doc $id marked new but has an identical base text")
        }
      }
    }
  }

  test("property: spanScrub invariants on random corpora") {
    import graft.ops.DedupOps
    val genDocs: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(4, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 20)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(genDocs, 5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = DedupOps.spanScrub(df, "text", 3)
        .select("doc_id", "n_tok", "n_removed", "text_clean")
        .as[(Long, Long, Long, String)].collect()
      val byId = docs.toMap
      assert(out.length == docs.size)
      out.foreach { case (id, nTok, nRemoved, clean) =>
        val orig = byId(id).split(" ").filter(_.nonEmpty)
        val kept = clean.split(" ").filter(_.nonEmpty)
        // token accounting is exact and clean is a subsequence of the original
        assert(nTok == orig.length && kept.length == nTok - nRemoved)
        var j = 0
        kept.foreach { t => j = orig.indexOf(t, j); assert(j >= 0); j += 1 }
        // docs shorter than the span width are never modified
        if (orig.length < 3) assert(nRemoved == 0L && kept.sameElements(orig))
      }
    }
  }

  test("property: cep-lite(n=2) ≡ lag formulation for random streams") {
    samples(genEvents, 5).foreach { evs =>
      val df = evs.toDF()
      val lag = Cep.adjacentHits(df, col("key"), col("tsSec"), col("id"),
        col("hit"), 120).select("key", "first_id", "last_id").as[(Long, Long, Long)]
        .collect().toSet
      val det = Detectors.consecutive(evs.toDS(), 2, 120, streaming = false)
        .select("key", "first_id", "last_id").as[(Long, Long, Long)]
        .collect().toSet
      assert(lag == det)
    }
  }

  test("property: reconcile partitions pays into matched ∪ unmatched exactly") {
    val genTx: Gen[List[TxEvent]] = genEvents.map(_.map(e =>
      TxEvent(e.key, e.tsSec, e.id, e.hit)))
    samples(genTx, 5).foreach { evs =>
      val out = Detectors.reconcile(evs.toDS(), 5, 3, streaming = false).collect()
      val pays = evs.count(_.hit)
      val matched = out.count(_.tag == "matched")
      val unmatchedPays = out.count(_.tag == "unmatched_pay")
      assert(matched + unmatchedPays == pays,
        s"pays=$pays matched=$matched unmatched=$unmatchedPays")
      val receipts = evs.count(!_.hit)
      assert(matched + out.count(_.tag == "unmatched_receipt") == receipts)
      // no pay/receipt consumed twice
      val payIds = out.filter(o => o.tag == "matched" || o.tag == "unmatched_pay")
        .map(_.pay_id)
      assert(payIds.distinct.length == payIds.length)
    }
  }

  test("property: pq_dists equals the ldot distance algebra element-wise") {
    // the native fold computes Σ(v−c)²; the retired literal-SQL plan
    // computed ldot(sub,sub) − 2·ldot(sub,c) + Σc² — identical integers
    // for every (codebook, vector), any shape
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 50) {
      val nSub = 1 + rnd.nextInt(4)
      val subDim = 1 + rnd.nextInt(8)
      def q(): Long = rnd.nextLong() % 10000000L
      val cents = Array.fill(nSub)(
        Array.fill(1 + rnd.nextInt(5))(Array.fill(subDim)(q())))
      val qvec = Array.fill(nSub * subDim)(q())
      val got = graft.functions.PqDists.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(qvec),
        cents, subDim)
      for (m <- 0 until nSub; k <- cents(m).indices) {
        val sub = qvec.slice(m * subDim, (m + 1) * subDim)
        val c = cents(m)(k)
        val ss = sub.map(x => x * x).sum
        val sc = sub.zip(c).map { case (a, b) => a * b }.sum
        val cc = c.map(x => x * x).sum
        assert(got.getArray(m).getLong(k) == ss - 2 * sc + cc,
          s"dist mismatch at m=$m k=$k")
        // and the single-subspace form agrees with the full fold
        assert(graft.functions.PqDists.computeSub(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(sub), m, cents)
          .getLong(k) == got.getArray(m).getLong(k))
      }
    }
  }

  test("property: BM25 scoring equals a driver-local model on random corpora") {
    // random small corpora over a tiny vocabulary (forcing term collisions,
    // repeated tf, shared rare terms), including empty and single-token
    // docs: the frozen-model scorer must equal an independent driver-side
    // BM25 for every (query, doc) pair, and bm25Score must agree with the
    // model's own statistics however the corpus is shaped
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val genCorpus: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(4, 16)
      docs <- Gen.listOfN(n, for {
        len <- Gen.frequency((1, Gen.const(0)), (1, Gen.const(1)), (6, Gen.choose(2, 30)))
        ws <- Gen.listOfN(len, Gen.choose(0, vocab.length - 1))
      } yield ws.map(vocab).mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(genCorpus, 25).filter(_.nonEmpty).foreach { corpus =>
      val docsDf = corpus.toDF("doc_id", "text")
      val toks = corpus.map { case (id, t) =>
        id -> t.trim.split(" ").filter(_.nonEmpty) }.toMap
      val nonEmpty = toks.filter(_._2.nonEmpty)
      if (nonEmpty.nonEmpty) {
        // frozen model trained on this corpus, queries = docs with id < 3
        val model = {
          val n = nonEmpty.size.toLong
          val sumDl = nonEmpty.values.map(_.length.toLong).sum
          val dfm = nonEmpty.values.flatMap(_.distinct)
            .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
          val terms = nonEmpty.toSeq.filter(_._1 < 3).flatMap { case (q, ws) =>
            ws.distinct.map(t => (q, t, dfm(t)))
          }
          graft.queries.PipelineQueries.Bm25Model(terms, n, sumDl)
        }
        val got = graft.queries.PipelineQueries.bm25Score(docsDf, model)
          .select("q_id", "doc_id", "score_micro")
          .as[(Long, Long, Long)].collect()
          .map { case (q, d, s) => (q, d) -> s }.toMap
        // independent driver-side BM25 (no shared code with the engine)
        val avgdl = model.sumDl.toDouble / model.nDocs.toDouble
        val exp = (for {
          (q, ws) <- nonEmpty.toSeq.filter(_._1 < 3)
          (d, ds) <- nonEmpty.toSeq
          score = ws.distinct.flatMap { t =>
            val tf = ds.count(_ == t)
            if (tf == 0) None
            else {
              val df = model.terms.find(x => x._1 == q && x._2 == t).get._3
              val idf = math.log(1.0 +
                (model.nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
              Some(math.round(1000000.0 * idf * (tf.toDouble /
                (tf.toDouble + 1.2 * (0.25 + 0.75 * (ds.length.toDouble / avgdl))))))
            }
          }.sum
          if score != 0L || ws.distinct.exists(t => ds.contains(t))
        } yield (q, d) -> score).toMap
        assert(got == exp, s"bm25 divergence on corpus of ${corpus.size} docs")
      }
    }
  }

  test("property: dHash round-trips arbitrary rasters through the PNG codec") {
    // beyond the arithmetic gradient corpus: ARBITRARY deterministic
    // rasters (hash-formula pixels, any dims >= 1x1 incl. sub-grid sizes
    // where neighboring samples collapse onto the same pixel) must hash
    // identically whether computed from the in-memory raster or from the
    // PNG bytes after an ImageIO encode/decode round-trip — pinning both
    // the codec's losslessness and the sampler's floored-position contract
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      seed <- Gen.choose(0L, Long.MaxValue / 4)
    } yield (w, h, seed)
    def px(seed: Long, x: Int, y: Int): Int = {
      val v = seed + x.toLong * 2654435761L + y.toLong * 40503L
      (((v % 256) & 0xff) << 16 | (((v / 256) % 256) & 0xff).toInt << 8 |
        (((v / 65536) % 256) & 0xff).toInt).toInt
    }
    samples(genImg, 40).foreach { case (w, h, seed) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(seed, x, y))
      // driver-side dHash straight from the raster formula
      def lum(x: Int, y: Int): Int = {
        val p = px(seed, x * w / 9, y * h / 8)
        (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      }
      var exp = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        if (lum(x, y) < lum(x + 1, y)) exp |= 1L << (y * 8 + x)
      // engine-side: encode to real PNG bytes, hash through the query op
      val bytes = graft.ops.MultimodalOps.writeImageInMemory(img, "png")
      val got = graft.ops.MultimodalOps.dHash(
          Seq((1L, bytes)).toDF("doc_id", "payload"))
        .collect().head.dhash
      assert(got == exp, s"dhash diverges for ${w}x$h seed $seed")
    }
  }

  test("property: top-N count never exceeds its window total") {
    samples(genEvents, 3).foreach { evs =>
      val df = evs.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
      val counts = graft.ops.WindowOps.epochWindow(
        graft.ops.WindowOps.slidingCount(df, col("ts"), "10 minutes", "5 minutes", col("key")))
      val ranked = graft.ops.RankOps.topN(counts, 3, Seq(col("window_start")),
        Seq(col("cnt").desc, col("key").asc))
      val totals = counts.groupBy("window_start").agg(sum("cnt").as("total"))
      val bad = ranked.join(totals, "window_start").filter(col("cnt") > col("total"))
      assert(bad.count() == 0)
      // rank is dense per window starting at 1
      val rns = ranked.groupBy("window_start").agg(min("rn").as("mn"))
        .filter(col("mn") =!= 1L)
      assert(rns.count() == 0)
    }
  }

  test("pq_dists guards malformed vectors and fingerprints its codebook") {
    val cents: Array[Array[Array[Long]]] =
      Array(Array(Array(1L, 2L), Array(3L, 4L)), Array(Array(0L, 0L), Array(5L, 5L)))
    // a vector shorter than nSub*subDim must fail with a message naming
    // pq_dists and the expected shape, not an ArrayIndexOutOfBoundsException
    val short = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException] {
      graft.functions.PqDists.compute(short, cents, 2)
    }
    assert(e.getMessage.contains("pq_dists") && e.getMessage.contains(">= 4"))
    // the expression's string forms carry the codebook shape + content
    // fingerprint, so two registrations with different codebooks can never
    // render identically in a plan comparison
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1L, 2L, 3L, 4L),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))
    val ex1 = graft.functions.PqDists(child, cents, 2)
    val cents2 = Array(Array(Array(9L, 9L), Array(3L, 4L)), Array(Array(0L, 0L), Array(5L, 5L)))
    val ex2 = graft.functions.PqDists(child, cents2, 2)
    assert(ex1.toString.contains("2x2x2"))
    assert(ex1.toString != ex2.toString && ex1.sql != ex2.sql)
  }

  test("property: winnow_fps matches the naive polynomial reference for random text") {
    // reference: direct O(n·k) polynomial per position, min per 8-window,
    // first-occurrence dedup — the definition the single-pass rolling loop
    // must reproduce exactly
    def naive(s: String, k: Int): Array[Long] = {
      val m = s.length - k + 1
      if (m < 8) return null
      val hs = Array.tabulate(m) { j =>
        (0 until k).foldLeft(0L)((a, i) => a * 31L + s.charAt(j + i))
      }
      val seen = scala.collection.mutable.LinkedHashSet[Long]()
      (0 to m - 8).foreach(i => seen += (i until i + 8).map(hs).min)
      seen.toArray
    }
    val genCase = for {
      k <- Gen.choose(2, 12)
      n <- Gen.choose(0, 120)
      cs <- Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar))
    } yield (k, cs.mkString)
    samples(genCase, 300).foreach { case (k, s) =>
      val got = graft.functions.WinnowFps.compute(s, k)
      val exp = naive(s, k)
      assert((got == null) == (exp == null), s"null mismatch k=$k len=${s.length}")
      if (exp != null)
        assert(got.toSeq == exp.toSeq, s"fps diverge k=$k text=${s.take(40)}")
    }
  }

  test("property: winnowing guarantee holds for random embedded shared runs") {
    // any shared substring of length >= k+7 must share a fingerprint,
    // whatever surrounds it (Schleimer et al. 2003, theorem 1)
    val genCase = for {
      k <- Gen.choose(2, 12)
      shared <- Gen.listOfN(k + 7, Gen.choose('a', 'z')).map(_.mkString)
      pre1 <- Gen.listOfN(17, Gen.choose('A', 'Z')).map(_.mkString)
      suf1 <- Gen.listOfN(9, Gen.choose('A', 'Z')).map(_.mkString)
      pre2 <- Gen.listOfN(3, Gen.choose('0', '9')).map(_.mkString)
      suf2 <- Gen.listOfN(23, Gen.choose('0', '9')).map(_.mkString)
    } yield (k, pre1 + shared + suf1, pre2 + shared + suf2)
    samples(genCase, 200).foreach { case (k, d1, d2) =>
      val f1 = graft.functions.WinnowFps.compute(d1, k)
      val f2 = graft.functions.WinnowFps.compute(d2, k)
      assert(f1.toSet.intersect(f2.toSet).nonEmpty,
        s"k=$k: shared ${k + 7}-char run selected no common fingerprint")
    }
  }

  test("property: winnow_fps modular family — arbitrary unicode never throws, reference-exact") {
    // the out-of-contract path (any code point > 0xFF): same polynomial
    // reduced mod 1e9+7 over true CODE POINTS — a multilingual doc can
    // never fail a corpus pass, and the reference recomputation must
    // agree exactly (including surrogate-pair handling)
    val M = 1000000007L
    def naiveMod(s: String, k: Int): Array[Long] = {
      val cps = s.codePoints().toArray
      val m = cps.length - k + 1
      if (m < 8) return null
      val hs = Array.tabulate(m) { j =>
        (0 until k).foldLeft(0L)((a, i) => (a * 31L + cps(j + i)) % M)
      }
      val seen = scala.collection.mutable.LinkedHashSet[Long]()
      (0 to m - 8).foreach(i => seen += (i until i + 8).map(hs).min)
      seen.toArray
    }
    val anyCp: Gen[Int] = Gen.oneOf(
      Gen.choose(32, 126),                 // ascii
      Gen.choose(0xA0, 0x2FFF),            // BMP beyond latin-1
      Gen.choose(0x1F300, 0x1F64F))        // astral (surrogate pairs)
    val genCase = for {
      k <- Gen.choose(2, 12)
      n <- Gen.choose(0, 80)
      cps <- Gen.listOfN(n, anyCp)
      // force at least one wide code point so the modular family engages
      wide <- Gen.choose(0x100, 0x10FFF)
    } yield (k, new String((cps :+ wide).toArray.flatMap(Character.toChars), 0,
      (cps :+ wide).map(Character.charCount).sum))
    samples(genCase, 200).foreach { case (k, s) =>
      val got = graft.functions.WinnowFps.compute(s, k) // must not throw
      val exp = naiveMod(s, k)
      assert((got == null) == (exp == null), s"null mismatch k=$k")
      if (exp != null) {
        assert(got.toSeq == exp.toSeq, s"modular fps diverge k=$k")
        assert(got.forall(h => h >= 0L && h < M))
      }
    }
  }
}
