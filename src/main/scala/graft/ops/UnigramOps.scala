package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Unigram language-model tokenizer TRAINING (Kudo, ACL 2018, "Subword
 * Regularization", arXiv:1804.10959 — the SentencePiece unigram model):
 * seed a piece inventory from frequent substrings, then alternate Viterbi
 * segmentation of the vocabulary (E-step) with count-based re-estimation
 * and pruning (M-step). The published complement to [[BpeOps]]: BPE
 * GROWS a vocabulary by greedy merges, unigram-LM SHRINKS one by
 * likelihood — the two tokenizer-training families a pipeline A/Bs.
 *
 * Exactness contract (the DSIR/NB micro-nat idiom): piece scores are
 * log-probabilities quantized to integer micro-nats — `round(1e6·ln(p))`,
 * HALF_UP away from zero on both engines — so the Viterbi DP downstream
 * is PURE INTEGER arithmetic and bit-identical to the oracle's
 * position-unrolled restatement by construction. `ln` inputs are exact
 * integer ratios (one IEEE division of two integer-valued doubles), so
 * the quantization carries the suite's documented ≤2-ulp libm margin and
 * nothing else. Hard-EM (Viterbi counts, not forward-backward
 * expectations) keeps every statistic an integer; it is the "viterbi
 * mode" SentencePiece itself ships for deterministic encoding.
 *
 * Tie-breaks, pinned identically in both engines: the forward DP keeps
 * the MAX path score (value ties collapse); the backtrack takes the
 * LONGEST piece among value-achieving candidates (k DESC). Seed
 * selection: every single character plus the top-[[SeedMulti]]
 * multi-character substrings by (count DESC, piece ASC). M-step prune:
 * a multi-character piece with zero Viterbi count is dropped;
 * single characters are never dropped (segmentation feasibility), and
 * scores are Laplace-smoothed — `(cnt+1)/(total+|V|)` — so kept-but-
 * unused pieces stay finite.
 *
 * Scale shape: the corpus pays ONE word-count aggregation (the
 * [[BpeOps]] property that makes tokenizer training tractable at
 * 100 TB); every EM round is a narrow per-word scan of the VOCABULARY
 * under a broadcast score map, and the only collects are MODEL-sized —
 * the piece table is bounded by |alphabet| + [[SeedMulti]] by
 * construction, corpus-independent. Words longer than [[MaxWordLen]]
 * are routed around the subword model entirely (trained on and encoded
 * by neither engine) — the standard length filter real tokenizer
 * pipelines apply to URLs/DNA/base64 runs, and the bound that keeps the
 * oracle's position-unrolled DP finite.
 */
object UnigramOps {

  /** Longest piece the model may contain (DP branching factor). */
  val MaxPieceLen: Int = 4

  /** Words longer than this are excluded from training AND encoding —
    * the documented model contract (see class doc), mirrored by the
    * oracle's `length(word) <= MaxWordLen` filter. */
  val MaxWordLen: Int = 12

  /** Multi-character seed pieces kept (plus every single character). */
  val SeedMulti: Int = 64

  /** Fixed hard-EM rounds (the oracle unrolls one DP per round). */
  val EmRounds: Int = 2

  /** `round(1e6·ln(x))` with HALF_UP (away-from-zero) rounding — the
    * quantization both engines state identically (Spark/DuckDB `round`
    * and java BigDecimal HALF_UP all round halves away from zero). */
  private[graft] def qln(x: Double): Long =
    java.math.BigDecimal.valueOf(1000000.0 * math.log(x))
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** All substring occurrences (piece length 1..[[MaxPieceLen]]) of the
    * word table as (freq, piece) rows — the seed-counting explode,
    * vocabulary-sized. `sequence(1, 0)` would DESCEND in Spark (the
    * [[BpeOps]] footgun), hence the length guard per k. */
  private[graft] def substrings(vocab: DataFrame): DataFrame =
    vocab.selectExpr("freq",
      s"""explode(flatten(transform(sequence(1, $MaxPieceLen), k ->
         |  IF(length(word) >= k,
         |     transform(sequence(1, length(word) - k + 1), i -> substring(word, i, k)),
         |     CAST(array() AS ARRAY<STRING>))))) AS piece""".stripMargin)

  /** Score floor for characters the model never saw: far below any real
    * piece (the worst Laplace-smoothed score at petabyte counts is
    * ≳ −60 micro-mega-nats), yet safe against Long overflow for any
    * MaxWordLen-bounded path sum. An unknown char segments as its own
    * single-character piece at this floor — the <unk> convention — so
    * the frozen-model scorer is TOTAL on real multilingual ingest (one
    * exotic document must not kill a corpus-wide pass; the WinnowFps
    * out-of-contract lesson). In-vocabulary text never touches the
    * floor, so training/encode paths are bit-unchanged. */
  private[graft] val UnkScore: Long = -10000000000L

  /** Viterbi segmentation of one word under integer micro-nat scores:
    * maximize the path score; break value ties toward the LONGEST piece
    * (k DESC) at each backtrack step. Characters missing from the model
    * traverse as single <unk> pieces at [[UnkScore]], so the function is
    * total; for in-model text every position is reachable through real
    * pieces and the floor is never taken. */
  private[graft] def segment(word: String, score: Map[String, Long]): List[String] = {
    val n = word.length
    val unreach = Long.MinValue
    def pieceScore(from: Int, to: Int): Option[Long] = {
      val piece = word.substring(from, to)
      score.get(piece).orElse(
        if (to - from == 1 && !score.contains(piece)) Some(UnkScore) else None)
    }
    val best = Array.fill(n + 1)(unreach)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      var k = 1
      val kMax = math.min(MaxPieceLen, p)
      while (k <= kMax) {
        if (best(p - k) != unreach) {
          pieceScore(p - k, p) match {
            case Some(s) => if (best(p - k) + s > best(p)) best(p) = best(p - k) + s
            case None => ()
          }
        }
        k += 1
      }
      p += 1
    }
    var out = List.empty[String]
    p = n
    while (p > 0) {
      var k = math.min(MaxPieceLen, p)
      var done = false
      while (!done && k >= 1) {
        if (best(p - k) != unreach &&
            pieceScore(p - k, p).exists(s => best(p - k) + s == best(p))) {
          out = word.substring(p - k, p) :: out
          p -= k
          done = true
        } else k -= 1
      }
      require(done, s"unreachable position $p in '$word'")
    }
    out
  }

  /** Train the unigram model on a (word, freq) table: seed → [[EmRounds]]
    * hard-EM rounds → (final model rows (piece, cnt, score_micro) in
    * piece order, final score map). `cnt` is the last round's Viterbi
    * usage count (0 for kept-but-unused single characters). */
  private[graft] def train(vocab: DataFrame): (Seq[(String, Long, Long)], Map[String, Long]) =
    trainOn(checkpointedWords(vocab))

  /** The one vocabulary materialization every training/apply pass reads —
    * factored so [[segmentCounts]] can share it with [[trainOn]] instead
    * of re-running the corpus word-count for its final segment map (r17:
    * the apply path paid the corpus tokenize+aggregate twice). */
  private def checkpointedWords(vocab: DataFrame): DataFrame =
    vocab.select(col("word"), col("freq").cast("long").as("freq"))
      .localCheckpoint(true)

  private def trainOn(words: DataFrame): (Seq[(String, Long, Long)], Map[String, Long]) = {
    val spark = words.sparkSession
    import spark.implicits._
    // seed: every single character + top-SeedMulti multi-char substrings.
    // Both collects are model-sized (|alphabet| and SeedMulti rows).
    val counts = substrings(words).groupBy("piece").agg(sum("freq").as("cnt"))
    val chars = counts.filter(length(col("piece")) === 1).collect()
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(SeedMulti).collect()
    val sel = (chars ++ multi).map(r => (r.getString(0), r.getLong(1))).toSeq
    val tot = sel.map(_._2).sum
    var score: Map[String, Long] =
      sel.map { case (pc, c) => pc -> qln(c.toDouble / tot.toDouble) }.toMap
    var model: Seq[(String, Long, Long)] = Seq.empty
    val wordsDs = words.select("word", "freq").as[(String, Long)]
    var r = 1
    while (r <= EmRounds) {
      val sc = score
      // E-step: vocab-sized narrow scan; M-step counts collect is
      // model-bounded (≤ |model| rows by construction)
      val cnt = wordsDs
        .flatMap { case (w, f) => segment(w, sc).map(pc => (pc, f)) }
        .toDF("piece", "freq")
        .groupBy("piece").agg(sum("freq").as("cnt"))
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      val kept = score.keysIterator
        .filter(pc => pc.length == 1 || cnt.getOrElse(pc, 0L) > 0L)
        .toSeq.sorted
      val totR = kept.iterator.map(pc => cnt.getOrElse(pc, 0L)).sum
      val v = kept.size
      model = kept.map { pc =>
        val c = cnt.getOrElse(pc, 0L)
        (pc, c, qln((c + 1).toDouble / (totR + v).toDouble))
      }
      score = model.map { case (pc, _, s) => pc -> s }.toMap
      r += 1
    }
    (model, score)
  }

  /** Forward-backward EXPECTED piece counts of one word under a real
    * log-prob model — the E-step of SOFT EM (Kudo, ACL 2018 §3.2, the
    * published forward-backward variant; [[train]] above is the "viterbi
    * mode" hard-EM twin). alpha(j) = Σ_k alpha(j−k)·p(piece(j−k, j)),
    * beta mirrored, E[piece used at (i, j)] = alpha(i)·p·beta(j)/alpha(n),
    * summed per distinct piece string. Probability space without
    * rescaling is safe at this model's bounds: path products are at
    * worst ≈ e^(−25·MaxWordLen) ≫ Double.MinPositiveValue. Returns empty
    * for a word the model cannot segment (never the case for the seeds,
    * which keep every single character). */
  private[graft] def expectedCounts(word: String,
      logp: Map[String, Double]): Seq[(String, Double)] = {
    val n = word.length
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var k = 1
      val kMax = math.min(MaxPieceLen, j)
      while (k <= kMax) {
        logp.get(word.substring(j - k, j))
          .foreach(lp => alpha(j) += alpha(j - k) * math.exp(lp))
        k += 1
      }
      j += 1
    }
    beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var k = 1
      val kMax = math.min(MaxPieceLen, n - i)
      while (k <= kMax) {
        logp.get(word.substring(i, i + k))
          .foreach(lp => beta(i) += math.exp(lp) * beta(i + k))
        k += 1
      }
      i -= 1
    }
    val z = alpha(n)
    if (z <= 0.0) return Seq.empty
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    i = 0
    while (i < n) {
      var k = 1
      val kMax = math.min(MaxPieceLen, n - i)
      while (k <= kMax) {
        val piece = word.substring(i, i + k)
        logp.get(piece).foreach { lp =>
          val e = alpha(i) * math.exp(lp) * beta(i + k) / z
          if (e > 0.0) acc.update(piece, acc.getOrElse(piece, 0.0) + e)
        }
        k += 1
      }
      i += 1
    }
    acc.toSeq.sortBy(_._1)
  }

  /** One SOFT-EM round over the (word, freq) vocabulary: distributed
    * expected counts (each word's forward-backward runs in the same
    * narrow vocab scan the hard E-step uses; the counts collect is
    * model-bounded) followed by the Laplace-smoothed M-step in doubles.
    * Returns (expected counts, re-estimated log-prob model).
    *
    * SPEC-PARITY feature, deliberately NOT oracle-gated: SURVEY §14
    * adjudicated soft-EM non-hash-gateable under the suite's exactness
    * contract (chained libm exp/÷/Σ breaks the ≤2-ulp margin argument;
    * exact rationals overflow HUGEINT at length-12 words), so this ships
    * in the adjudication's own recommended form — UnigramSpec compares
    * the distributed round against an INDEPENDENT driver-local reference
    * (brute-force enumeration of every segmentation path, probability-
    * weighted) at a stated tolerance of **1e-9 relative per count**
    * (covers the two float divergence channels: partition-order summation
    * in the groupBy and DP-vs-enumeration association order). Hard-EM
    * [[train]] is unchanged as the oracle-gated default. */
  private[graft] def softEmRound(vocab: DataFrame,
      score: Map[String, Double]): (Map[String, Double], Map[String, Double]) = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val sc = score
    val exp = vocab.select(col("word"), col("freq").cast("long").as("freq"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        expectedCounts(w, sc).map { case (pc, e) => (pc, e * f) } }
      .toDF("piece", "c")
      .groupBy("piece").agg(sum("c").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // M-step mirrors the hard path: multi-char pieces with (numerically)
    // zero expectation drop, single characters always survive
    val kept = score.keysIterator
      .filter(pc => pc.length == 1 || exp.getOrElse(pc, 0.0) > 0.0)
      .toSeq.sorted
    val tot = kept.iterator.map(pc => exp.getOrElse(pc, 0.0)).sum
    val v = kept.size
    val model = kept.map(pc =>
      pc -> math.log((exp.getOrElse(pc, 0.0) + 1.0) / (tot + v))).toMap
    (exp, model)
  }

  /** Soft-EM training entry: the hard path's seed inventory (every
    * single character + top-[[SeedMulti]] substrings) with real-log
    * seed scores, then `rounds` [[softEmRound]]s. Same scale shape as
    * [[train]]: one corpus word-count upstream, vocab-sized scans per
    * round, model-sized collects. */
  private[graft] def softEm(vocab: DataFrame, rounds: Int = EmRounds)
      : Map[String, Double] = {
    val counts = substrings(vocab.select(col("word"),
        col("freq").cast("long").as("freq")))
      .groupBy("piece").agg(sum("freq").as("cnt"))
    val chars = counts.filter(length(col("piece")) === 1).collect()
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc).limit(SeedMulti).collect()
    val sel = (chars ++ multi).map(r => (r.getString(0), r.getLong(1))).toSeq
    val tot = sel.map(_._2).sum
    var score: Map[String, Double] =
      sel.map { case (pc, c) => pc -> math.log(c.toDouble / tot.toDouble) }.toMap
    (1 to rounds).foreach { _ => score = softEmRound(vocab, score)._2 }
    score
  }

  /** Tokenizer APPLY at the vocabulary level: train, then emit each
    * word's Viterbi piece count under the FINAL scores as (word, n_tok)
    * — the model-sized table a corpus token-count pass joins against
    * (the [[BpeOps.segmentCounts]] trick: the corpus never pays the DP,
    * only a word-key broadcast join). */
  private[graft] def segmentCounts(vocab: DataFrame): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val words = checkpointedWords(vocab)
    val (_, score) = trainOn(words)
    val sc = score
    words.select("word").as[String]
      .map(w => (w, segment(w, sc).length.toLong)).toDF("word", "n_tok")
  }
}
