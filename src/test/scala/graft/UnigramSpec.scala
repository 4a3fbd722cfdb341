package graft

import org.apache.spark.sql.functions._

import graft.ops.UnigramOps
import graft.queries.PipelineQueries

/** Unigram-LM tokenizer (Kudo 2018): Viterbi segmentation invariants,
  * the pinned longest-piece tie-break, model-consistency of the trained
  * inventory, and the encode recomposition. Engine parity is the DuckDB
  * oracle gate's job (uni_seed / uni_learn / uni_encode). */
class UnigramSpec extends SparkSpec {

  test("segment: pieces recompose the word, obey the length bounds, and maximize the path score") {
    val model = Map("a" -> -5L, "b" -> -7L, "c" -> -9L, "ab" -> -8L, "abc" -> -11L, "bc" -> -13L)
    Seq("a", "ab", "abc", "abcabc", "cba", "aaaa", "abcba").foreach { w =>
      val pieces = UnigramOps.segment(w, model)
      assert(pieces.mkString == w, s"pieces must recompose '$w'")
      assert(pieces.forall(model.contains), s"every piece of '$w' must be in the model")
      assert(pieces.forall(_.length <= UnigramOps.MaxPieceLen))
    }
    // abc as one piece (-11) beats ab+c (-17), a+bc (-18), a+b+c (-21)
    assert(UnigramOps.segment("abc", model) == List("abc"))
    // path optimality: ab+ab (-16) beats abc+... (no: "ca" missing) — abcab
    // must end in ab (score ab -8) after abc? abc+ab = -19 vs ab+c+ab = -25
    assert(UnigramOps.segment("abcab", model) == List("abc", "ab"))
  }

  test("segment: value ties break toward the LONGEST piece at each backtrack step") {
    // "ab" (-10) exactly ties "a"+"b" (-4 + -6): the pinned tie-break
    // keeps the longer piece, matching the oracle's MAX(k)
    val tied = Map("a" -> -4L, "b" -> -6L, "ab" -> -10L)
    assert(UnigramOps.segment("ab", tied) == List("ab"))
    // and transitively inside a longer word
    assert(UnigramOps.segment("abab", tied) == List("ab", "ab"))
  }

  test("segment is total: unknown characters traverse as single <unk> pieces, never preferred") {
    val model = Map("a" -> -5L, "b" -> -7L, "ab" -> -8L)
    // a character the model never saw must not throw — one exotic doc
    // cannot kill a corpus-wide frozen-model scoring pass
    assert(UnigramOps.segment("aXb", model) == List("a", "X", "b"))
    assert(UnigramOps.segment("XY", model) == List("X", "Y"))
    assert(UnigramOps.segment("日本ab", model) == List("日", "本", "ab"))
    // the floor is never taken when a real path exists: "ab" stays one piece
    assert(UnigramOps.segment("ab", model) == List("ab"))
    // and the scorer built on it is total too
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "ab 日本語 ab"), (2L, "ab ab")).toDF("doc_id", "text")
    val scored = PipelineQueries.uniScore(docs, model).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(scored(1L) == 1L + 3L + 1L && scored(2L) == 2L)
  }

  test("uni_learn: chars kept, no zero-count multi-char piece, scores restate the Laplace formula") {
    val rows = PipelineQueries.uniLearn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pieces = rows.map(_.getAs[String]("piece")).toSet
    // every character of every kept piece is itself a kept piece
    // (feasibility invariant: chars are never pruned)
    pieces.foreach(p => p.foreach(c => assert(pieces.contains(c.toString))))
    rows.foreach { r =>
      val (p, c) = (r.getAs[String]("piece"), r.getAs[Long]("cnt"))
      assert(p.length <= UnigramOps.MaxPieceLen)
      assert(c >= 0L)
      if (p.length > 1) assert(c > 0L, s"zero-count multi-char piece '$p' must be pruned")
    }
    // scores restate round(1e6·ln((cnt+1)/(tot+|V|))) exactly
    val tot = rows.map(_.getAs[Long]("cnt")).sum
    val v = rows.length
    rows.foreach { r =>
      val expect = UnigramOps.qln((r.getAs[Long]("cnt") + 1).toDouble / (tot + v).toDouble)
      assert(r.getAs[Long]("score_micro") == expect)
    }
  }

  test("uni_encode: char totals recompose the filtered corpus and piece counts are bounded") {
    val enc = PipelineQueries.uniEncode(spark, sf0001).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val (w, t, c) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))
      assert(w <= t && t <= c, "pieces per word in [1, len]")
      // at most MaxPieceLen chars per piece
      assert(t * UnigramOps.MaxPieceLen >= c)
    }
    // n_chars restates the word explode under the same length filter
    val chars = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "explode(filter(split(trim(text), ' '), x -> x <> '')) AS word")
      .filter(length(col("word")) <= UnigramOps.MaxWordLen)
      .groupBy("doc_id").agg(sum(length(col("word")).cast("long")).as("c"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("c")).toMap
    enc.foreach { r =>
      assert(r.getAs[Long]("n_chars") == chars(r.getAs[Long]("doc_id")))
    }
  }

  test("tok_ab: covers the filtered vocabulary and restates both tokenizers' counts") {
    val ab = PipelineQueries.tokAb(spark, sf0001).collect()
    val vocab = graft.sources.Tables.documents(spark, sf0001)
      .selectExpr("explode(filter(split(trim(text), ' '), x -> x <> '')) AS word")
      .filter(length(col("word")) <= UnigramOps.MaxWordLen)
      .groupBy("word").count().collect()
    assert(ab.length == vocab.length, "one row per filtered vocabulary word")
    // the unigram side restates a fresh segmentation under uni_learn's model
    val model = PipelineQueries.uniLearn(spark, sf0001).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Long]("score_micro")).toMap
    ab.foreach { r =>
      val (w, len) = (r.getAs[String]("word"), r.getAs[Long]("len"))
      assert(len == w.length)
      assert(r.getAs[Long]("n_bpe") >= 1L && r.getAs[Long]("n_bpe") <= len)
      assert(r.getAs[Long]("n_uni") == UnigramOps.segment(w, model).length.toLong)
      assert(r.getAs[Long]("diff") == r.getAs[Long]("n_bpe") - r.getAs[Long]("n_uni"))
    }
  }

  test("uni_fertility: language rows recompose the corpus encode and restate the micro-ratios") {
    val rows = PipelineQueries.uniFertility(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val enc = PipelineQueries.uniEncode(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == enc.length.toLong,
      "every encoded doc lands in exactly one language row")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
      enc.map(_.getAs[Long]("n_tokens")).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("fertility_micro") ==
        r.getAs[Long]("n_tokens") * 1000000L / r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("compression_micro") ==
        r.getAs[Long]("n_chars") * 1000000L / r.getAs[Long]("n_tokens"))
    }
  }

  test("uni_seed: ranking is (cnt DESC, piece ASC) over multi-char substrings only") {
    val rows = PipelineQueries.uniSeed(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val p = r.getAs[String]("piece")
      assert(p.length >= 2 && p.length <= UnigramOps.MaxPieceLen)
      assert(r.getAs[Long]("cnt") >= r.getAs[Long]("n_forms"),
        "freq-weighted count dominates the unweighted occurrence count")
    }
    val keys = rows.map(r => (-r.getAs[Long]("cnt"), r.getAs[String]("piece")))
    assert(keys.sameElements(keys.sorted), "rows arrive in (cnt DESC, piece ASC) order")
  }

  // ---- soft-EM (forward-backward) — spec-parity per the SURVEY §14
  // adjudication: non-hash-gateable (chained libm exp/÷/Σ), so the gate
  // is an INDEPENDENT driver-local reference at a stated tolerance.

  /** Stated tolerance: 1e-9 relative (see [[UnigramOps.softEmRound]]'s
    * scaladoc) — covers partition-order summation in the distributed
    * groupBy and DP-vs-enumeration association order, nothing else. */
  private def close(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  /** Every segmentation of `w` into model pieces — the brute-force path
    * enumeration the forward-backward DP is checked against (bounded:
    * words are short in these fixtures; ≤ 2^(n−1) paths). */
  private def allPaths(w: String, logp: Map[String, Double]): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(UnigramOps.MaxPieceLen, w.length)).flatMap { k =>
      val pc = w.substring(0, k)
      if (logp.contains(pc)) allPaths(w.substring(k), logp).map(pc :: _)
      else Nil
    }

  /** Independent expected-count reference: probability-weight every
    * enumerated path, sum each piece's occurrences. */
  private def bruteExpected(w: String, logp: Map[String, Double]): Map[String, Double] = {
    val paths = allPaths(w, logp)
    val weights = paths.map(p => math.exp(p.map(logp).sum))
    val z = weights.sum
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    paths.zip(weights).foreach { case (p, wt) =>
      p.foreach(pc => acc.update(pc, acc.getOrElse(pc, 0.0) + wt / z)) }
    acc.toMap
  }

  test("soft-EM expected counts match brute-force path enumeration within the stated tolerance") {
    val spark0 = spark
    import spark0.implicits._
    // ambiguous model on purpose: "abab" has paths through a|b, ab, aba,
    // bab, abab — the forward-backward must weight all of them
    val logp = Map("a" -> -1.2, "b" -> -1.7, "ab" -> -2.1, "ba" -> -2.9,
      "aba" -> -3.3, "bab" -> -3.9, "abab" -> -4.4)
    val vocab = Seq(("abab", 7L), ("aba", 3L), ("bbaa", 2L), ("a", 5L))
      .toDF("word", "freq")
    val (got, model) = UnigramOps.softEmRound(vocab, logp)
    val exp = scala.collection.mutable.HashMap.empty[String, Double]
    Seq(("abab", 7L), ("aba", 3L), ("bbaa", 2L), ("a", 5L)).foreach { case (w, f) =>
      bruteExpected(w, logp).foreach { case (pc, e) =>
        exp.update(pc, exp.getOrElse(pc, 0.0) + e * f) }
    }
    assert(got.keySet == exp.keySet,
      s"piece support must match: ${got.keySet} vs ${exp.keySet}")
    got.foreach { case (pc, e) =>
      assert(close(e, exp(pc)), s"piece '$pc': $e vs ${exp(pc)}") }
    // per-word DP internal check too (no aggregation in the way)
    val one = UnigramOps.expectedCounts("abab", logp).toMap
    val oneExp = bruteExpected("abab", logp)
    assert(one.keySet == oneExp.keySet &&
      one.forall { case (pc, e) => close(e, oneExp(pc)) })
    // M-step: smoothed probabilities of the kept inventory sum to 1
    val psum = model.valuesIterator.map(math.exp).sum
    assert(close(psum, 1.0), s"model must normalize, got $psum")
  }

  test("soft-EM on an unambiguous vocabulary equals hard-EM Viterbi counts") {
    val spark0 = spark
    import spark0.implicits._
    // single-character model: every word has exactly ONE segmentation,
    // so expectations must be integers equal to the Viterbi counts
    val logp = Map("x" -> -1.0, "y" -> -2.0)
    val vocab = Seq(("xxy", 4L), ("yx", 3L)).toDF("word", "freq")
    val (got, _) = UnigramOps.softEmRound(vocab, logp)
    val hard = Map(
      "x" -> (2L * 4L + 1L * 3L).toDouble, // from Viterbi: xxy→x,x,y ×4; yx→y,x ×3
      "y" -> (1L * 4L + 1L * 3L).toDouble)
    assert(got.keySet == hard.keySet &&
      got.forall { case (pc, e) => close(e, hard(pc)) },
      s"unambiguous expectations must be exact Viterbi counts: $got")
  }

  test("softEm trains end-to-end: kept inventory normalizes and single chars survive") {
    val spark0 = spark
    import spark0.implicits._
    val vocab = Seq(("abab", 9L), ("baba", 4L), ("aabb", 2L), ("ab", 11L))
      .toDF("word", "freq")
    val model = UnigramOps.softEm(vocab, rounds = 2)
    assert(Set("a", "b").subsetOf(model.keySet),
      "single characters are never pruned")
    val psum = model.valuesIterator.map(math.exp).sum
    assert(close(psum, 1.0), s"trained model must normalize, got $psum")
    // the dominant bigram survives training with a better score than
    // either character path it competes with
    assert(model.contains("ab") && model("ab") > model("a") + model("b"),
      "the corpus-dominant piece must out-score its character decomposition")
  }
}
