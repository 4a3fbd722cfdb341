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
}
