package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.queries.PipelineQueries

/**
 * Adversarial probes for the scale guardrails (r11 verdict #4): each
 * banded/scoped pass carries a hot-key cap or fail-fast that no driver
 * testdata ever trips — these corpora are BUILT to trip them, so a
 * future edit that silently removes a cap fails here, not at 100 TB.
 *
 * Contract under test, per guard:
 *  - ngramJaccardPairs: an over-cap scope must FAIL FAST (analysis-
 *    quality error before the quadratic self-join runs), and the same
 *    data must pass with the documented pairs once the cap is sized up;
 *  - dedupWinnow: a boilerplate fingerprint shared by > 20 docs is
 *    DROPPED (zero pairs from the degenerate family) while under-cap
 *    near-dups keep pairing;
 *  - contaminationImage: a train-side band held by > 20 images is
 *    unusable as a probe target (the boilerplate test probe reports
 *    nothing) while a clean band still matches.
 */
class GuardrailSpec extends SparkSpec {
  import spark.implicits._

  test("ngramJaccardPairs fails fast on an over-cap scope, passes when sized") {
    // 12 docs in one scope vs maxDocsPerScope=10 → conservative cap 9
    val hot = (0L until 12L).flatMap(d => Seq((d, "hot", 100L + d), (d, "hot", 7L)))
    val ok = Seq((100L, "ok", 1L), (100L, "ok", 2L), (100L, "ok", 3L),
      (101L, "ok", 1L), (101L, "ok", 2L), (101L, "ok", 4L))
    val sh = (hot ++ ok).toDF("doc_id", "lang", "h")
    val ex = intercept[Exception] {
      DedupOps.ngramJaccardPairs(sh, "lang", 0.0, maxDocsPerScope = 10L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("quadratic")),
      s"the fail-fast must name the quadratic blast radius, got: ${messages(ex)}")
    // same data, cap sized ~5% above the largest intended group → the
    // documented pairs come through (docs 100/101 share 2 of 3 shingles)
    val pairs = DedupOps.ngramJaccardPairs(sh, "lang", 0.0, maxDocsPerScope = 1000L)
      .select("doc_a", "doc_b", "common").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L, 2L)))
    assert(pairs.count { case (a, b, _) => a >= 100 || b >= 100 } == 1)
  }

  test("dedupWinnow drops a >20-doc boilerplate fingerprint family, keeps survivors") {
    // 25 byte-identical boilerplate docs: every fingerprint they produce
    // is shared by all 25 → over the ≤20 hot-fp cap → droppable
    val boiler = "the quarterly compliance banner text required on every page " * 4
    val clones = (0L until 25L).map(i => (i, boiler))
    // survivor family: two docs sharing a long run, distinct elsewhere
    // (disjoint vocabulary from the boilerplate so no cross-family fps)
    val shared = "zx qv jj kw pq mvnb zzyx wqpo 0123456789 zx qv jj kw pq mvnb"
    val survivors = Seq(
      (100L, s"AAAA BBBB CCCC DDDD $shared"),
      (101L, s"EEEE FFFF GGGG HHHH $shared"))
    val docs = (clones ++ survivors).toDF("doc_id", "text")
    // the corpus genuinely presses the cap: the clone family's
    // fingerprints each span 25 docs (a cap removal would pair all 300)
    val fps = PipelineQueries.winnowFps(docs, k = 12)
      .selectExpr("doc_id", "explode(fps) AS fp")
    val hottest = fps.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .agg(max("nd")).as[Long].head()
    assert(hottest == 25L, s"clone fps must span all 25 docs, got $hottest")
    val pairs = PipelineQueries.dedupWinnowOf(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)),
      s"only the under-cap survivor pair may surface, got $pairs")
  }

  test("contaminationImage caps a >20-image train band, keeps clean-band matches") {
    // learn each id's split through the SAME hash the query uses
    val splits = spark.range(400)
      .selectExpr("id AS doc_id",
        s"${DedupOps.md5Long("CAST(doc_id AS STRING)")} % 10 AS b")
      .selectExpr("doc_id",
        "CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split")
      .as[(Long, String)].collect()
    val train = splits.filter(_._2 == "train").map(_._1)
    val test = splits.filter(_._2 == "test").map(_._1)
    assert(train.length >= 31 && test.length >= 2)
    val boilerHash = 0x1111222233334444L // 30 train images share it
    val cleanHash = 0x5555666677778888L
    val hashed =
      (train.take(30).map(id => (id, boilerHash)) :+ (train(30), cleanHash)) ++
        // test probe 1: identical to the boilerplate band — every band hot
        // test probe 2: hamming-1 from the clean train image
        Seq((test(0), boilerHash), (test(1), cleanHash ^ 1L))
    val out = PipelineQueries.contaminationImageOf(
        hashed.toSeq.toDF("doc_id", "dhash"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((test(1), 1L, 1L)),
      s"the boilerplate probe must report nothing (all its bands are over " +
        s"the 20-image cap) and the clean probe exactly its one match, got $out")
  }

  test("bm25CertifiedRank fails fast past the query-batch cap; empty query frames serve empty") {
    // the certified serve's ladder is driver-side by design (per-level
    // certificate flags route queries between legs via isin literals) —
    // a corpus-sized query frame must trip the cap BEFORE any plan builds
    val docs = Seq((0L, "alpha beta gamma"), (1L, "alpha beta delta"),
      (2L, "gamma delta epsilon")).toDF("doc_id", "text")
    val over = (0 until PipelineQueries.CertBatchMax + 1)
      .map(q => (q.toLong, "alpha")).toDF("q_id", "term")
    val ex = intercept[IllegalArgumentException] {
      PipelineQueries.bm25TopKCertifiedOver(docs, 8, 5,
        qtermsOpt = Some(over))._1.collect()
    }
    assert(ex.getMessage.contains("delivery-sized query batches"),
      s"cap message missing: ${ex.getMessage}")
    // a batch whose docs all tokenize to nothing yields ZERO query terms:
    // the serve must return the empty serve frame, not crash on reduce
    // (the live runCertifiedServe micro-batch shape)
    val none = Seq.empty[(Long, String)].toDF("q_id", "term")
    val served = PipelineQueries.bm25TopKCertifiedOver(docs, 8, 5,
      qtermsOpt = Some(none))._1
    assert(served.columns.toSeq ==
      Seq("q_id", "doc_id", "score_micro", "rn") && served.isEmpty,
      "empty query frame must serve an empty frame with the serve schema")
  }
}
