package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SamplingOps}
import graft.queries.PipelineQueries
import graft.sources.Tables

/** Deterministic sampling, cross-doc span stats, centroid aggregation, and
  * native-expression parity with the SQL formulations they replaced. */
class SamplingSpanSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedQuota: deterministic, quota-bounded, hash-ranked") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val key = "concat(CAST(doc_id AS STRING), '|', md5(text))"
    val a = SamplingOps.stratifiedQuota(docs, "lang", key, 5)
      .select("doc_id", "lang", "rk").as[(Long, String, Long)].collect().toSet
    val b = SamplingOps.stratifiedQuota(docs, "lang", key, 5)
      .select("doc_id", "lang", "rk").as[(Long, String, Long)].collect().toSet
    assert(a == b, "same corpus must sample identically on every run")
    val perLang = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ <= 5) && perLang.nonEmpty)
    assert(a.forall { case (_, _, rk) => rk >= 1 && rk <= 5 })
  }

  test("stratifiedQuota: growth displaces at most one sampled row per stratum") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val key = "concat(CAST(doc_id AS STRING), '|', md5(text))"
    val full = SamplingOps.stratifiedQuota(docs, "lang", key, 5)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    // drop one arbitrary non-sampled doc: the sample must be unchanged
    val victim = docs.join(
        SamplingOps.stratifiedQuota(docs, "lang", key, 5).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].head()
    val smaller = SamplingOps.stratifiedQuota(
        docs.filter(col("doc_id") =!= victim), "lang", key, 5)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    assert(smaller == full, "removing an unsampled doc must not change the sample")
  }

  test("stratifiedQuota: hash-slab prefilter returns the identical sample") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val key = "concat(CAST(doc_id AS STRING), '|', md5(text))"
    val exact = SamplingOps.stratifiedQuota(docs, "lang", key, 5)
      .select("doc_id", "lang", "rk").as[(Long, String, Long)].collect().toSet
    // generous slab: quota 5 of min-stratum ≈ 8 docs at sf0.001 → rate 0.9
    // still thins the sort input while provably containing every winner
    val thinned = SamplingOps.stratifiedQuota(docs, "lang", key, 5, Some(0.9))
      .select("doc_id", "lang", "rk").as[(Long, String, Long)].collect().toSet
    assert(thinned == exact, "prefiltered quota sample must equal the exact one")
  }

  test("hashRateSample: deterministic, per-stratum rates, sane frequency") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val key = "concat(CAST(doc_id AS STRING), '|', md5(text))"
    val rate = "CASE WHEN lang = 'en' THEN 0.5 ELSE 0.1 END"
    val a = SamplingOps.hashRateSample(docs, key, rate)
      .select("doc_id").as[Long].collect().toSet
    val b = SamplingOps.hashRateSample(docs, key, rate)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    val en = docs.filter("lang = 'en'").count().toDouble
    val enKept = SamplingOps.hashRateSample(docs.filter("lang = 'en'"), key, "0.5").count()
    // md5 residues are uniform; 3-sigma Bernoulli bound at n≈50
    assert(math.abs(enKept / en - 0.5) < 0.25, s"en keep rate ${enKept / en}")
  }

  test("spanStats counts cross-doc shared spans, not intra-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f g h"),        // shares span "a b c d e" with doc 2
      (2L, "a b c d e x y z"),
      (3L, "p q r s t u v w"),        // no overlap
      (4L, "m m m m m m m m")         // intra-doc repetition only
    ).toDF("doc_id", "text")
    val by = DedupOps.spanStats(DedupOps.shingleHashes(docs, "text", 5))
      .select("doc_id", "n_spans", "n_shared")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(by(1L) == ((4L, 1L)))   // spans abcde bcdef cdefg defgh; only abcde shared
    assert(by(2L) == ((4L, 1L)))
    assert(by(3L) == ((4L, 0L)))
    assert(by(4L) == ((1L, 0L)))   // distinct spans collapse to one, unshared
  }

  test("spanScrub removes exactly the cross-doc shared spans, keeps order") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // "a b c d e" shared with doc 2 → a..e removed
      (2L, "x y z a b c d e"),
      (3L, "p q r s t u v w"),   // untouched
      (4L, "short doc")          // < 5 tokens: passes through whole
    ).toDF("doc_id", "text")
    val got = DedupOps.spanScrub(docs, "text", 5)
      .select("doc_id", "n_tok", "n_removed", "text_clean")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((8L, 5L, "f g h")))
    assert(got(2L) == ((8L, 5L, "x y z")))
    assert(got(3L) == ((8L, 0L, "p q r s t u v w")))
    assert(got(4L) == ((2L, 0L, "short doc")))
  }

  test("salient_terms ranks by integer tf*1e6 div df with exact ties") {
    val terms = PipelineQueries.salientTerms(spark, sf0001)
    val rows = terms.select("doc_id", "tf", "df", "score", "rn")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._5 <= 3))
    assert(rows.forall { case (_, tf, df, score, _) => score == tf * 1000000L / df })
    // a term appearing in every doc scores lower than a same-tf rarer term
    val perDoc = rows.groupBy(_._1)
    assert(perDoc.values.forall(g => g.map(_._5).sorted.sameElements(1L to g.size)))
  }

  test("pagerankFixed: exact integer ranks on a hand-computed graph") {
    // 3-cycle 1→2→3→1 plus feeder 4→1; ranks in 1e-6 units, 3 rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val got = graft.ops.ClusterOps.pagerankFixed(edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1127500L,  // 150000 + 85% of (r2(3) + r2(4)) with floor div
      2L -> 1108375L,
      3L -> 1614125L,
      4L -> 150000L)) // no in-edges: exactly the base mass
    val again = graft.ops.ClusterOps.pagerankFixed(edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(again == got)
    // the forced DISTRIBUTED rounds (localMaxEdges = 0) must be bit-equal
    // to the default driver-local loop — the same integer recurrence
    val dist = graft.ops.ClusterOps.pagerankFixed(edges, 3, localMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == got)
  }

  test("containmentPairs finds an excerpt at containment 1.0, directed") {
    val article = (1 to 30).map(i => s"w$i").mkString(" ")
    val excerpt = (5 to 14).map(i => s"w$i").mkString(" ")      // inside article
    val unrelated = (100 to 120).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, article), (2L, excerpt), (3L, unrelated))
      .toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(docs, "text", 5, 3, 0.9)
      .select("contained", "container", "containment")
      .as[(Long, Long, Double)].collect()
    // excerpt ⊂ article at 1.0; the article is NOT contained in the excerpt
    assert(got.toSeq == Seq((2L, 1L, 1.0)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val a = Seq((1L, "same"), (2L, "gone"), (3L, "before")).toDF("doc_id", "text")
    val b = Seq((1L, "same"), (3L, "after"), (4L, "new")).toDF("doc_id", "text")
    val got = DedupOps.snapshotDiff(a, b, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "removed",
      3L -> "changed", 4L -> "added"))
  }

  test("lm_fluency: exact MLE bigram micro-probabilities") {
    // corpus = one doc "a b a c": bigrams (a b), (b a), (a c);
    // prefix counts a=2, b=1 → p = 500000, 1000000, 500000
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("__lm_docs")
    val occ = docs
      .selectExpr("doc_id", "filter(split(trim(text), ' '), t -> t <> '') AS w")
      .selectExpr("doc_id", "w", "explode(sequence(1, size(w) - 1)) AS i")
      .selectExpr("doc_id",
        s"${DedupOps.md5Long("element_at(w, i)")} AS h1",
        s"${DedupOps.md5Long("concat(element_at(w, i), ' ', element_at(w, i + 1))")} AS h2")
    val c2 = occ.groupBy("h2").agg(count(lit(1)).as("c2"))
    val c1 = occ.groupBy("h1").agg(count(lit(1)).as("c1"))
    val got = occ.join(c2, "h2").join(c1, "h1")
      .selectExpr("c2 * 1000000L div c1 AS p")
      .as[Long].collect().sorted.toSeq
    assert(got == Seq(500000L, 500000L, 1000000L))
    val fl = graft.queries.PipelineQueries.lmFluency(spark, sf0001)
      .select("n_bigrams", "sum_p", "fluency")
      .as[(Long, Long, Double)].collect()
    assert(fl.nonEmpty)
    assert(fl.forall { case (n, s, f) =>
      s >= n && s <= n * 1000000L && f == s.toDouble / n })
  }

  test("embed_centroids: exact integer sums and consistent means") {
    val cent = PipelineQueries.embedCentroids(spark, sf0001)
    val rows = cent.select("label", "dim", "n", "s", "c_mean")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 >= 1) && rows.forall(_._2 <= 64))
    // every (label, dim) row carries the same n as its label's vector count
    val perLabel = Tables.embeddings(spark, sf0001)
      .groupBy(col("label").cast("long").as("label")).count()
      .as[(Long, Long)].collect().toMap
    assert(rows.forall { case (l, _, n, _, _) => perLabel(l) == n })
    assert(rows.forall { case (_, _, n, s, m) => m == s.toDouble / n.toDouble })
  }

  test("winnowing: any shared 12-char substring shares a fingerprint") {
    // two otherwise-unrelated documents embedding the same 12-char run
    // at different offsets MUST intersect in at least one selected
    // fingerprint (the w+k-1 guarantee of Schleimer et al. 2003)
    val shared = "THEQUICKFOXZ"
    val docs = Seq(
      (1L, s"aaaaaaa${shared}bbbbbbbbbbbb"),
      (2L, s"cccccccccccccccccc${shared}dddd"),
      (3L, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeee")
    ).toDF("doc_id", "text")
    val fps = PipelineQueries.winnowFps(docs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "shared 12-char substring must share a winnowed fingerprint")
    // the unrelated uniform document shares nothing with either
    assert(fps(3L).toSet.intersect(fps(1L).toSet ++ fps(2L).toSet).isEmpty)
  }

  test("winnow_fps fails loudly on bad signatures and out-of-contract text") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import graft.functions.WinnowFps
    // wrong arity: a clear AnalysisException naming the signature, not an
    // IndexOutOfBoundsException from exprs(1)
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      WinnowFps.build(Seq(Literal("abc")))
    }
    assert(e1.getMessage.contains("winnow_fps expects (text, k-literal)"))
    // non-foldable k: AnalysisException, not UnsupportedOperationException
    // from eval() on an unresolved attribute
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      WinnowFps.build(Seq(Literal("abc"),
        AttributeReference("k", org.apache.spark.sql.types.IntegerType)()))
    }
    assert(e2.getMessage.contains("k-literal"))
    // k above 12 breaches the signed-64 bound even for Latin-1 text:
    // rejected at build time, not wrapped at eval time
    val e4 = intercept[org.apache.spark.sql.AnalysisException] {
      WinnowFps.build(Seq(Literal("abc"), Literal(13)))
    }
    assert(e4.getMessage.contains("[1, 12]"))
    intercept[IllegalArgumentException] { WinnowFps(Literal("abc"), 13) }
    // Latin-1 stays inside the exact contract — and hashes CODE POINTS,
    // so the result equals hashing the equivalent char values
    assert(WinnowFps.compute("café au lait et crème café", 5) != null)
  }

  test("winnow_fps: out-of-contract text takes the modular family, not a task failure") {
    import graft.functions.WinnowFps
    // code points above 0xFF used to throw (failing the whole executor
    // task — one wide doc killed a corpus-wide pass, the r10 advice
    // finding); now the WHOLE document switches to the same polynomial
    // reduced mod 1e9+7: deterministic, non-null, bounded values
    val wide = WinnowFps.compute("€uro symbols €€€ survive now!", 5)
    assert(wide != null && wide.nonEmpty)
    assert(wide.forall(h => h >= 0L && h < 1000000007L),
      "modular-family fingerprints must stay inside [0, 1e9+7)")
    assert(wide.sameElements(WinnowFps.compute("€uro symbols €€€ survive now!", 5)),
      "modular family must be deterministic")
    // astral text (surrogate pairs) hashes CODE POINTS too, not UTF-16
    // halves — and likewise survives
    assert(WinnowFps.compute("😀 emoji corpus 😀 abcdefghijkl", 5) != null)
    // the winnowing guarantee holds WITHIN the wide family: a shared
    // >= k+7 (= 12-char) substring of wide text shares a fingerprint
    val shared = "héllo wörld€"
    val a = WinnowFps.compute(s"aaaaaaa${shared}bbbbbbbbbbbb", 5).toSet
    val b = WinnowFps.compute(s"cccccccccccccccccc${shared}dddd", 5).toSet
    assert(a.intersect(b).nonEmpty,
      "shared 12-char wide substring must share a modular fingerprint")
    // and in-contract documents are untouched by the fallback: exact
    // family values can exceed the modulus (bit-identical to the oracle)
    val ascii = WinnowFps.compute("the exact family is untouched by the fallback", 12)
    assert(ascii.exists(_ >= 1000000007L),
      "exact-family hashes must be the no-modulus polynomial, not reduced")
  }

  test("winnow_fps native expression matches the SQL HOF formulation on the corpus") {
    // the declarative twin the native loop replaced (nested
    // transform/sequence + per-window slice/array_min + array_distinct):
    // same hashes, same window order, same first-occurrence dedup
    for (k <- Seq(5, 12)) {
      val terms = PipelineQueries.winnowHashTerms(k)
      val sqlForm = Tables.documents(spark, sf0001)
        .filter(s"length(text) >= ${k + 7}")
        .selectExpr("doc_id",
          s"transform(sequence(1, length(text) - ${k - 1}), p -> $terms) AS hs")
        .selectExpr("doc_id",
          "array_distinct(transform(sequence(1, size(hs) - 7), i -> array_min(slice(hs, i, 8)))) AS fps")
        .as[(Long, Seq[Long])].collect().toMap
      val native = PipelineQueries.winnowFps(Tables.documents(spark, sf0001), k)
        .as[(Long, Seq[Long])].collect().toMap
      assert(native.keySet == sqlForm.keySet)
      native.foreach { case (id, fps) =>
        assert(fps == sqlForm(id), s"k=$k doc $id fingerprints diverge")
      }
    }
  }

  test("winnowing k=12: any shared 19-char substring shares a fingerprint") {
    // the dedup_winnow window length: guarantee threshold is w+k-1 = 19
    val shared = "THEQUICKBROWNFOXJMP" // 19 chars
    val docs = Seq(
      (1L, s"aaaaaaaaaa${shared}bbbbbbbbbb"),
      (2L, s"cccccccccccccccccccccc${shared}dd"),
      (3L, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee")
    ).toDF("doc_id", "text")
    val fps = PipelineQueries.winnowFps(docs, k = 12)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
      "shared 19-char substring must share a k=12 winnowed fingerprint")
    assert(fps(3L).toSet.intersect(fps(1L).toSet ++ fps(2L).toSet).isEmpty)
  }

  test("mmrTopK: diversification picks the distinct region over the near-duplicate") {
    import graft.ops.SimilarityOps
    // query 0 sits between two regions; 1 and 2 are near-duplicates of
    // each other, 3 covers the other region
    val emb = Seq(
      (0L, Seq(1f, 1f, 0f, 0f), 0),
      (1L, Seq(1f, 0.1f, 0f, 0f), 0),
      (2L, Seq(1f, 0.11f, 0f, 0f), 0),
      (3L, Seq(0.1f, 1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val mmr = SimilarityOps.mmrTopK(emb, 4, "vec_id = 0", 3, 3)
      .orderBy("mmr_rank").select("c_id").as[Long].collect().toSeq
    // pure relevance ranks the near-duplicate second; MMR must demote it
    val brute = SimilarityOps.cosineTopK(emb, 4, "vec_id = 0", 3)
      .orderBy("rn").select("c_id").as[Long].collect().toSeq
    assert(brute == Seq(2L, 1L, 3L), s"brute order was $brute")
    assert(mmr == Seq(2L, 3L, 1L), s"mmr order was $mmr")
  }

  test("mmrTopK: a query with fewer candidates than nSelect stops early") {
    import graft.ops.SimilarityOps
    // only 2 non-query vectors exist but 5 selections are requested: the
    // greedy loop must emit exactly 2 rows (ranks 1, 2) — the contract the
    // old per-round SQL satisfied by producing empty remainder frames
    val emb = Seq(
      (0L, Seq(1f, 1f, 0f, 0f), 0),
      (1L, Seq(1f, 0.1f, 0f, 0f), 0),
      (3L, Seq(0.1f, 1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val mmr = SimilarityOps.mmrTopK(emb, 4, "vec_id = 0", 10, 5)
      .orderBy("mmr_rank").select("c_id", "mmr_rank")
      .as[(Long, Long)].collect().toSeq
    assert(mmr.map(_._2) == Seq(1L, 2L), s"ranks were $mmr")
    assert(mmr.map(_._1).toSet == Set(1L, 3L), s"ids were $mmr")
  }

  test("kmeans: fixed-round Lloyd matches a driver-local replay bit-for-bit") {
    import graft.ops.SimilarityOps
    val emb = Tables.embeddings(spark, sf0001)
    val got = SimilarityOps.kmeans(emb, 64, 8, 3)
      .select("vec_id", "cluster", "dist2").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap

    // driver-local replay with the engine's exact arithmetic contract:
    // Spark-Round quantization (shortest-repr BigDecimal, HALF_UP),
    // integer squared L2, ties to the lowest cluster id, floored means,
    // empty clusters carrying the previous centroid
    def q(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => q(x.toDouble * 1e7)).toArray }
      .sortBy(_._1)
    var cents: Seq[Array[Long]] = vecs.take(8).map(_._2.clone).toSeq
    def assign(v: Array[Long]): (Int, Long) = {
      var best = -1; var bd = Long.MaxValue
      for (c <- cents.indices) {
        var d = 0L; var i = 0
        while (i < v.length) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
        if (d < bd) { bd = d; best = c }
      }
      (best, bd)
    }
    for (_ <- 1 to 3) {
      val byC = vecs.groupBy(v => assign(v._2)._1)
      cents = cents.indices.map { c =>
        byC.get(c) match {
          case Some(members) =>
            val n = members.length.toLong
            Array.tabulate(64) { d =>
              val s = members.map(_._2(d)).sum
              (s - Math.floorMod(s, n)) / n
            }
          case None => cents(c)
        }
      }
    }
    val expect = vecs.map { case (id, v) =>
      val (c, d2) = assign(v); id -> (c.toLong, d2)
    }.toMap
    assert(got == expect, "engine k-means must equal the driver-local replay")
    assert(got.values.map(_._1).toSet.size > 1, "degenerate single-cluster run")
  }

  test("kmeans: an emptied cluster carries its centroid and regains members") {
    import graft.ops.SimilarityOps
    // vec 0 and 1 are IDENTICAL, so init centroids 0 and 1 coincide and
    // every point assigns to the lower cid — cluster 1 is empty from
    // round 1 and must carry its (duplicate) centroid without error
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0.9f, 0.1f, 0f, 0f)),
      (4L, Seq(0.1f, 0.9f, 0f, 0f))
    ).map { case (id, e) => (id, e, 0) }.toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.kmeans(vecs, 4, 2, 3)
      .select("vec_id", "cluster", "dist2").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got.size == 5)
    // no row lands in the emptied duplicate cluster: cid 0 wins all ties
    assert(got.values.forall(_._1 == 0L) ||
      got.values.map(_._1).toSet == Set(0L, 1L),
      s"unexpected assignment $got")
    // the duplicate of vec 0 must land with it, exactly
    assert(got(0L) == got(1L))
    // centroid of the surviving cluster absorbed its members: vec 0's
    // distance to the round-3 centroid is positive (mean moved off it)
    assert(got.values.exists(_._2 > 0L))
  }

  test("PQ: codes deterministic across runs; ADC recall beats chance vs exact L2") {
    import graft.ops.SimilarityOps
    val emb = Tables.embeddings(spark, sf0001)
    val c1 = SimilarityOps.pqCodes(emb, 64, 8, 8).collect().map(_.toSeq).toSet
    val c2 = SimilarityOps.pqCodes(emb, 64, 8, 8).collect().map(_.toSeq).toSet
    assert(c1 == c2 && c1.nonEmpty, "PQ training must be run-deterministic")

    graft.functions.QuantizedDot.register(spark)
    val vecs = emb.selectExpr("vec_id", s"${SimilarityOps.qvecExpr} AS qvec")
      .selectExpr("vec_id", "qvec", "ldot(qvec, qvec) AS n2")
    val qs = vecs.filter("vec_id < 8")
      .selectExpr("vec_id AS q_id", "qvec AS qq", "n2 AS nq")
    val exact = vecs.crossJoin(broadcast(qs))
      .filter(col("q_id") =!= col("vec_id"))
      .selectExpr("q_id", "vec_id AS c_id", "nq + n2 - 2 * ldot(qq, qvec) AS l2")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("l2").asc, col("c_id").asc)))
      .filter(col("rn") <= 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val pq = SimilarityOps.pqTopK(emb, 64, 8, 8, "vec_id < 8", 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val adcRecall = pq.intersect(exact).size.toDouble / exact.size
    // near-isotropic corpus: pure ADC top-3 only has to beat chance
    // (~3/N); the production-quality bar is on the re-ranked form below
    assert(adcRecall > 3.0 / 49, s"ADC recall $adcRecall at chance level")
    val rr = SimilarityOps.pqTopKRerank(emb, 64, 8, 8, "vec_id < 8", 3, 48)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val rrRecall = rr.intersect(exact).size.toDouble / exact.size
    assert(rrRecall >= 0.6, s"re-ranked PQ recall $rrRecall too low")
  }

  test("chunk PQ retrieval: offsets map back, own doc excluded, shortlist recall") {
    import graft.queries.PipelineQueries
    val hits = PipelineQueries.chunkTopKPq(spark, sf0001).collect()
    assert(hits.nonEmpty)
    // rank + exclusion contract: ≤3 hits per query chunk, rn 1-based,
    // never a chunk of the query's own document
    assert(hits.forall(r => r.getLong(6) >= 1 && r.getLong(6) <= 3))
    assert(hits.forall(r => r.getLong(0) != r.getLong(2)))
    assert(hits.groupBy(r => (r.getLong(0), r.getLong(1))).forall(_._2.length <= 3))
    // the unpacked (c_doc, c_chunk, c_tok_start) must be a REAL chunk with
    // the REAL offset — the end-to-end claim that retrieval hits map back
    // into documents
    val chunks = PipelineQueries.docChunksTok(spark, sf0001)
      .select("doc_id", "chunk_idx", "tok_start")
      .as[(Long, Long, Long)].collect().toSet
    assert(hits.forall(r =>
      chunks.contains((r.getLong(2), r.getLong(3), r.getLong(4)))))
    // shortlist recall: with the shortlist wider than the corpus the ADC
    // stage passes everything and the re-rank IS exhaustive exact L2 —
    // the production shortlist must recover most of that truth
    def pairs(shortlist: Int) =
      PipelineQueries.chunkTopKPq(spark, sf0001, shortlist = shortlist)
        .select("q_doc", "q_chunk", "c_doc", "c_chunk")
        .as[(Long, Long, Long, Long)].collect().toSet
    val exact = pairs(1 << 20)
    val got = pairs(32)
    assert(got == pairs(32), "retrieval must be run-deterministic")
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"shortlisted PQ chunk recall $recall too low")
  }

  test("PQ streaming encode matches batch codes (literal codebook is stream-safe)") {
    import graft.ops.SimilarityOps
    val emb = Tables.embeddings(spark, sf0001)
    val batch = SimilarityOps.pqCodes(emb, 64, 8, 8).collect().map(_.toSeq).toSet
    val q = SimilarityOps.pqCodesStreaming(
        graft.queries.StreamingJobs.embeddingsStream(spark, sf0001), emb, 64, 8, 8)
      .writeStream.format("memory").queryName("pq_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pq_stream").collect().map(_.toSeq).toSet
      assert(got == batch, "stream-encoded codes must equal the batch encode")
    } finally q.stop()
  }

  test("native minhash_band_sigs matches the SQL transform/array_min form") {
    graft.functions.MinHashBandSigs.register(spark)
    val hs = DedupOps.shingles(Tables.documents(spark, sf0001), "text", 3)
      .selectExpr("doc_id", s"${DedupOps.md5Long("sh")} AS h")
      .groupBy("doc_id").agg(collect_set(col("h")).as("hs"))
    val sqlSigs = DedupOps.permConstants(16).grouped(4).zipWithIndex.map {
      case (band, bi) =>
        val mins = band.map { case (_, a, b) =>
          s"CAST(array_min(transform(hs, h -> ($a * (h % 2147483647) + $b) % 2147483647)) AS STRING)"
        }.mkString(", ")
        s"concat_ws(',', $mins)"
    }.mkString("array(", ", ", ")")
    val diff = hs.selectExpr("doc_id",
        s"minhash_band_sigs(hs, 16, 4) AS a", s"$sqlSigs AS b")
      .filter("a != b")
    assert(diff.count() == 0)
  }

  test("native simhash60 matches the per-bit vote SQL form") {
    graft.functions.Simhash60.register(spark)
    val toks = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "explode(array_distinct(filter(split(trim(text), ' '), t -> t <> ''))) AS tok")
      .selectExpr("doc_id", s"${DedupOps.md5Long("tok")} AS h")
    val native = toks.groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
      .selectExpr("doc_id", "simhash60(hs) AS fp")
    val sql = toks
      .selectExpr("doc_id", "h", "explode(sequence(0, 59)) AS j")
      .selectExpr("doc_id", "j",
        "CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END AS vote")
      .groupBy("doc_id", "j").agg(sum("vote").as("s"))
      .selectExpr("doc_id",
        "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END AS bit")
      .groupBy("doc_id").agg(sum("bit").as("fp"))
    val joined = native.alias("n").join(sql.alias("q"), "doc_id")
      .filter("n.fp != q.fp")
    assert(joined.count() == 0)
  }
}
