package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Document deduplication for training-data pipelines: exact, n-gram
 * Jaccard, MinHash+LSH, and SimHash — all as declarative Catalyst plans
 * (no UDFs; every hash derives from the codegen'd `md5` built-in so the
 * DuckDB oracle can restate it bit-for-bit).
 *
 * Scale shape (100 TB corpus):
 *  - exact dedup: one shuffle on a 128-bit content hash;
 *  - shingling: narrow explode (rows × shingles) feeding a distinct — the
 *    expensive part is the shingle self-join, which LSH exists to avoid;
 *  - MinHash: signatures are one groupBy over (doc, perm) — shuffle volume
 *    O(docs × perms); banding turns the quadratic candidate search into an
 *    equi-join on (band, signature), the standard web-scale dedup plan;
 *  - SimHash: one groupBy over (doc, bit) then a 64-bit fingerprint join.
 */
object DedupOps {

  /** Every word `n`-shingle occurrence per doc, position multiplicity kept
    * (repetition analysis needs the counts): (doc_id, extra cols..., sh). */
  def allShingles(docs: DataFrame, textCol: String, n: Int, carry: String*): DataFrame = {
    val parts = (0 until n).map(i => s"element_at(w, i + $i)").mkString(", ' ', ")
    docs.selectExpr(Seq("doc_id") ++ carry ++
        Seq(s"filter(split(trim($textCol), ' '), t -> t <> '') AS w"): _*)
      .selectExpr(Seq("doc_id") ++ carry ++
        Seq("w", "explode(sequence(1, size(w))) AS i"): _*)
      .filter(expr(s"i + ${n - 1} <= size(w)"))
      .selectExpr(Seq("doc_id") ++ carry ++ Seq(s"concat($parts) AS sh"): _*)
  }

  /** Distinct word `n`-shingles per doc: (doc_id, extra cols..., sh). */
  def shingles(docs: DataFrame, textCol: String, n: Int, carry: String*): DataFrame =
    allShingles(docs, textCol, n, carry: _*).distinct()

  /** Distinct word `n`-shingle HASHES per doc: (doc_id, extra cols..., h)
    * with h the 62-bit rolling token hash of [[graft.functions.SpanHashes]].
    * The hash replaces the span STRING before the first exchange, so the
    * distinct — and everything downstream (self-joins, frequency counts) —
    * shuffles and compares 8-byte longs instead of ~n-word strings, and
    * each token is digested once instead of once per covering span. This
    * is the scale form of [[shingles]] for consumers that never need the
    * span text back. */
  def shingleHashes(docs: DataFrame, textCol: String, n: Int, carry: String*): DataFrame = {
    graft.functions.SpanHashes.register(docs.sparkSession)
    docs.selectExpr(Seq("doc_id") ++ carry ++
        Seq(s"filter(split(trim($textCol), ' '), t -> t <> '') AS w"): _*)
      .selectExpr(Seq("doc_id") ++ carry ++
        Seq(s"explode(span_hashes(w, $n)) AS h"): _*)
      .distinct()
  }

  /** All-pairs exact n-gram Jaccard ≥ `threshold` within the same `scope`
    * column — QUADRATIC within each scope group by contract; the scope
    * must bound group size. Input is [[shingleHashes]] output (distinct
    * (doc_id, scope, h) rows): the self-join shuffles and compares 8-byte
    * span hashes, never span strings. Output: doc_a, doc_b, common,
    * jaccard.
    *
    * Guard: the plan embeds a per-scope distinct-doc count and fails fast
    * (analysis-quality error at runtime, before the self-join explodes)
    * if any scope group holds more than `maxDocsPerScope` documents — a
    * constant or high-skew scope at 100 TB would otherwise detonate the
    * shingle self-join. The count is an HLL ESTIMATE (1% rsd), so the
    * EFFECTIVE cap is `maxDocsPerScope * 97 / 100` — 3σ below the nominal
    * value, enforced conservatively: an over-cap group can never slip
    * through on estimator noise, but a group within ~3% under the nominal
    * cap may fail spuriously. Size `maxDocsPerScope` ~5% above the largest
    * group you intend to allow. For unbounded scopes use [[minhashPairs]],
    * whose banded candidate join is the web-scale plan. */
  def ngramJaccardPairs(shIn: DataFrame, scope: String, threshold: Double,
                        maxDocsPerScope: Long = 100000L): DataFrame = {
    // join-multiplicity formulation: common = row count of the shingle
    // self-join per pair. An array-intersect candidate/verify variant (like
    // minhashPairs) was measured SLOWER here — the scoped self-join is
    // already small and the extra per-doc set aggregation dominates.
    //
    // The shingle table feeds FOUR consumers (per-doc counts, the scope
    // guard, both self-join sides); each re-runs the corpus
    // split+explode+hash scan uncheckpointed (differing groupings defeat
    // ReusedExchange) — materialize it once, the postings-table idiom.
    val sh = shIn.localCheckpoint()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val scopeGuard = sh.groupBy(col(scope))
      // HLL estimate at 1% rsd: a guard needs magnitude, not exactness —
      // the exact distinct would add an expand + second shuffle just to
      // guard. The compare bound below is scaled down 3% (3σ at rsd=0.01)
      // so the cap is enforced CONSERVATIVELY: an over-cap group can never
      // slip through on estimator noise; the trade is that a group within
      // ~3% under the cap may fail spuriously — raise maxDocsPerScope (or
      // switch to minhashPairs) if that bites.
      .agg(approx_count_distinct(col("doc_id"), 0.01).as("__scope_docs"))
      .withColumnRenamed(scope, "__scope_g")
    val a = sh.select(col("doc_id").as("doc_a"), col(scope).as("scope_a"),
        col("h").as("h_a"))
      .join(scopeGuard, col("scope_a") === col("__scope_g"), "left")
      // assert_true returns NULL when the predicate holds, so the filter
      // keeps every row; a too-large scope raises instead of exploding.
      // NULL-scope rows get a NULL __scope_docs (null-unsafe join) —
      // coalesce passes them through unguarded, preserving the pre-guard
      // behavior where they simply never pair (NULL = NULL is not true).
      .filter(expr(
        s"""assert_true(coalesce(__scope_docs, 0L) <= ${maxDocsPerScope * 97 / 100}L, concat(
           |'ngramJaccardPairs: scope group ', cast(__scope_g AS STRING),
           |' holds ~', cast(__scope_docs AS STRING),
           |' docs (conservative cap ${maxDocsPerScope * 97 / 100} = 97% of
           | $maxDocsPerScope); the shingle self-join is quadratic
           | within scope - use minhashPairs for unbounded scopes or raise
           | maxDocsPerScope')) IS NULL""".stripMargin.replace("\n", "")))
      .drop("__scope_g", "__scope_docs")
    val b = sh.select(col("doc_id").as("doc_b"), col(scope).as("scope_b"),
      col("h").as("h_b"))
    a.join(b, col("h_a") === col("h_b") && col("scope_a") === col("scope_b") &&
        col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      .join(cnt.select(col("doc_id"), col("n_sh").as("na")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(cnt.select(col("doc_id"), col("n_sh").as("nb")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** Deterministic MinHash permutation constants (a, b) for perm i — a
    * fixed LCG so the Spark plan and the DuckDB oracle share them. */
  def permConstants(nPerms: Int): Seq[(Int, Long, Long)] =
    (0 until nPerms).map { i =>
      val a = (1103515245L * (i + 1) + 12345L) % 2147483629L + 1L
      val b = (134775813L * (i + 1) + 1L) % 2147483647L
      (i, a, b)
    }

  /** 60-bit md5-prefix hash of a string column, as a SQL fragment shared
    * verbatim (modulo dialect) with the oracle. */
  def md5Long(colExpr: String): String =
    s"CAST(conv(substr(md5($colExpr), 1, 15), 16, 10) AS BIGINT)"

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band → candidate
    * → verify with exact Jaccard ≥ threshold.
    *
    * Plan shape: ONE aggregation shuffle builds the per-doc hash-set array;
    * signatures and band keys are then per-row array expressions (no
    * per-perm row expansion, no second/third aggregation), candidates come
    * from the band self-join, and the exact-Jaccard verify is
    * `array_intersect` on the same arrays.
    *
    * Input contract: (doc_id, sh) shingle rows, DUPLICATES ALLOWED — the
    * `collect_set` aggregation dedupes map-side inside its partial pass,
    * so pass [[allShingles]]; a pre-`distinct()` ([[shingles]]) adds a
    * redundant full exchange of span strings for nothing. */
  def minhashPairs(sh: DataFrame, nPerms: Int, rowsPerBand: Int,
                   threshold: Double): DataFrame =
    minhashPairsOfSets(setsOfShingles(sh), nPerms, rowsPerBand, threshold)

  /** Per-doc distinct shingle-hash SETS (doc_id, hs, n_sh) from raw
    * (doc_id, sh) shingle rows — the single aggregation pass behind every
    * minhash consumer, and the SIGNATURE INDEX a production pipeline
    * persists between runs. Full 60-bit hashes in the set (mod-2^31
    * values would hit birthday collisions within a doc at larger
    * corpora); the permutation applies the modulus. Duplicate shingle
    * rows allowed: collect_set dedupes map-side (pass [[allShingles]]). */
  def setsOfShingles(sh: DataFrame): DataFrame = sh
    .selectExpr("doc_id", s"${md5Long("sh")} AS h")
    .groupBy("doc_id")
    .agg(collect_set(col("h")).as("hs"))
    .withColumn("n_sh", size(col("hs")).cast("long"))

  /** Per-doc LSH band keys (doc_id, band, sig) from a [[setsOfShingles]]
    * signature-set table — the BANDED INDEX of the corpus. Band signature
    * strings come from one native single-pass expression for all nPerms
    * permutations ([[graft.functions.MinHashBandSigs]]) instead of nPerms
    * interpreted transform+array_min lambda walks. A production pipeline
    * persists THIS table (not just the raw sets) between deliveries: the
    * per-delivery candidate probe is then a plain join against stored
    * rows, and the signature recomputation over the corpus — O(corpus ×
    * shingles × perms) per run if derived from the sets each time — drops
    * out of the per-delivery cost entirely. */
  def bandKeysOfSets(sets: DataFrame, nPerms: Int, rowsPerBand: Int): DataFrame = {
    graft.functions.MinHashBandSigs.register(sets.sparkSession)
    sets.selectExpr("doc_id",
      s"posexplode(minhash_band_sigs(hs, $nPerms, $rowsPerBand)) AS (band, sig)")
  }

  /** [[minhashPairs]] over a PRECOMPUTED signature-set table
    * ([[setsOfShingles]] output, possibly checkpointed/persisted): the
    * entry point for compositions that band the same side more than once
    * (within-side + cross-corpus in [[graft.queries.PipelineQueries
    * .dedupClustersDelta]]) — the corpus is shingled and aggregated ONCE,
    * not once per banding. */
  def minhashPairsOfSets(docSets: DataFrame, nPerms: Int, rowsPerBand: Int,
                         threshold: Double): DataFrame = {
    val bands = bandKeysOfSets(docSets, nPerms, rowsPerBand)
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
        col("n_sh").as("na")), "doc_a")
      .join(docSets.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
        col("n_sh").as("nb")), "doc_b")
      .withColumn("common", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Incremental ingest dedup: classify each DELIVERY document against an
    * existing BASE corpus — 'exact' (content hash already in base), 'near'
    * (MinHash+LSH verified Jaccard ≥ `threshold` against a base doc), else
    * 'new'; `dup_of` is the smallest matching base doc (−1 for new), exact
    * match taking precedence. The production decision for a new corpus
    * delivery.
    *
    * Scale shape: exact is a hash join of two md5 projections (the base
    * side min-combined BEFORE the join, so it joins one row per distinct
    * content). Near reuses the banded-signature machinery of
    * [[minhashPairs]] ASYMMETRICALLY — delivery band keys join base band
    * keys only, never base×base or delivery×delivery — so the candidate
    * count scales with the delivery size, not the corpus; the base
    * signature table is exactly the persistent index a production
    * pipeline keeps between deliveries. */
  def incrementalDedup(base: DataFrame, delivery: DataFrame, textCol: String,
                       k: Int, nPerms: Int, rowsPerBand: Int,
                       threshold: Double): DataFrame = {
    val near = crossNearPairs(base, delivery, textCol, k, nPerms, rowsPerBand,
        threshold)
      .groupBy("doc_id").agg(min(col("base_id")).as("near_of"))

    val bHash = base.selectExpr(s"md5($textCol) AS h", "doc_id AS base_id")
      .groupBy("h").agg(min(col("base_id")).as("exact_of"))
    val exact = delivery.selectExpr("doc_id", s"md5($textCol) AS h")
      .join(bHash, "h")
      .select("doc_id", "exact_of")

    delivery.select("doc_id")
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CASE WHEN exact_of IS NOT NULL THEN 'exact' " +
          "WHEN near_of IS NOT NULL THEN 'near' ELSE 'new' END AS verdict",
        "coalesce(exact_of, near_of, CAST(-1 AS BIGINT)) AS dup_of")
  }

  /** Every VERIFIED near-dup pair between a delivery and a base corpus:
    * (doc_id = delivery doc, base_id, jaccard ≥ `threshold`). The
    * asymmetric band join underlying [[incrementalDedup]], exposed raw for
    * incremental CLUSTER maintenance ([[ClusterOps.incrementalClusters]]),
    * which needs all cross edges, not just each delivery doc's minimum
    * match.
    *
    * Scale shape: delivery band keys join base band keys only — never
    * base×base or delivery×delivery — so candidates scale with the
    * delivery size; the base signature table is the persistent index a
    * production pipeline keeps between deliveries. Exact duplicates need
    * no separate path here: an identical shingle set yields identical
    * band signatures (candidate on every band) and Jaccard 1. */
  def crossNearPairs(base: DataFrame, delivery: DataFrame, textCol: String,
                     k: Int, nPerms: Int, rowsPerBand: Int,
                     threshold: Double): DataFrame =
    crossNearPairsOfSets(
      setsOfShingles(allShingles(base, textCol, k)),
      setsOfShingles(allShingles(delivery, textCol, k)),
      nPerms, rowsPerBand, threshold)

  /** [[crossNearPairs]] over PRECOMPUTED signature-set tables — pass the
    * same (possibly checkpointed) [[setsOfShingles]] outputs used for the
    * within-side bandings so each corpus is shingled once. */
  def crossNearPairsOfSets(bSets: DataFrame, dSets: DataFrame,
                           nPerms: Int, rowsPerBand: Int,
                           threshold: Double): DataFrame =
    crossNearPairsFromIndex(bandKeysOfSets(bSets, nPerms, rowsPerBand),
      bSets, dSets, nPerms, rowsPerBand, threshold)

  /** [[crossNearPairsOfSets]] with the base side's band keys supplied as a
    * PRECOMPUTED banded index ([[bandKeysOfSets]] output, persisted by
    * [[graft.queries.ClusterState.baseStatePaths]]): the per-delivery probe
    * shape. Only the DELIVERY side derives band signatures at run time;
    * the base index and the base set table (still needed to fetch matched
    * docs' shingle sets for the exact-Jaccard verify) are consumed as
    * stored rows — so per-delivery compute scales with the delivery, and
    * the corpus-sized inputs cost one scan each, no signature math. At
    * any sane delivery size the delivery band keys broadcast, making the
    * candidate probe a shuffle-free scan of the stored index. */
  def crossNearPairsFromIndex(bBands: DataFrame, bSets: DataFrame,
                              dSets: DataFrame,
                              nPerms: Int, rowsPerBand: Int,
                              threshold: Double): DataFrame = {
    val cand = bandKeysOfSets(dSets, nPerms, rowsPerBand).alias("d")
      .join(bBands.alias("b"),
        col("d.band") === col("b.band") && col("d.sig") === col("b.sig"))
      .select(col("d.doc_id").as("doc_id"), col("b.doc_id").as("base_id"))
      .distinct()
    cand
      .join(dSets.select(col("doc_id"), col("hs").as("hs_d"),
        col("n_sh").as("nd")), "doc_id")
      .join(bSets.select(col("doc_id").as("base_id"), col("hs").as("hs_b"),
        col("n_sh").as("nb")), "base_id")
      .withColumn("common",
        size(array_intersect(col("hs_d"), col("hs_b"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("nd") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_id", "base_id", "jaccard")
  }

  /** Cross-document repeated-span statistics: for each document, how many
    * of its distinct word n-gram spans also appear in at least one OTHER
    * document — the signal behind boilerplate stripping and
    * remove-repeated-paragraphs passes (our corpus has no paragraph
    * delimiters, so fixed-width token spans are the unit).
    *
    * Input: the output of [[shingleHashes]] (distinct (doc_id, h) rows).
    * Output: (doc_id, n_spans, n_shared, shared_frac).
    *
    * Scale shape: two hash-partial-aggregated shuffles — one on the 62-bit
    * span hash for global doc frequency (no strings through the exchange),
    * one back on doc_id. The span→doc-frequency table is also exactly what
    * a removal pass broadcasts/joins to rewrite documents. */
  def spanStats(sh: DataFrame): DataFrame = {
    val d = sh.select("doc_id", "h")
    val freq = d.groupBy("h").agg(count(lit(1)).as("ndocs"))
    d.join(freq, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_spans").cast("double"))
  }

  /** Directed near-CONTAINMENT pairs: (contained, container) where the
    * contained doc's shingles are mostly a subset of the container's —
    * asymmetric Jaccard |A∩B|/|A|, the excerpt/quote-dedup relation that
    * symmetric near-dup misses (a paragraph quoted inside a long article
    * has high containment but low Jaccard).
    *
    * Candidates come from SHARED-SPAN evidence, not minhash bands (bands
    * are tuned for symmetric similarity and under-sample low-Jaccard
    * containment): docs sharing any `spanN`-token span pair up. Spans in
    * more than `maxDocsPerSpan` docs are skipped as boilerplate — the
    * blast-radius cap that keeps the span self-join linear-ish; a span
    * shared by k docs yields k² candidate rows, so ubiquitous spans would
    * otherwise detonate it (they also carry no containment signal).
    * Verification is exact `shingleN`-gram asymmetric overlap on per-doc
    * hash sets. Output: contained, container, common, containment. */
  def containmentPairs(docs: DataFrame, textCol: String, spanN: Int,
                       shingleN: Int, threshold: Double,
                       maxDocsPerSpan: Long = 20L): DataFrame = {
    // rolling hashes straight from the token stream: no span STRING is ever
    // materialized, and candidate evidence shuffles 8-byte longs
    val sp = shingleHashes(docs, textCol, spanN)
    val usable = sp.groupBy("h").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2 && col("ndocs") <= maxDocsPerSpan)
      .select("h")
    val cand = sp.join(usable, "h").alias("a")
      .join(sp.join(usable, "h").alias("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val sets = shingleHashes(docs, textCol, shingleN)
      .selectExpr("doc_id", "h AS g")
      .groupBy("doc_id")
      .agg(collect_set(col("g")).as("gs"))
      .withColumn("n", size(col("gs")).cast("long"))
    val scored = cand
      .join(sets.select(col("doc_id").as("da"), col("gs").as("ga"), col("n").as("na")), "da")
      .join(sets.select(col("doc_id").as("db"), col("gs").as("gb"), col("n").as("nb")), "db")
      .withColumn("common", size(array_intersect(col("ga"), col("gb"))).cast("long"))
    // both directions from ONE scored row via explode — a union of two
    // selects over `scored` would recompute the whole candidate+verify
    // subtree twice (it halved the executed plan when replaced)
    scored
      .selectExpr(
        ("explode(array(" +
          "struct(da AS contained, db AS container, common AS common," +
          " CAST(common AS DOUBLE) / CAST(na AS DOUBLE) AS containment)," +
          "struct(db AS contained, da AS container, common AS common," +
          " CAST(common AS DOUBLE) / CAST(nb AS DOUBLE) AS containment))) AS r"))
      .select("r.contained", "r.container", "r.common", "r.containment")
      .filter(col("containment") >= threshold)
  }

  /** Snapshot diff for incremental corpus updates: classify every doc id
    * across two corpus snapshots as added / removed / changed / unchanged
    * by id + content hash. Both sides project to (id, 128-bit hash) BEFORE
    * the one full-outer hash join — no text crosses the exchange, so the
    * diff of two 100 TB snapshots shuffles only ids and hashes. */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    a.selectExpr(s"$idCol AS id", s"md5($textCol) AS ha")
      .join(b.selectExpr(s"$idCol AS id", s"md5($textCol) AS hb"),
        Seq("id"), "full_outer")
      .selectExpr("id",
        """CASE WHEN ha IS NULL THEN 'added'
          |     WHEN hb IS NULL THEN 'removed'
          |     WHEN ha = hb THEN 'unchanged'
          |     ELSE 'changed' END AS status""".stripMargin.replace("\n", ""))

  /** Cross-document repeated-span REMOVAL (the transform [[spanStats]]
    * measures): rewrite each document dropping every token covered by an
    * `n`-token span that also occurs in another document — the CCNet-style
    * boilerplate scrub. Output: (doc_id, n_tok, n_removed, text_clean).
    *
    * Plan shape: span hashes → global doc-frequency (one shuffle, 62-bit
    * hashes only) → shared span starts explode to covered token positions →
    * anti-flag join back to the token stream (doc-keyed shuffle) → ordered
    * per-doc reassembly via sort_array(struct(pos, tok)) — deterministic
    * reconstruction with no window and no driver-side logic. Docs shorter
    * than `n` tokens pass through untouched. Span hashes are the rolling
    * token hash of [[graft.functions.SpanHashes]] (one digest per token,
    * no concatenated span strings). */
  def spanScrub(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    graft.functions.SpanHashes.register(docs.sparkSession)
    val toks = docs
      .selectExpr("doc_id", s"filter(split(trim($textCol), ' '), t -> t <> '') AS w")
      .selectExpr("doc_id", "posexplode(w) AS (j0, tok)")
      .selectExpr("doc_id", "j0 + 1 AS j", "tok")
    val spans = docs
      .selectExpr("doc_id", s"filter(split(trim($textCol), ' '), t -> t <> '') AS w")
      // span_hashes is empty for docs shorter than n tokens — they
      // contribute no spans and pass through the scrub untouched
      .selectExpr("doc_id", s"posexplode(span_hashes(w, $n)) AS (i0, h)")
      .selectExpr("doc_id", "i0 + 1 AS i", "h")
      // materialized once: the span table feeds both sides of the
      // df-join below (the postings-table idiom) — uncheckpointed, the
      // corpus tokenize+span_hashes scan runs twice
      .localCheckpoint()
    val shared = spans
      .join(spans.select(col("h"), col("doc_id").as("od")).distinct()
          .groupBy("h").agg(count(lit(1)).as("ndocs")).filter(col("ndocs") > 1),
        "h")
      .selectExpr("doc_id", s"explode(sequence(i, i + ${n - 1})) AS j")
      .distinct()
    toks.join(shared.withColumn("cov", lit(1)), Seq("doc_id", "j"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("cov").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN cov IS NULL THEN struct(j, tok) END)), x -> x.tok)"))
          .as("text_clean"))
  }

  /** SimHash: 60-bit fingerprint — bit j set iff the sum of ±1 votes from
    * each distinct token's hash bit j is positive. One aggregation shuffle
    * (per-doc hash list); the vote math is a native single-pass expression
    * ([[graft.functions.Simhash60]]) instead of a 60× per-bit row explosion
    * with a second shuffle. */
  def simhash(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.Simhash60.register(docs.sparkSession)
    docs
      .selectExpr("doc_id", s"explode(array_distinct(filter(split(trim($textCol), ' '), t -> t <> ''))) AS tok")
      .selectExpr("doc_id", s"${md5Long("tok")} AS h")
      .groupBy("doc_id").agg(collect_list(col("h")).as("hs"))
      .selectExpr("doc_id", "simhash60(hs) AS simhash")
  }
}
