package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`, fixed dim).
 *
 * Cosine is computed over 1e7-quantized integer components: both engines
 * round the identical double `v * 1e7` with the identical half-away rule,
 * so dot products and norms are exact BIGINT sums (dim 64 × |q|≈5e6 →
 * < 2^53) and the final `dot / (sqrt(na)·sqrt(nb))` is bit-deterministic —
 * results hash-match the DuckDB oracle exactly.
 *
 * Plan shape: each vector is quantized ONCE into an `array<bigint>` column
 * (`qvec`), and all pairwise scoring uses the native `ldot` expression
 * (graft.functions.LongDot — a primitive loop, no per-element lambda
 * interpretation and no re-rounding per pair). Brute force broadcasts the
 * small query set against a corpus scan (zero corpus shuffle); the LSH
 * variants hash vectors into sign-pattern buckets via `ldot` against
 * literal hyperplane weights and only score collisions — the recall/cost
 * trade that holds at large N.
 */
object SimilarityOps {

  /** Quantized `array<bigint>` form of the embedding, computed per row. */
  val qvecExpr: String =
    "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000.0D) AS BIGINT))"

  private def registered(emb: DataFrame): DataFrame = {
    graft.functions.QuantizedDot.register(emb.sparkSession)
    emb
  }

  /** (vec_id, qvec, norm2) — the scored corpus representation. */
  private def quantVecs(emb: DataFrame): DataFrame =
    registered(emb)
      .selectExpr("vec_id", s"$qvecExpr AS qvec")
      .selectExpr("vec_id", "qvec", "ldot(qvec, qvec) AS norm2")

  /** Brute-force cosine top-k of `emb` for the query vectors `queryPred`
    * selects. Output: q_id, c_id, cos, rn. */
  def cosineTopK(emb: DataFrame, dim: Int, queryPred: String, k: Int): DataFrame = {
    val vecs = quantVecs(emb)
    val qs = vecs.join(emb.filter(expr(queryPred)).select("vec_id"), "vec_id")
      .selectExpr("vec_id AS q_id", "qvec AS qq", "norm2 AS nq")
    val cs = vecs.selectExpr("vec_id AS c_id", "qvec AS qc", "norm2 AS nc")
    cs.crossJoin(broadcast(qs))
      .filter(col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id", "nq", "nc", "ldot(qq, qc) AS dot")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }

  /** Deterministic hyperplane weights for (plane j ∈ [0,nPlanes), dim
    * d ∈ [1,dim]): integer in [-1000, 1000] derived from md5(s"{j}_{d}") —
    * computed here once and inlined as plan literals; the DuckDB oracle
    * recomputes the identical values via its own md5. */
  def planeWeights(nPlanes: Int, dim: Int): Seq[Seq[Long]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      (1 to dim).map { d =>
        val hex = md.digest(s"${j}_$d".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 15)
        java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
      }
    }
  }

  /** Per-plane signed projections as `ldot` against literal weight arrays. */
  private def planeSums(nPlanes: Int, dim: Int): Seq[String] = {
    val ws = planeWeights(nPlanes, dim)
    (0 until nPlanes).map { j =>
      s"ldot(qvec, array(${ws(j).mkString("L, ")}L)) AS s_$j"
    }
  }

  /** Sign-pattern LSH bucket per vector: one narrow pass, no shuffle. */
  def lshBuckets(emb: DataFrame, dim: Int, nPlanes: Int): DataFrame = {
    val bucket = (0 until nPlanes)
      .map(j => s"CASE WHEN s_$j >= 0 THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    quantVecs(emb)
      .selectExpr(Seq("vec_id AS id", "qvec", "norm2") ++ planeSums(nPlanes, dim): _*)
      .selectExpr("id", "qvec", "norm2", s"$bucket AS bucket")
  }

  /** Embedding-cosine near-duplicate pairs: banded sign-LSH candidates
    * (collide on ANY band — a single wide bucket has ~p^nPlanes collision
    * probability, hopeless at moderate thresholds), verified at quantized
    * cosine ≥ threshold. Candidates carry only the id pair through the
    * self-join + distinct; vectors are broadcast-joined back for scoring. */
  def cosineDupPairs(emb: DataFrame, dim: Int, nPlanes: Int, bandSize: Int,
                     threshold: Double): DataFrame = {
    require(nPlanes % bandSize == 0)
    val bandExprs = (0 until nPlanes / bandSize).map { b =>
      val bits = (0 until bandSize)
        .map(i => s"CASE WHEN s_${b * bandSize + i} >= 0 THEN shiftleft(CAST(1 AS BIGINT), $i) ELSE CAST(0 AS BIGINT) END")
        .mkString(" + ")
      s"struct(${b}L AS band, $bits AS bucket)"
    }.mkString(", ")
    val vecs = quantVecs(emb)
    val banded = vecs
      .selectExpr(Seq("vec_id AS id") ++ planeSums(nPlanes, dim): _*)
      .selectExpr("id", s"explode(array($bandExprs)) AS bb")
      .selectExpr("id", "bb.band AS band", "bb.bucket AS bucket")
    val cand = banded.alias("a")
      .join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    cand
      .join(broadcast(vecs.selectExpr("vec_id AS id_a", "qvec AS qa", "norm2 AS na")), "id_a")
      .join(broadcast(vecs.selectExpr("vec_id AS id_b", "qvec AS qb", "norm2 AS nb")), "id_b")
      .selectExpr("id_a", "id_b", "na", "nb", "ldot(qa, qb) AS dot")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** IVF (inverted-file) ANN: `nCentroids` coarse centroids partition the
    * corpus into inverted lists; each query probes its `nProbe` nearest
    * lists and scores only those.
    *
    * Centroids come from an offline training job in a real deployment; the
    * first `nCentroids` corpus vectors stand in deterministically here. The
    * codebook is collected ONCE (O(nCentroids·dim) — model parameters, not
    * data) and inlined as plan literals, so list assignment is one narrow
    * codegen'd pass over the corpus: per row, `nCentroids` `ldot`s + a CASE
    * argmax — NO shuffle and NO row expansion on the corpus side (the
    * row_number alternative would shuffle corpus×nCentroids rows). Probe
    * selection explodes only the tiny query set. Ties on equal cosine go to
    * the lowest centroid id, matching the oracle's (cos DESC, cid ASC) rank.
    *
    * Output: q_id, c_id, cos, rn (≤ k rows per query — recall bounded by
    * the probed lists, the standard IVF trade). */
  def ivfTopK(emb: DataFrame, dim: Int, nCentroids: Int, nProbe: Int,
              queryPred: String, k: Int): DataFrame = {
    val vecs = quantVecs(emb)
    // the "codebook": (cid, quantized vector literal, norm2)
    val centroids = vecs.filter(col("vec_id") < nCentroids)
      .selectExpr("vec_id", "qvec", "norm2")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .sortBy(_._1)
    def cosExpr(qv: Seq[Long], n2: Long): String =
      s"CAST(ldot(qvec, array(${qv.mkString("L,")}L)) AS DOUBLE)" +
        s" / (sqrt(CAST(norm2 AS DOUBLE)) * sqrt(CAST(${n2}L AS DOUBLE)))"
    // corpus → inverted-list id, per-row argmax over literal codebook dots.
    // One scores ARRAY + array_position(.., array_max(..)): a greatest +
    // CASE-chain argmax would inline the 16 dot expressions O(n²) times
    // after projection collapse and detonate codegen. array_position takes
    // the FIRST maximum → ties go to the lowest centroid id (cids sorted).
    val ccs = centroids.map { case (_, qv, n2) => cosExpr(qv, n2) }
      .mkString("array(", ", ", ")")
    val cidArr = centroids.map(c => s"${c._1}L").mkString("array(", ", ", ")")
    val assigned = vecs
      .selectExpr("vec_id AS c_id", "qvec AS qc", "norm2 AS nc",
        s"element_at($cidArr, CAST(array_position($ccs, array_max($ccs)) AS INT)) AS bucket")
    // queries → nProbe nearest centroids (explode is over queries only)
    val centroidStructs = centroids.map { case (cid, qv, n2) =>
      s"struct(${cid}L AS cid, ${cosExpr(qv, n2)} AS cos)"
    }.mkString(", ")
    val probes = vecs
      .join(emb.filter(expr(queryPred)).select("vec_id"), "vec_id")
      .selectExpr("vec_id AS q_id", "qvec", "norm2",
        s"explode(array($centroidStructs)) AS c")
      .selectExpr("q_id", "qvec AS qq", "norm2 AS nq", "c.cid AS bucket", "c.cos AS ccos")
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("bucket").asc)))
      .filter(col("pr") <= nProbe)
      .select("q_id", "qq", "nq", "bucket")
    assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id", "nq", "nc", "ldot(qq, qc) AS dot")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }

  /** LSH-bucketed ANN: score only same-bucket collisions, top-k per query.
    * Output: q_id, c_id, cos, rn (may return < k rows per query — the
    * recall trade documented above). */
  def lshCosineTopK(emb: DataFrame, dim: Int, nPlanes: Int, queryPred: String,
                    k: Int): DataFrame = {
    val buckets = lshBuckets(emb, dim, nPlanes)
    val qs = buckets
      .join(emb.filter(expr(queryPred)).select(col("vec_id").as("id")), "id")
      .selectExpr("id AS q_id", "qvec AS qq", "bucket", "norm2 AS nq")
    val cs = buckets
      .selectExpr("id AS c_id", "qvec AS qc", "bucket AS bucket_c", "norm2 AS nc")
    cs.join(broadcast(qs), col("bucket") === col("bucket_c") && col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id", "nq", "nc", "ldot(qq, qc) AS dot")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }
}
