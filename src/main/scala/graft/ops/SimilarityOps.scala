package graft.ops

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
 * brute-force top-k hash-matches the DuckDB oracle exactly.
 *
 * Scale shape: brute-force is a broadcast of the (small) query set against
 * a full scan — O(Q × N × dim) with no shuffle on the corpus side; the LSH
 * variant hashes the corpus into sign-pattern buckets (one narrow pass) and
 * only scores collisions, the standard recall/cost trade for large N.
 */
object SimilarityOps {

  /** (id, pos, qv): one row per vector component, quantized to BIGINT. */
  def quantized(emb: DataFrame, dim: Int, idAs: String, vAs: String): DataFrame =
    emb.selectExpr(s"vec_id AS $idAs", s"explode(sequence(1, $dim)) AS pos",
        "embedding AS e")
      .selectExpr(idAs, "pos",
        s"CAST(round(CAST(element_at(e, CAST(pos AS INT)) AS DOUBLE) * 10000000d) AS BIGINT) AS $vAs")

  /** Squared norms per vector: (id, norm2). */
  def norms(q: DataFrame, id: String, v: String): DataFrame =
    q.groupBy(col(id)).agg(sum(col(v) * col(v)).as("norm2"))

  /** Brute-force cosine top-k of `emb` for the query vectors `queryPred`
    * selects. Output: q_id, c_id, cos, rn. */
  def cosineTopK(emb: DataFrame, dim: Int, queryPred: String, k: Int): DataFrame = {
    val cq = quantized(emb.filter(expr(queryPred)), dim, "q_id", "qv")
    val cc = quantized(emb, dim, "c_id", "cv")
    val nq = norms(cq, "q_id", "qv").withColumnRenamed("norm2", "nq")
    val nc = norms(cc, "c_id", "cv").withColumnRenamed("norm2", "nc")
    val dots = cq.join(cc, Seq("pos"))
      .filter(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id").agg(sum(col("qv") * col("cv")).as("dot"))
    val scored = dots.join(broadcast(nq), "q_id").join(nc, "c_id")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }

  /** Deterministic hyperplane weight for (plane j, dim d): md5-derived
    * integer in [-1000, 1000] — shared with the oracle. */
  def planeWeight(j: String, d: String): String =
    s"CAST(conv(substr(md5(concat($j, '_', $d)), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000"

  /** Sign-pattern LSH bucket per vector: `nPlanes` hyperplanes with
    * deterministic integer weights; bucket = bitmask of sign bits. */
  def lshBuckets(emb: DataFrame, dim: Int, nPlanes: Int): DataFrame =
    quantized(emb, dim, "id", "v")
      .selectExpr("id", "pos", "v", s"explode(sequence(0, ${nPlanes - 1})) AS j")
      .selectExpr("id", "j", s"v * (${planeWeight("j", "pos")}) AS contrib")
      .groupBy("id", "j").agg(sum("contrib").as("s"))
      .selectExpr("id",
        "CASE WHEN s >= 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END AS bit")
      .groupBy("id").agg(sum("bit").as("bucket"))

  /** LSH-bucketed ANN: score only same-bucket collisions, top-k per query.
    * Output: q_id, c_id, cos, rn (may return < k rows per query — the
    * recall trade documented above). */
  def lshCosineTopK(emb: DataFrame, dim: Int, nPlanes: Int, queryPred: String,
                    k: Int): DataFrame = {
    val buckets = lshBuckets(emb, dim, nPlanes)
    // bucket-restricted candidate pairs
    val q = buckets.select(col("id").as("q_id"), col("bucket"))
      .join(emb.filter(expr(queryPred)).select(col("vec_id").as("q_id")), "q_id")
    val c = buckets.select(col("id").as("c_id"), col("bucket").as("bucket_c"))
    val cand = q.join(c, col("bucket") === col("bucket_c") && col("q_id") =!= col("c_id"))
      .select("q_id", "c_id")
    val cq = quantized(emb.filter(expr(queryPred)), dim, "q_id", "qv")
    val cc = quantized(emb, dim, "c_id", "cv")
    val nq = norms(cq, "q_id", "qv").withColumnRenamed("norm2", "nq")
    val nc = norms(cc, "c_id", "cv").withColumnRenamed("norm2", "nc")
    val dots = cand
      .join(cq, Seq("q_id")).join(cc, Seq("c_id", "pos"))
      .groupBy("q_id", "c_id").agg(sum(col("qv") * col("cv")).as("dot"))
    val scored = dots.join(broadcast(nq), "q_id").join(nc, "c_id")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }
}
