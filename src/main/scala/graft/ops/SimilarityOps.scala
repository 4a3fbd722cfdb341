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
 * brute-force top-k hash-matches the DuckDB oracle exactly.
 *
 * Plan shape: dots/norms are per-row higher-order expressions
 * (`aggregate(zip_with(...))`) — a narrow, codegen-friendly pass with NO
 * position-explode shuffle. Brute force broadcasts the small query set
 * against a corpus scan (O(Q·N·dim) compute, zero corpus shuffle); the LSH
 * variant first hashes every vector into a sign-pattern bucket (again one
 * narrow pass over literal hyperplane weights) and only scores bucket
 * collisions — the recall/cost trade that holds at large N.
 */
object SimilarityOps {

  /** Quantize a float component to BIGINT at 1e7 (see class doc). */
  private def q(x: String): String =
    s"CAST(round(CAST($x AS DOUBLE) * 10000000.0D) AS BIGINT)"

  /** Exact integer squared norm of an embedding column, per row. */
  private def normExpr(e: String): String =
    s"aggregate($e, CAST(0 AS BIGINT), (acc, x) -> acc + ${q("x")} * ${q("x")})"

  /** Exact integer dot product of two embedding columns, per row. */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> ${q("x")} * ${q("y")}), CAST(0 AS BIGINT), (acc, v) -> acc + v)"

  /** Brute-force cosine top-k of `emb` for the query vectors `queryPred`
    * selects. Output: q_id, c_id, cos, rn. */
  def cosineTopK(emb: DataFrame, dim: Int, queryPred: String, k: Int): DataFrame = {
    val qs = emb.filter(expr(queryPred))
      .selectExpr("vec_id AS q_id", "embedding AS qe", s"${normExpr("embedding")} AS nq")
    val cs = emb
      .selectExpr("vec_id AS c_id", "embedding AS ce", s"${normExpr("embedding")} AS nc")
    cs.crossJoin(broadcast(qs))
      .filter(col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id", "nq", "nc", s"${dotExpr("qe", "ce")} AS dot")
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

  /** Sign-pattern LSH bucket per vector: one narrow pass, no shuffle. */
  def lshBuckets(emb: DataFrame, dim: Int, nPlanes: Int): DataFrame = {
    val ws = planeWeights(nPlanes, dim)
    val sums = (0 until nPlanes).map { j =>
      val wArr = s"array(${ws(j).mkString("L, ")}L)"
      s"aggregate(zip_with(embedding, $wArr, (x, w) -> ${q("x")} * w), CAST(0 AS BIGINT), (acc, v) -> acc + v) AS s_$j"
    }
    val bucket = (0 until nPlanes)
      .map(j => s"CASE WHEN s_$j >= 0 THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    emb.selectExpr(Seq("vec_id AS id", "embedding") ++ sums: _*)
      .selectExpr("id", "embedding", s"$bucket AS bucket")
  }

  /** LSH-bucketed ANN: score only same-bucket collisions, top-k per query.
    * Output: q_id, c_id, cos, rn (may return < k rows per query — the
    * recall trade documented above). */
  def lshCosineTopK(emb: DataFrame, dim: Int, nPlanes: Int, queryPred: String,
                    k: Int): DataFrame = {
    val buckets = lshBuckets(emb, dim, nPlanes)
      .selectExpr("id", "embedding", "bucket", s"${normExpr("embedding")} AS norm2")
    val qs = buckets
      .join(emb.filter(expr(queryPred)).select(col("vec_id").as("id")), "id")
      .selectExpr("id AS q_id", "embedding AS qe", "bucket", "norm2 AS nq")
    val cs = buckets
      .selectExpr("id AS c_id", "embedding AS ce", "bucket AS bucket_c", "norm2 AS nc")
    cs.join(broadcast(qs), col("bucket") === col("bucket_c") && col("q_id") =!= col("c_id"))
      .selectExpr("q_id", "c_id", "nq", "nc", s"${dotExpr("qe", "ce")} AS dot")
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id").asc)).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "c_id", "cos", "rn")
  }
}
