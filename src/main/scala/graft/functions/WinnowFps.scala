package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `winnow_fps(text, k)` — the winnowed fingerprint SET of a document
 * (Schleimer et al., SIGMOD 2003): base-31 polynomial hashes of every
 * k-char window, the minimum of each run of 8 consecutive hashes, then
 * first-occurrence deduplication. Guarantee: any shared substring of
 * length ≥ k+7 between two documents shares at least one fingerprint.
 *
 * Why a custom Expression: the SQL formulation (two nested
 * `transform(sequence(...))` chains with a `slice`+`array_min` per window
 * position) is higher-order-function work — interpreted, outside
 * whole-stage codegen, one O(k) lambda tree walk per position plus an
 * 8-element array allocation per window. This is a single allocation-lean
 * O(n) pass: incremental rolling hash, nested-min over the fixed 8-window
 * (w is small; no deque needed), HashSet dedup. ~8× on the sf0.1 corpus.
 *
 * Value contract (shared with the DuckDB oracle, which states the same
 * polynomial as generated per-term arithmetic —
 * [[graft.queries.PipelineQueries.winnowHashTerms]]): code points as the
 * oracle's `ascii()` sees them (true code points — `codePointAt`, not
 * UTF-16 code units), no modulus — exact BIGINT arithmetic for documents
 * whose code points all fit in 0xFF (the widest value for which the
 * polynomial provably fits signed-64 at k ≤ 12; Java would wrap where
 * DuckDB's BIGINT errors). Window order and first-occurrence dedup match
 * `array_distinct`/`list_distinct` exactly.
 *
 * OUT-OF-CONTRACT text (any code point > 0xFF — real multilingual
 * corpora) takes a documented MODULAR variant of the same polynomial:
 * identical recurrence, every step reduced mod 1e9+7, over true code
 * points up to U+10FFFF. The per-document switch keeps two guarantees:
 * (1) in-contract documents hash bit-identically to the oracle's exact
 * arithmetic, and (2) one wide document can never kill a corpus-wide
 * dedup pass (it used to throw, failing the whole task — the r10 advice
 * finding). Wide documents still satisfy the winnowing guarantee among
 * THEMSELVES (shared ≥ k+7 substrings of wide text share a modular
 * fingerprint); a wide/narrow cross-match is a hash-family collision,
 * the same false-candidate class banding already tolerates — downstream
 * verification (containment scoring in dedup_winnow) filters it.
 *
 * The switch also has a FALSE-NEGATIVE direction, stated here so no
 * caller assumes symmetry: a wide near-copy of a narrow document (one
 * emoji appended to otherwise-identical ASCII text) hashes in the
 * modular family while the original hashes exactly, so the pair shares
 * ZERO fingerprints and winnow-based dedup can never candidate them —
 * cross-WIDTH near-duplicates are invisible to this pass by design.
 * Deployments that need cross-width recall should run the MinHash path
 * (`dedup_minhash` — shingle tokens, width-agnostic) alongside, which is
 * this engine's scale path anyway. Likewise the DuckDB oracle
 * restatement covers only the exact family: the winnow queries are
 * oracle-gated on in-contract (≤ 0xFF) corpora — the driver testdata —
 * and a wide corpus would need a modular oracle arm before being gated.
 *
 * Returns NULL for strings shorter than k+7 chars (no full 8-hash window
 * exists; callers filter those rows out, as the SQL form did).
 */
case class WinnowFps(child: Expression, k: Int) extends UnaryExpression
  with ExpectsInputTypes {

  // k ≤ 12 is the other half of the exact-arithmetic contract: at k = 13
  // even Latin-1 text overflows signed-64 (255·(31^13−1)/30 ≈ 2.1e20), so
  // Java would wrap where the oracle's BIGINT errors — the same
  // silent-divergence class the code-point guard in compute() closes.
  require(k >= 1 && k <= 12,
    s"winnow_fps: k must be in [1, 12] (signed-64 exact-arithmetic bound), got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any = {
    val out = WinnowFps.compute(input.asInstanceOf[UTF8String].toString, k)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fps = ctx.freshName("fps")
      s"""
         |long[] $fps = graft.functions.WinnowFps.compute($c.toString(), $k);
         |if ($fps == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($fps);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private val W = 8 // the winnowing window: min of every 8 consecutive hashes

  /** Modulus for the out-of-contract (wide code point) hash family. */
  private val M = 1000000007L

  /** Single pass shared by interpreted eval and codegen so the paths
    * cannot diverge. Returns null when no full window exists.
    *
    * Code-POINT semantics: the oracle contract is stated in
    * `ascii()`/`length(text)` terms (code points), and the Spark-side
    * `length(text) >= k+7` row filter counts code points too — so the
    * hash consumes code points, not UTF-16 code units. Documents whose
    * code points all fit 0xFF take the EXACT no-modulus polynomial (it
    * stays inside signed-64 only for cp ≤ 255 at k ≤ 12: max ≈
    * 255·(31^12−1)/30 ≈ 6.8e18 < 2^63 — beyond that Java would wrap
    * where DuckDB's BIGINT errors). Any wider code point switches the
    * WHOLE document to the modular variant (same recurrence mod 1e9+7)
    * so multilingual text is fingerprinted instead of failing the task;
    * see the class scaladoc for the cross-family collision argument. */
  def compute(s: String, k: Int): Array[Long] = {
    // widen UTF-16 to code points up front (ASCII corpus: a plain copy)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var n = 0
    var wide = false
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (cp > 0xFF) wide = true
      cps(n) = cp
      n += 1
      ci += Character.charCount(cp)
    }
    val m = n - k + 1 // number of k-codepoint hashes
    if (m < W) return null
    val hs = new Array[Long](m)
    if (!wide) {
      var bk = 1L // 31^(k-1), the roll-out factor
      var e = 1
      while (e < k) { bk *= 31L; e += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = h * 31L + cps(i); i += 1 }
      hs(0) = h
      var j = 1
      while (j < m) {
        h = (h - cps(j - 1) * bk) * 31L + cps(j + k - 1)
        hs(j) = h
        j += 1
      }
    } else {
      // modular family: same polynomial, every step reduced mod 1e9+7.
      // Bounds: h < M (~2^30), cp ≤ 0x10FFFF (~2^21), bk < M — every
      // intermediate product stays far inside signed-64.
      var bk = 1L
      var e = 1
      while (e < k) { bk = bk * 31L % M; e += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = (h * 31L + cps(i)) % M; i += 1 }
      hs(0) = h
      var j = 1
      while (j < m) {
        h = java.lang.Math.floorMod(h - cps(j - 1) * bk % M, M)
        h = (h * 31L + cps(j + k - 1)) % M
        hs(j) = h
        j += 1
      }
    }
    // min per 8-window in window order, dedup keeping first occurrence
    // (matches array_distinct over the transform(...array_min(slice)) form)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - W + 1)
    var nOut = 0
    var i = 0
    while (i <= m - W) {
      var mn = hs(i)
      var t = i + 1
      while (t < i + W) { if (hs(t) < mn) mn = hs(t); t += 1 }
      if (seen.add(mn)) { out(nOut) = mn; nOut += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, nOut)
  }

  /** Validated SQL builder shared by both registration surfaces
    * ([[register]] and [[graft.GraftExtensions]]): a wrong arity or a
    * non-foldable k must surface as a clear AnalysisException naming the
    * expected signature — not an IndexOutOfBoundsException or an
    * UnsupportedOperationException from eval() on an unresolved column. */
  def build(exprs: Seq[Expression]): WinnowFps = {
    def bad(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"winnow_fps expects (text, k-literal): $why"))
    if (exprs.length != 2)
      bad(s"got ${exprs.length} argument(s)")
    if (!exprs(1).foldable)
      bad("k must be a literal integer, got a non-foldable expression")
    val k = exprs(1).eval() match {
      case n: Number => n.intValue()
      case other => bad(s"k must be an integer literal, got $other")
    }
    if (k < 1 || k > 12)
      bad(s"k must be in [1, 12] (the no-modulus polynomial exceeds " +
        s"signed-64 above k = 12), got $k")
    WinnowFps(exprs.head, k)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps", build, "scala_udf")
}
