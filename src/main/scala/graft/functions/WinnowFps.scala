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
 * UTF-16 code units), no modulus — exact BIGINT arithmetic, enforced by a
 * loud rejection of code points above 0xFF (the widest value for which
 * the polynomial provably fits signed-64 at k ≤ 12; Java would wrap
 * where DuckDB's BIGINT errors, so out-of-contract text fails instead of
 * silently diverging). Window order and first-occurrence dedup match
 * `array_distinct`/`list_distinct` exactly.
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

  /** Single pass shared by interpreted eval and codegen so the paths
    * cannot diverge. Returns null when no full window exists.
    *
    * Code-POINT semantics, enforced: the oracle contract is stated in
    * `ascii()`/`length(text)` terms (code points), and the Spark-side
    * `length(text) >= k+7` row filter counts code points too — so the
    * hash must consume code points, not UTF-16 code units, or non-BMP
    * text would silently diverge instead of failing. Code points above
    * 0xFF are REJECTED loudly: the exact no-modulus polynomial stays
    * inside signed-64 only for cp ≤ 255 at k ≤ 12 (max ≈ 255·(31^12−1)/30
    * ≈ 6.8e18 < 2^63) — beyond that Java would wrap where DuckDB's BIGINT
    * errors, the silent-divergence class this guard exists to close. */
  def compute(s: String, k: Int): Array[Long] = {
    // widen UTF-16 to code points up front (ASCII corpus: a plain copy)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0
    var n = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      if (cp > 0xFF) throw new IllegalArgumentException(
        s"winnow_fps: code point U+${cp.toHexString.toUpperCase} exceeds the " +
          "exact-arithmetic contract (code points must be <= 0xFF; wider " +
          "text needs a modular variant of the fingerprint polynomial)")
      cps(n) = cp
      n += 1
      ci += Character.charCount(cp)
    }
    val m = n - k + 1 // number of k-codepoint hashes
    if (m < W) return null
    var bk = 1L // 31^(k-1), the roll-out factor
    var e = 1
    while (e < k) { bk *= 31L; e += 1 }
    val hs = new Array[Long](m)
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
    // min per 8-window in window order, dedup keeping first occurrence
    // (matches array_distinct over the transform(...array_min(slice)) form)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - W + 1)
    var nOut = 0
    i = 0
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
