package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `normalize_ws(text)` — the dedup canonicalization
 * `regexp_replace(trim(lower(text)), '\s+', ' ')` as ONE native codegen'd
 * pass, byte-for-byte equal to the composed built-ins (a parity spec
 * asserts it against the regex formulation on adversarial inputs).
 *
 * Why a custom Expression (same rationale as [[TextScanStats]]): the regex
 * formulation runs a per-byte java.util.regex engine over every document —
 * the canonicalize-then-hash pass touches 100% of corpus bytes, so it was
 * the engine's most persistent bench variance magnet (r1 50 s, r4 6.0 s,
 * r5 8.2 s on the same plan). Here the collapse is a single byte scan with
 * no regex machinery, fused into whole-stage codegen.
 *
 * Semantics, replicated exactly:
 *  - `lower`: [[UTF8String.toLowerCase]] — the same call Spark's `lower`
 *    makes under the default UTF8_BINARY collation;
 *  - `trim`: strips leading/trailing SPACE (0x20) ONLY (Spark/DuckDB trim
 *    default) — a leading tab survives trim and becomes a leading space
 *    under the collapse, exactly as the regex chain produces;
 *  - `\s+` → one space: Java-regex `\s` is [ \t\n\x0B\f\r]; each maximal
 *    run collapses to a single 0x20. All five are single-byte ASCII, and
 *    UTF-8 continuation bytes are >= 0x80, so the byte scan can never
 *    split a multi-byte code point.
 */
case class NormalizeWs(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_ws"

  override def nullSafeEval(input: Any): Any =
    NormalizeWs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeWs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeWs =
    copy(child = newChild)
}

object NormalizeWs {

  /** The one pass. Shared by interpreted eval and codegen so the paths
    * cannot diverge. */
  def compute(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase
    val b = lowered.getBytes
    // trim: SPACE only, matching the built-in trim the regex chain used
    var from = 0
    var to = b.length
    while (from < to && b(from) == ' ') from += 1
    while (to > from && b(to - 1) == ' ') to -= 1
    // collapse every [\t\n\x0B\f\r ] run to a single space; output can
    // never outgrow the trimmed input
    val out = new Array[Byte](to - from)
    var j = 0
    var i = from
    var inWs = false
    while (i < to) {
      val c = b(i)
      if (c == ' ' || (c >= 0x09 && c <= 0x0d)) {
        if (!inWs) { out(j) = ' '; j += 1; inWs = true }
      } else {
        out(j) = c; j += 1; inWs = false
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, j)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "normalize_ws", exprs => NormalizeWs(exprs.head), "scala_udf")
}
