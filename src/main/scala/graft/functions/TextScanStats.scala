package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * `text_scan(text, 'stop,words,csv')` — every per-document scalar of the
 * text_stats family in ONE code-point pass, as a native codegen'd
 * expression returning a struct:
 *
 *   n_tokens     BIGINT  non-empty split-on-space fields
 *   n_rtokens    BIGINT  BPE-ish regex tokens ([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])
 *   nonspace_len BIGINT  code points that are not 0x20 (= Σ token lengths)
 *   punct_cnt    BIGINT  code points outside [a-zA-Z0-9 ]
 *   stop_cnt     BIGINT  tokens exactly equal to a stopword
 *
 * Why a custom Expression (same rationale as [[SpanHashes]]): the previous
 * formulation ran FOUR regex passes per document, the worst an alternation
 * lookaround (`(?<=^| )(?:the|a|of|...)(?= |\z)`) that backtracks per byte
 * — the engine's heaviest per-byte expression and a recurring bench
 * variance magnet. Here every counter advances in the same single loop;
 * stopword hits are a hash-set probe at each token boundary, not an
 * alternation scan at each character.
 *
 * Token contract (shared verbatim with the DuckDB oracles): a token is a
 * maximal run of non-SPACE (0x20) code points — tab/CR/LF are ordinary
 * token characters. `stop_cnt` counts whole-token equality, which is
 * exactly what the old `(?<=^| )(?:...)(?= |\z)` lookaround counted (the
 * unconsumed-delimiter subtlety included: adjacent hits all count).
 * Lengths are code points, matching Spark `length()` and DuckDB `len()`
 * beyond the BMP.
 */
case class TextScanStats(child: Expression, stops: String)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_rtokens", LongType, nullable = false),
    StructField("nonspace_len", LongType, nullable = false),
    StructField("punct_cnt", LongType, nullable = false),
    StructField("stop_cnt", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "text_scan"

  override def nullSafeEval(input: Any): Any =
    TextScanStats.compute(input.asInstanceOf[UTF8String], stops)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the stopword csv rides into the generated code as a referenced object,
    // not an escaped source literal
    val stopsRef = ctx.addReferenceObj("stops", stops, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextScanStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextScanStats =
    copy(child = newChild)
}

object TextScanStats {
  private val SP = 0x20

  private val stopSets =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashSet[String]]()

  private def stopSet(csv: String): java.util.HashSet[String] = {
    val cached = stopSets.get(csv)
    if (cached != null) return cached
    val s = new java.util.HashSet[String]()
    csv.split(',').foreach(w => if (w.nonEmpty) s.add(w))
    stopSets.putIfAbsent(csv, s)
    s
  }

  // run classes for the regex-token counter
  private final val NONE = 0
  private final val ALPHA = 1
  private final val DIGIT = 2

  /** The one pass. Shared by interpreted eval and codegen so the paths
    * cannot diverge. */
  def compute(s: UTF8String, stopsCsv: String): InternalRow = {
    val stops = stopSet(stopsCsv)
    var maxStopLen = 0
    val it = stops.iterator()
    while (it.hasNext) { val w = it.next(); if (w.length > maxStopLen) maxStopLen = w.length }
    val str = s.toString
    val n = str.length
    var nTokens = 0L
    var nRtokens = 0L
    var nonspace = 0L
    var punct = 0L
    var stopCnt = 0L
    var prevClass = NONE
    var inToken = false
    // rolling token buffer for the stop-set probe; oversize or
    // non-lowercase-ASCII tokens can never match and stop buffering
    val buf = new java.lang.StringBuilder(maxStopLen)
    var tokenEligible = true
    var i = 0
    while (i <= n) {
      val cp = if (i < n) str.codePointAt(i) else SP // virtual trailing space
      if (cp == SP) {
        if (inToken) {
          if (tokenEligible && buf.length > 0 && stops.contains(buf.toString))
            stopCnt += 1
          inToken = false
        }
        prevClass = NONE
      } else {
        nonspace += 1
        if (!inToken) {
          nTokens += 1
          inToken = true
          buf.setLength(0)
          tokenEligible = true
        }
        if (cp >= 'a' && cp <= 'z') {
          if (tokenEligible) {
            if (buf.length < maxStopLen) buf.appendCodePoint(cp)
            else tokenEligible = false
          }
        } else tokenEligible = false
        val isAlpha = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
        val isDigit = cp >= '0' && cp <= '9'
        if (isAlpha) {
          if (prevClass != ALPHA) nRtokens += 1
          prevClass = ALPHA
        } else if (isDigit) {
          if (prevClass != DIGIT) nRtokens += 1
          prevClass = DIGIT
        } else {
          punct += 1
          nRtokens += 1
          prevClass = NONE
        }
      }
      i += (if (i < n) Character.charCount(cp) else 1)
    }
    new GenericInternalRow(Array[Any](nTokens, nRtokens, nonspace, punct, stopCnt))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "text_scan",
      exprs => TextScanStats(exprs.head,
        exprs(1).eval().asInstanceOf[UTF8String].toString),
      "scala_udf")
}
