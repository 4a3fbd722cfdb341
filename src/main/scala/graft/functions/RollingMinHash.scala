package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `rolling_min5(text)` — minimum 5-char polynomial rolling hash (base 31)
 * over a string: the winnowing-style document fingerprint
 * (graft.queries.PipelineQueries.docFingerprint) as a native Catalyst
 * scalar expression.
 *
 * Why a custom Expression: the SQL formulation (`transform(sequence(...))`
 * over a char array) materializes an O(n) array per row and evaluates an
 * interpreted lambda per element; this is a single allocation-free O(n)
 * loop with an incremental window update. Same value as the DuckDB oracle's
 * arithmetic (code points × {31⁴..31⁰}, min over windows).
 *
 * Returns NULL for strings shorter than 5 chars.
 */
case class RollingMin5Hash(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  private val B = 31L
  private val B4 = B * B * B * B

  // SQL-exposed: fail misuse at analysis time, not with an executor-side cast
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_min5"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < 5) return null
    // code points as the oracle's ascii() sees them (ASCII/BMP: charAt)
    var h = 0L
    var i = 0
    while (i < 5) { h = h * B + s.charAt(i); i += 1 }
    var min = h
    while (i < n) {
      h = (h - s.charAt(i - 5) * B4) * B + s.charAt(i)
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |String $s = $c.toString();
         |int $n = $s.length();
         |if ($n < 5) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < 5; $i++) { $h = $h * ${B}L + $s.charAt($i); }
         |  long $min = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - $s.charAt($i - 5) * ${B4}L) * ${B}L + $s.charAt($i);
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMin5Hash =
    copy(child = newChild)
}

object RollingMinHash {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_min5", exprs => RollingMin5Hash(exprs.head), "scala_udf")
}
