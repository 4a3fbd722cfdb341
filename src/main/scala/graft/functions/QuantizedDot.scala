package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * `qdot(a, b)` — exact integer dot product of two float-vector columns
 * quantized at 1e7 (SimilarityOps' cosine contract): each component is
 * rounded half-away-from-zero on the double value `x * 1e7`, identical to
 * SQL `CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)` in both Spark and
 * DuckDB, and the products are summed in Long (exact — dim 64 × |q|≈5e6
 * stays < 2^63).
 *
 * Why a custom Expression: the SQL formulation
 * `aggregate(zip_with(a, b, ...))` allocates a zipped array and evaluates
 * an interpreted lambda per element — at 10^5+ candidate pairs × dim that
 * interpretation dominates the query. This is one allocation-free loop over
 * the two ArrayData buffers (~50× less per-pair overhead).
 *
 * `qdot(v, v)` is the squared norm.
 */
case class QuantizedDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += QuantizedDot.quantize(x.getFloat(i).toDouble) *
        QuantizedDot.quantize(y.getFloat(i).toDouble)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  // inline the loop in the generated stage; quantization stays the shared
  // static helper so interpreted and codegen'd paths are bit-identical
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cls = QuantizedDot.getClass.getName.stripSuffix("$")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $cls.quantize((double) $a.getFloat($i))
         |    * $cls.quantize((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

object QuantizedDot {
  /** The same BigDecimal HALF_UP path Spark's SQL round() takes, so values
    * are bit-identical to the validated SQL formulation
    * `CAST(round(CAST(x AS DOUBLE) * 1e7) AS BIGINT)`. */
  def quantize(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1e7)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "qdot", exprs => QuantizedDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ldot", exprs => LongDot(exprs(0), exprs(1)), "scala_udf")
  }
}

/**
 * `ldot(a, b)` — dot product of two BIGINT arrays as one primitive loop.
 *
 * The quantization companion to [[QuantizedDot]]: `qdot` re-rounds both
 * vectors on EVERY evaluation (BigDecimal per element — ~64M allocations
 * for 500k pairs), so pairwise scoring quantizes each vector once into an
 * `array<bigint>` column and scores pairs with this expression instead:
 * O(corpus) roundings + O(pairs · dim) primitive multiply-adds.
 *
 * Participates in whole-stage codegen (`doGenCode` emits the loop inline in
 * the generated stage — no expression-tree interpretation per row).
 */
case class LongDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ldot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getLong($i) * $y.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LongDot =
    copy(left = l, right = r)
}
