package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `simhash60(hs)` — 60-bit SimHash fingerprint from an array of (distinct)
 * token hashes: bit j of the result is set iff the sum over the array of
 * ±1 votes from bit j of each hash is positive.
 *
 * Why a custom Expression (same rationale as [[MinHashBandSigs]]): the SQL
 * formulation explodes every token row 60× (one row per bit) and runs two
 * aggregation shuffles; this computes the same integer math in one pass
 * over the per-doc hash array, so the only shuffle left is the per-doc
 * `collect_list`. Bit-identical to the per-(doc, bit) vote-sum oracle:
 * votes and the final bit sum are exact integer arithmetic, and addition
 * order cannot matter.
 */
case class Simhash60(child: Expression) extends UnaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Simhash60.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash60.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Simhash60 =
    copy(child = newChild)
}

object Simhash60 {
  /** Shared by interpreted eval and generated code (the loop lives here so
    * the two paths cannot diverge). */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => Simhash60(exprs.head), "scala_udf")
}
