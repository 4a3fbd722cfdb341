package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `minhash_band_sigs(hs, nPerms, rowsPerBand)` — LSH band signature strings
 * from a per-document shingle-hash set, as ONE native Catalyst expression.
 *
 * Why a custom Expression (same rationale as [[RollingMin5Hash]]): the SQL
 * formulation evaluates `array_min(transform(hs, h -> (a*h+b) % p))` once
 * per permutation — nPerms interpreted lambda trees, each walking the whole
 * array with per-element dispatch and a materialized intermediate array.
 * This is a single allocation-light O(|hs| × nPerms) tight loop over
 * primitive longs. Values are bit-identical to the SQL/DuckDB form: the
 * permutation is `(a * (h % p) + b) % p` with p = 2147483647 and the LCG
 * constants of [[graft.ops.DedupOps.permConstants]]; band i's signature is
 * its rowsPerBand minima rendered as decimal strings joined by ','
 * (matching `concat_ws(',', CAST(... AS STRING)...)`).
 *
 * Output: array<string> of ceil(nPerms / rowsPerBand) signatures, indexed
 * by band id. An empty input set yields "" per band, exactly like
 * `concat_ws` over the all-NULL `array_min`s of the SQL form.
 */
case class MinHashBandSigs(child: Expression, nPerms: Int, rowsPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_band_sigs"

  // (a, b) pairs; fixed LCG shared with the oracle SQL
  private lazy val ab: (Array[Long], Array[Long]) = {
    val perms = graft.ops.DedupOps.permConstants(nPerms)
    (perms.map(_._2).toArray, perms.map(_._3).toArray)
  }

  override def nullSafeEval(input: Any): Any = {
    val (as, bs) = ab
    val arr = input.asInstanceOf[ArrayData]
    val sigs = MinHashBandSigs.compute(arr, as, bs, rowsPerBand)
    new GenericArrayData(sigs.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (as, bs) = ab
    val aRef = ctx.addReferenceObj("mhA", as, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sigs = ctx.freshName("sigs")
      s"""
         |UTF8String[] $sigs = graft.functions.MinHashBandSigs.compute(
         |  $c, $aRef, $bRef, $rowsPerBand);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandSigs =
    copy(child = newChild)
}

object MinHashBandSigs {
  private val P = 2147483647L

  /** Single pass over the hash array; mins for all permutations at once,
    * then band-signature strings. Called from both interpreted eval and
    * generated code (the loop lives here so codegen stays tiny and the two
    * paths cannot diverge). */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long],
              rowsPerBand: Int): Array[UTF8String] = {
    val nPerms = as.length
    val n = arr.numElements()
    val mins = new Array[Long](nPerms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = arr.getLong(i) % P
      var p = 0
      while (p < nPerms) {
        val v = (as(p) * hm + bs(p)) % P
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    val nBands = (nPerms + rowsPerBand - 1) / rowsPerBand
    val sigs = new Array[UTF8String](nBands)
    var b = 0
    while (b < nBands) {
      val sb = new java.lang.StringBuilder(12 * rowsPerBand)
      var r = b * rowsPerBand
      val end = math.min(r + rowsPerBand, nPerms)
      var first = true
      while (r < end) {
        if (n > 0) { // empty set: concat_ws over NULL mins yields ""
          if (!first) sb.append(',')
          sb.append(mins(r))
          first = false
        }
        r += 1
      }
      sigs(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    sigs
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_band_sigs",
      exprs => MinHashBandSigs(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "scala_udf")
}
