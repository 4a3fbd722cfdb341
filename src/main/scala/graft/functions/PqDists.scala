package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * `pq_dists(qvec)` — for a quantized vector, the exact squared-L2 distance
 * from each of its `nSub` subvectors to every centroid of that subspace's
 * codebook, as `array<array<bigint>>` (outer = subspace, inner = centroid
 * in codebook order). PQ encode and the ADC lookup-table build both reduce
 * to small expressions over this one call.
 *
 * Why a custom Expression: the literal-SQL formulation expanded to
 * nSub × nCents distance expressions, each inlining two `ldot` loops plus
 * a literal centroid array — at 8 × 16 that generated a
 * whole-stage-codegen method past janino's limits, so Spark silently fell
 * back to INTERPRETED projection on the corpus-encode path (the hot pass
 * of a PQ index build). Here the codebook rides into the generated code
 * as one referenced object and the distance fold is a single bounded
 * loop nest — codegen compiles, and the per-row cost is the arithmetic.
 *
 * Distances are `Σ (v−c)²` in BIGINT — algebraically and bit-identically
 * equal to the previous `ldot(sub,sub) − 2·ldot(sub,c) + Σc²` formulation
 * (exact integer math, quantized components keep every term < 2^53).
 * Centroid ORDER inside each inner array is the codebook Seq order, so
 * `array_position(.., array_min(..))` ties resolve identically.
 */
case class PqDists(child: Expression, cents: Array[Array[Array[Long]]],
                   subDim: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dists"

  // The codebook rides in the expression, NOT in the child list, so two
  // pq_dists bound to different codebooks would otherwise render
  // identically in plan strings (and the temp-function registry binding is
  // session-global, last-registration-wins). Embedding the shape and a
  // content fingerprint makes a stale-registration mixup visible in any
  // explain/plan comparison instead of silently computing wrong distances.
  private lazy val fingerprint: String =
    f"${cents.length}x${if (cents.isEmpty) 0 else cents(0).length}x$subDim%d" +
      f"-${java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])}%08x"
  override def toString: String = s"pq_dists[$fingerprint](${child.toString})"
  override def sql: String = s"pq_dists[$fingerprint](${child.sql})"

  override def nullSafeEval(input: Any): Any =
    PqDists.compute(input.asInstanceOf[ArrayData], cents, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqDists.compute($c, $ref, $subDim);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDists =
    copy(child = newChild)
}

object PqDists {

  /** The one loop nest. Shared by interpreted eval and codegen so the
    * paths cannot diverge. */
  def compute(qvec: ArrayData, cents: Array[Array[Array[Long]]],
              subDim: Int): ArrayData = {
    val nSub = cents.length
    // fail diagnosably on a malformed corpus row (computeSub clamps because
    // its caller slices; here a short vector means the row itself is bad)
    require(qvec.numElements() >= nSub * subDim,
      s"pq_dists: input vector has ${qvec.numElements()} elements, codebook " +
        s"expects >= ${nSub * subDim} ($nSub subspaces x $subDim dims)")
    val out = new Array[Any](nSub)
    var m = 0
    while (m < nSub) {
      val cs = cents(m)
      val ds = new Array[Long](cs.length)
      var k = 0
      while (k < cs.length) {
        val c = cs(k)
        var s = 0L
        var d = 0
        while (d < subDim) {
          val diff = qvec.getLong(m * subDim + d) - c(d)
          s += diff * diff
          d += 1
        }
        ds(k) = s
        k += 1
      }
      out(m) = new GenericArrayData(ds)
      m += 1
    }
    new GenericArrayData(out)
  }

  /** `pq_sub_dists(sub, m)` companion for the training reassignment pass,
    * where rows carry ONE subvector plus its subspace id. */
  def computeSub(sub: ArrayData, m: Int,
                 cents: Array[Array[Array[Long]]]): ArrayData = {
    val cs = cents(m)
    val ds = new Array[Long](cs.length)
    var k = 0
    while (k < cs.length) {
      val c = cs(k)
      var s = 0L
      var d = 0
      val n = math.min(sub.numElements(), c.length)
      while (d < n) {
        val diff = sub.getLong(d) - c(d)
        s += diff * diff
        d += 1
      }
      ds(k) = s
      k += 1
    }
    new GenericArrayData(ds)
  }

  /** Register `pq_dists` / `pq_sub_dists` bound to THIS codebook: the
    * closure captures it, `selectExpr` resolves it at construction, so a
    * later registration for a different codebook cannot affect an
    * already-analyzed plan. */
  def register(spark: SparkSession, cents: Array[Array[Array[Long]]],
               subDim: Int): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_dists", exprs => PqDists(exprs.head, cents, subDim), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_sub_dists",
      exprs => PqSubDists(exprs(0), exprs(1), cents), "scala_udf")
  }
}

/** `pq_sub_dists(sub, m)` — distances of one subvector to subspace `m`'s
  * centroids (codebook order). See [[PqDists]]. */
case class PqSubDists(left: Expression, right: Expression,
                      cents: Array[Array[Array[Long]]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_sub_dists"

  override def nullSafeEval(sub: Any, m: Any): Any =
    PqDists.computeSub(sub.asInstanceOf[ArrayData],
      m.asInstanceOf[Long].toInt, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "long[][][]")
    nullSafeCodeGen(ctx, ev, (s, m) =>
      s"${ev.value} = graft.functions.PqDists.computeSub($s, (int) $m, $ref);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqSubDists =
    copy(left = l, right = r)
}
