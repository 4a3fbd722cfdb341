package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * `span_hashes(w, n)` — one 62-bit hash per word n-gram span of the token
 * array `w`, as ONE native single-pass expression: output i (0-based) is
 * the hash of tokens w[i..i+n-1].
 *
 * Why a custom Expression (same rationale as [[MinHashBandSigs]]): the
 * previous formulation exploded one row per span start and evaluated
 * `md5(concat(tok_i, ' ', ..., tok_{i+n-1}))` per row — every token's
 * bytes pass through MD5 n times (once per span containing it) behind a
 * fresh concat allocation. Here each token is MD5-hashed ONCE to a 60-bit
 * prefix and spans combine token hashes with a ROLLING polynomial, so the
 * whole span family is O(tokens), not O(tokens × n) digest bytes.
 *
 * Hash definition (shared verbatim with the DuckDB oracles, which restate
 * it as a fixed-n nested polynomial over `list_transform(w, md5-60bit)`):
 *
 *   t    = 60-bit md5 prefix of the token (= conv(substr(md5(tok),1,15),16,10))
 *   h_p  = polynomial fold of (t % p) with base B, modulo p
 *   hash = h_P1 * P2 + h_P2        (dual 31-bit moduli → 62-bit combined)
 *
 * with P1 = 2147483647, P2 = 2147483629, B = 1000003. Every intermediate
 * stays below 2^62: DuckDB BIGINT arithmetic ERRORS on overflow (it does
 * not wrap like the JVM), so the modulus schedule is part of the contract,
 * not an implementation detail.
 *
 * Returns an empty array when `w` has fewer than n tokens (the oracle's
 * `generate_series(1, len-n+1)` is empty there too).
 */
case class SpanHashes(child: Expression, n: Int) extends UnaryExpression
  with ExpectsInputTypes {

  require(n >= 1, s"span_hashes: n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "span_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SpanHashes.compute(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val hs = ctx.freshName("hs")
      s"""
         |long[] $hs = graft.functions.SpanHashes.compute($c, $n);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SpanHashes =
    copy(child = newChild)
}

object SpanHashes {
  val P1 = 2147483647L // 2^31 - 1
  val P2 = 2147483629L
  val B = 1000003L

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix: first 15 hex chars as an integer — the first 8
    * digest bytes big-endian, dropping the low nibble of the 8th. */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xFFL); b += 1 }
    v >>> 4
  }

  private def powMod(base: Long, exp: Int, p: Long): Long = {
    var r = 1L
    var e = exp
    var b = base % p
    while (e > 0) {
      if ((e & 1) == 1) r = r * b % p
      b = b * b % p
      e >>= 1
    }
    r
  }

  /** Single pass: token md5s once, then a rolling window update per span.
    * Shared by interpreted eval and codegen so the paths cannot diverge.
    * Every product here is bounded by 2^31 × 2^31 < 2^63 — no JVM wrap, so
    * the values match DuckDB's overflow-checked arithmetic exactly. */
  def compute(arr: ArrayData, n: Int): Array[Long] = {
    val len = arr.numElements()
    if (len < n) return Array.emptyLongArray
    val t1 = new Array[Long](len)
    val t2 = new Array[Long](len)
    var i = 0
    while (i < len) {
      val v = md5Prefix60(arr.getUTF8String(i).getBytes)
      t1(i) = v % P1
      t2(i) = v % P2
      i += 1
    }
    val bn1 = powMod(B, n - 1, P1) // B^(n-1) mod p, the roll-out factor
    val bn2 = powMod(B, n - 1, P2)
    val out = new Array[Long](len - n + 1)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < n) {
      h1 = (h1 * B + t1(i)) % P1
      h2 = (h2 * B + t2(i)) % P2
      i += 1
    }
    out(0) = h1 * P2 + h2
    var s = 1
    while (s <= len - n) {
      // roll: drop t[s-1]·B^(n-1), shift by B, add t[s+n-1]; the +P keeps
      // the subtraction non-negative before the reducing modulus
      h1 = ((h1 - t1(s - 1) * bn1 % P1 + P1) % P1 * B + t1(s + n - 1)) % P1
      h2 = ((h2 - t2(s - 1) * bn2 % P2 + P2) % P2 * B + t2(s + n - 1)) % P2
      out(s) = h1 * P2 + h2
      s += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "span_hashes",
      exprs => SpanHashes(
        exprs.head, exprs(1).eval().asInstanceOf[Number].intValue()),
      "scala_udf")

  /** The oracle-side restatement: a DuckDB scalar expression computing the
    * SAME combined hash for the span starting at 1-based position `$i` of
    * token-hash list `$th` (the `list_transform(w, 60-bit md5)` list).
    * Lives next to the JVM loop so the two can only drift visibly. */
  def duckSpanExpr(th: String, i: String, n: Int): String = {
    def poly(p: Long): String =
      (1 until n).foldLeft(s"($th[$i] % $p)") { (acc, j) =>
        s"(($acc * $B + $th[$i+$j] % $p) % $p)"
      }
    s"(${poly(P1)} * $P2 + ${poly(P2)})"
  }

  /** Token-hash list CTE fragment: `list_transform` of the tokenized text
    * to 60-bit md5 prefixes — the oracle twin of the per-token digest. */
  val duckTokenHashList: String =
    "list_transform(list_filter(string_split(trim(text), ' '), t -> t <> ''), " +
      "t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))"
}
