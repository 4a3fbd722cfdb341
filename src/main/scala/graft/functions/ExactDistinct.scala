package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Compact open-addressed set of longs — the aggregation buffer for
 * [[ExactDistinctLong]]. Mirrors the role of the reference's Redis bitmap
 * (network-flow-analysis/.../UniqueVisitorWithBloomFilter.java:93-171: a
 * 2^29-bit bloom bitmap sized for 10^8 users) but exact: linear probing
 * over a power-of-two Array[Long], ~16 bytes/key, no boxing.
 */
final class LongHashSet(initialCapacity: Int = 1 << 4) extends Serializable {
  private var capacity = Integer.highestOneBit(math.max(initialCapacity, 16))
  private var mask = capacity - 1
  private var keys = new Array[Long](capacity)
  private var full = new Array[Boolean](capacity)
  private var _size = 0

  def size: Int = _size

  private def scramble(v: Long): Int = {
    // 64→32 bit finalizer (splitmix64 tail)
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)).toInt
  }

  def add(v: Long): Unit = {
    var i = scramble(v) & mask
    while (full(i) && keys(i) != v) i = (i + 1) & mask
    if (!full(i)) {
      keys(i) = v; full(i) = true; _size += 1
      if (_size * 2 > capacity) grow()
    }
  }

  private def grow(): Unit = {
    val oldKeys = keys; val oldFull = full
    capacity <<= 1; mask = capacity - 1
    keys = new Array[Long](capacity); full = new Array[Boolean](capacity)
    _size = 0
    var i = 0
    while (i < oldKeys.length) { if (oldFull(i)) add(oldKeys(i)); i += 1 }
  }

  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < keys.length) { if (full(i)) f(keys(i)); i += 1 }
  }

  def merge(other: LongHashSet): Unit = other.foreach(add)

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * _size)
    bb.putInt(_size)
    foreach { v => bb.putLong(v); () }
    bb.array()
  }
}

object LongHashSet {
  def fromBytes(bytes: Array[Byte]): LongHashSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new LongHashSet(math.max(n * 2, 16))
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }
}

/**
 * `exact_distinct(col)` — exact distinct count of a LONG column as a native
 * Catalyst [[TypedImperativeAggregate]]: partial sets built map-side, merged
 * via binary serialization through the shuffle, evaluated to a count.
 *
 * This is the engine-native replacement for the reference's per-window
 * bloom-bitmap UV (SURVEY.md §2.5 A5): exact instead of probabilistic,
 * distributed instead of a Redis round-trip per event. For 10^8+
 * cardinalities prefer `approx_count_distinct` (HyperLogLog++, fixed-size
 * sketch); this aggregate's state is O(distinct) and is the exact-parity
 * mode.
 */
case class ExactDistinctLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongHashSet] with UnaryLike[Expression]
  with ExpectsInputTypes {

  // SQL-exposed via GraftExtensions: without an input-type contract a
  // non-LONG column passes analysis and ClassCastExceptions on executors
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): LongHashSet = new LongHashSet()

  override def update(buffer: LongHashSet, input: InternalRow): LongHashSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongHashSet, other: LongHashSet): LongHashSet = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: LongHashSet): Any = buffer.size.toLong

  override def serialize(buffer: LongHashSet): Array[Byte] = buffer.toBytes

  override def deserialize(storage: Array[Byte]): LongHashSet =
    LongHashSet.fromBytes(storage)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "exact_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactDistinctLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactDistinctLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactDistinctLong =
    copy(child = newChild)
}

object ExactDistinct {
  /** Register `exact_distinct` in the session's function registry (the
    * analyzer wraps the raw AggregateFunction in an AggregateExpression). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "exact_distinct", exprs => ExactDistinctLong(exprs.head), "scala_udf")
}
