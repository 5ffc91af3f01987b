package graft.spark.aggs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{BloomFilter, HeavyHitters}
import graft.ext.Kll
import graft.hash.Fnv

/** Shared zero-copy hash kernel for the native aggregates: `depth` seeded
  * fnv-1a-64 values computed straight off the UTF8String bytes for ASCII
  * keys (byte fold == the reference's codepoint fold), exact codepoint
  * fallback otherwise. */
private[aggs] object NativeHashes {
  def hashesOf(s: UTF8String, depth: Int): Array[Long] = {
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (i < n && ascii) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (!ascii) return graft.hash.Fnv1aHasher.hashes(s.toString, depth)
    val out = new Array[Long](depth)
    var d = 0
    while (d < depth) {
      var h = Fnv.Offset64 + 31L * d
      var j = 0
      while (j < n) { h ^= s.getByte(j); h *= Fnv.Prime64; j += 1 }
      out(d) = h
      d += 1
    }
    out
  }
}

/** Pure-Catalyst Bloom aggregate — the zero-copy companion to the udaf-based
  * [[BloomAgg]]: per row, k seeded hashes folded off the UTF8String bytes,
  * no java String materialization. merge = in-place OR (associative +
  * commutative as bytes). OUT = reference-format Bloom bytes. */
case class NativeBloomAgg(
    child: Expression,
    estElements: Long,
    fpr: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BloomFilter] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomFilter = BloomFilter.empty(estElements, fpr)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) {
      buffer.addHashes(NativeHashes.hashesOf(v.asInstanceOf[UTF8String], buffer.numHashes))
    }
    buffer
  }

  override def merge(buffer: BloomFilter, input: BloomFilter): BloomFilter =
    buffer.orInPlace(input)

  override def eval(buffer: BloomFilter): Any = buffer.toBytes
  override def serialize(buffer: BloomFilter): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomFilter.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_bloom_native"
}

/** Pure-Catalyst KLL aggregate over a double column: the value is read
  * primitively off the InternalRow (no Double boxing through an Encoder).
  * OUT = engine KLL bytes (same codec the udaf path ships). */
case class NativeKllAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Kll] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Kll = Kll(k)

  override def update(buffer: Kll, input: InternalRow): Kll = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: Kll, input: Kll): Kll = buffer.merge(input)

  override def eval(buffer: Kll): Any = buffer.toBytes
  override def serialize(buffer: Kll): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): Kll = Kll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeKllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeKllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kll_native"
}

/** KLL aggregate evaluating directly to quantile value(s) — the target shape
  * of the percentile_approx -> KLL optimizer rewrite. Returns null on empty
  * input (percentile_approx parity). */
case class NativeKllQuantileAgg(
    child: Expression,
    k: Int,
    percentages: Seq[Double],
    asArray: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Kll] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (asArray) ArrayType(DoubleType, containsNull = false) else DoubleType

  override def createAggregationBuffer(): Kll = Kll(k)

  override def update(buffer: Kll, input: InternalRow): Kll = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: Kll, input: Kll): Kll = buffer.merge(input)

  override def eval(buffer: Kll): Any =
    if (buffer.n == 0) null
    else if (asArray)
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        percentages.map(buffer.quantile).toArray)
    else buffer.quantile(percentages.head)

  override def serialize(buffer: Kll): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): Kll = Kll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeKllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeKllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kll_quantile"
}

/** Pure-Catalyst heavy hitters — zero-copy grid hashing (the key string is
  * materialized only for the candidate dict, which needs it anyway). Same
  * slack-tracking + candidate-union merge as [[HeavyHittersAgg]]; OUT is the
  * final top-k map<string,bigint>. */
case class NativeHhAgg(
    key: Expression,
    count: Expression,
    numHitters: Int,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[HeavyHitters] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(key, count)
  override def inputTypes = Seq(StringType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  // track extra candidates per partition so the merged top-k is a superset
  // of the exact top-k whenever the per-partition tails don't conspire
  private val slack = math.max(numHitters * 4, numHitters + 16)

  override def createAggregationBuffer(): HeavyHitters =
    HeavyHitters.empty(slack, width, depth)

  override def update(buffer: HeavyHitters, input: InternalRow): HeavyHitters = {
    val k = key.eval(input)
    if (k != null) {
      val c = count.eval(input)
      val n = if (c == null) 1L else c.asInstanceOf[Long]
      val s = k.asInstanceOf[UTF8String]
      buffer.addWithHashes(s.toString, NativeHashes.hashesOf(s, depth), n)
    }
    buffer
  }

  override def merge(buffer: HeavyHitters, input: HeavyHitters): HeavyHitters =
    buffer.merge(input)

  override def eval(buffer: HeavyHitters): Any = {
    val top = buffer.heavyHitters.toSeq.sortBy { case (k, v) => (-v, k) }.take(numHitters)
    ArrayBasedMapData(
      top.map(e => UTF8String.fromString(e._1)).toArray,
      top.map(_._2).toArray)
  }

  override def serialize(buffer: HeavyHitters): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): HeavyHitters = HeavyHitters.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeHhAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeHhAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), count = newChildren(1))
  override def prettyName: String = "graft_hh_native"
}

object NativeSketchAggs {
  def bloomNative(c: Column, estElements: Long, fpr: Double): Column =
    GraftColumnBridge.column(
      NativeBloomAgg(GraftColumnBridge.expression(c), estElements, fpr).toAggregateExpression())

  def kllNative(c: Column, k: Int = 200): Column =
    GraftColumnBridge.column(
      NativeKllAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())

  def heavyHittersNative(key: Column, count: Column, numHitters: Int,
                         width: Int = 4096, depth: Int = 5): Column =
    GraftColumnBridge.column(
      NativeHhAgg(GraftColumnBridge.expression(key), GraftColumnBridge.expression(count),
        numHitters, width, depth).toAggregateExpression())
}
