package graft.spark.aggs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.Hll
import graft.hash.Fnv

/** Pure-Catalyst HLL distinct-count aggregate (`TypedImperativeAggregate`),
  * the zero-copy fast path next to the udaf-based [[HllCountAgg]]:
  *
  *  - the update path reads the `UTF8String` directly — for ASCII values the
  *    fnv-1a byte fold equals the reference's codepoint fold, so no java
  *    String is materialized per row (urls are the hot case); non-ASCII
  *    values fall back to the exact codepoint fold;
  *  - buffers serialize in the engine's HLL byte format — the same bytes the
  *    checkpoint table stores.
  *
  * This is the construction Spark's own approx_count_distinct uses
  * (SURVEY.md §1.3), instantiated with our sketch.
  */
case class NativeHllCountAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Hll] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  // cast-or-reject at analysis time instead of a runtime CCE on non-strings
  override def inputTypes = Seq(StringType) // AbstractDataType is private[sql] — infer
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Hll = Hll(p)

  override def update(buffer: Hll, input: InternalRow): Hll = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val n = s.numBytes()
      var ascii = true
      var h = Fnv.Offset64
      var i = 0
      while (i < n && ascii) {
        val b = s.getByte(i)
        if (b < 0) ascii = false
        else {
          h ^= b
          h *= Fnv.Prime64
          i += 1
        }
      }
      // ASCII: byte fold == the reference's codepoint fold; else exact path
      buffer.addHash64(if (ascii) h else Fnv.fnv1a64(s.toString, 0))
    }
    buffer
  }

  override def merge(buffer: Hll, input: Hll): Hll = buffer.merge(input)

  override def eval(buffer: Hll): Any = buffer.estimate

  override def serialize(buffer: Hll): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): Hll = Hll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): NativeHllCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NativeHllCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll_count_native"
}

object NativeHllCountAgg {
  /** DataFrame-facing column: `df.agg(hllCountNative($"url"))`. */
  def hllCountNative(c: Column, p: Int = 14): Column =
    GraftColumnBridge.column(
      NativeHllCountAgg(GraftColumnBridge.expression(c), p).toAggregateExpression())
}
