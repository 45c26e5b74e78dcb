package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k aggregate — the k smallest DISTINCT long values per group,
  * as a sorted array. This is the KMV (k-minimum-values) distinct-count
  * sketch of Bar-Yossef et al. 2002: over hashed keys, the k-th
  * smallest hash h_k estimates the distinct count as (k-1)·M / h_k
  * (hashes uniform on [1, M]), and fewer-than-k survivors mean the
  * exact distinct count IS the buffer size.
  *
  * Why a custom `TypedImperativeAggregate` instead of a window: the
  * window form (`row_number ≤ k` over ORDER BY hash) shuffles EVERY
  * distinct hash — at 100 TB that is the whole key column moving. This
  * aggregate keeps a k-element TreeSet per group per task, so the
  * partial (map-side) aggregation ships exactly min(k, seen) longs per
  * (group, partition): the shuffle is bounded by groups·k·8 bytes no
  * matter how many rows flow in. Plans as ObjectHashAggregate with
  * partial + final modes.
  */
case class BottomK(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "bottom-k needs k >= 1")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    other.forEach(v => add(buf, v))
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    buf.forEach { v => arr(i) = v; i += 1 } // TreeSet iterates ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}

object BottomK {
  private[functions] val entry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bottomk"),
    new ExpressionInfo(classOf[BottomK].getName, null, "graft_bottomk",
      "_FUNC_(expr, k) - k smallest distinct longs, sorted ascending", ""),
    (children: Seq[Expression]) => {
      val k = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case _ => throw new IllegalArgumentException(
          "graft_bottomk: k must be a literal")
      }
      BottomK(children(0), k)
    })
}
