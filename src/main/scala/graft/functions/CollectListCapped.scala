package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a HARD buffer bound: accumulation stops at `cap + 1`
  * elements, so a pathologically hot group costs O(cap) aggregation-buffer
  * memory instead of O(group size) — the stock `CollectList` materializes
  * the ENTIRE group before any post-aggregation filter can drop it, which
  * is the executor-memory hazard of bucket-gather candidate generation at
  * 100 TB (a boilerplate/licence-header bucket can hold millions of rows).
  *
  * The one extra element past `cap` is deliberate: it lets the caller's
  * `size(list) <= cap` filter distinguish an exactly-at-cap group from an
  * over-cap one, preserving the exact drop semantics of an uncapped gather
  * followed by the same filter. Which `cap + 1` elements survive for an
  * over-cap group is partition-order-dependent — callers must only ever
  * DROP over-cap groups, never use their contents (all graft callers do).
  */
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any = InternalRow.copyValue(value)

  override def update(
      buffer: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buffer.length <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)

  override def prettyName: String = "collect_list_capped"
}
