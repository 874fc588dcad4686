package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries heavy-hitter summary (the "frequent items" /
  * SpaceSaving family; merge rule per Agarwal et al., *Mergeable
  * Summaries*, PODS'12).
  *
  * The aggregation buffer holds at most `capacity` counters regardless of
  * group size — the 100 TB story: a full `groupBy(token).count` over a
  * corpus shuffles every distinct token; this summary finds every token
  * with frequency > n/(capacity+1) in ONE partial-aggregate pass with an
  * O(capacity) buffer per partition and an O(capacity) merge, no
  * token-keyed shuffle at all.
  *
  * Guarantees (standard MG, preserved by the subtract-the-(k+1)th merge):
  *  - reported count ≤ true count ≤ reported count + `max_error`;
  *  - every item with true count > `max_error` is present in the summary;
  *  - when the distinct-item count never exceeds `capacity` (at any merge
  *    point), `max_error` = 0 and every count is EXACT — the regime the
  *    driver oracle pins; the error bound itself is property-spec'd.
  *
  * Output: `struct(items: array<struct<item, count>>, max_error: long)`,
  * items sorted by (count desc, item asc) so results are deterministic for
  * a fixed input multiset regardless of partitioning — counts in the
  * exact regime don't depend on merge order, and ties sort lexically.
  */
case class FrequentItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FrequentItemsAgg.Buffer]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  import FrequentItemsAgg.Buffer

  override def createAggregationBuffer(): Buffer =
    new Buffer(mutable.HashMap.empty, 0L)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buffer.counts.getOrElse(key, 0L)
      if (cur > 0L) buffer.counts.update(key, cur + 1L)
      else if (buffer.counts.size < capacity) buffer.counts.update(key, 1L)
      else {
        // classic MG step: unmatched item + full table → everyone pays 1
        buffer.decrements += 1L
        val dead = mutable.ArrayBuffer.empty[String]
        buffer.counts.mapValuesInPlace((_, c) => c - 1L)
        buffer.counts.foreach { case (k, c) => if (c <= 0L) dead += k }
        dead.foreach(buffer.counts.remove)
      }
    }
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    other.counts.foreach { case (k, c) =>
      buffer.counts.update(k, buffer.counts.getOrElse(k, 0L) + c)
    }
    buffer.decrements += other.decrements
    if (buffer.counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone; ≤ 0 dies.
      // This is the mergeable-summaries rule that keeps the MG error bound
      // additive across merges.
      val sorted = buffer.counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - capacity - 1)
      buffer.decrements += cut
      val dead = mutable.ArrayBuffer.empty[String]
      buffer.counts.mapValuesInPlace((_, c) => c - cut)
      buffer.counts.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buffer.counts.remove)
    }
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    val items = buffer.counts.toArray
      .sortWith { case ((ka, ca), (kb, cb)) => ca > cb || (ca == cb && ka < kb) }
      .map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c): Any
      }
    InternalRow(new GenericArrayData(items), buffer.decrements)
  }

  override def serialize(buffer: Buffer): Array[Byte] = {
    val entries = buffer.counts.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val size = 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buffer.decrements)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val decs = bb.getLong()
    val n = bb.getInt()
    val counts = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val bytes = new Array[Byte](len)
      bb.get(bytes)
      counts.update(new String(bytes, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    new Buffer(counts, decs)
  }

  override def dataType: DataType = FrequentItemsAgg.OutputType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"frequent_items requires a string item column, got ${other.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FrequentItemsAgg =
    copy(child = newChild)
  override def prettyName: String = "frequent_items"
}

object FrequentItemsAgg {
  /** Mutable MG state: live counters + total decrement mass (the
    * undercount bound reported as `max_error`).
    */
  final class Buffer(
      val counts: mutable.HashMap[String, Long],
      var decrements: Long)

  val OutputType: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))), containsNull = false),
      nullable = false),
    StructField("max_error", LongType, nullable = false)))
}
