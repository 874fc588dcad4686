package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile summary (KLL-style compactor ladder; Karnin, Lang &
  * Liberty, *Optimal Quantile Approximation in Streams*, FOCS'16 — the
  * DataSketches family), completing graft's sketch trio next to the HLL
  * distinct-counter and the Misra–Gries heavy-hitter summary.
  *
  * The 100 TB story: exact quantiles over a corpus need a full sort (or
  * Spark's `percentile`, which collects every value per group into one
  * aggregation buffer). This summary keeps at most `k` values per ladder
  * level (levels grow as log(n/k)), supports O(k log(n/k)) merge, and rides
  * Spark's partial aggregation: each input partition condenses locally and
  * only sketch buffers cross the shuffle — rank error is O(n/k)-bounded
  * regardless of input size or partitioning.
  *
  * Determinism: compaction keeps every 2nd sorted element, alternating the
  * starting offset via a compaction counter instead of KLL's random bit —
  * same worst-case rank-error shape, but reproducible for a fixed input and
  * partitioning. When `n < k` NO compaction ever happens and the summary
  * holds every value with weight 1 — quantiles are then EXACT order
  * statistics, the regime the driver oracle pins; the error bound in the
  * compacting regime is property-spec'd instead.
  *
  * Output: `struct(n: long, items: array<struct<value double, weight
  * long>>)` with items sorted by (value, weight) — a self-describing
  * weighted sample that [[SketchQuantile]] turns into quantile estimates.
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchAgg.Buffer]
  with UnaryLike[Expression] {

  require(k >= 8, s"quantile_sketch: k must be >= 8, got $k")

  import QuantileSketchAgg.Buffer

  override def createAggregationBuffer(): Buffer = new Buffer(ArrayBuffer(ArrayBuffer.empty[Double]), 0L, 0L)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buffer.levels(0) += v.asInstanceOf[Double]
      buffer.n += 1L
      if (buffer.levels(0).length >= k) compactCascade(buffer, 0)
    }
    buffer
  }

  /** Compact `level`: sort, promote every 2nd element (weight doubles) to
    * `level + 1`, cascading while a level is at capacity. The starting
    * offset alternates with the compaction counter — the deterministic
    * stand-in for KLL's coin flip.
    */
  private def compactCascade(buffer: Buffer, from: Int): Unit = {
    var level = from
    while (level < buffer.levels.length && buffer.levels(level).length >= k) {
      val items = buffer.levels(level).toArray
      java.util.Arrays.sort(items)
      if (level + 1 >= buffer.levels.length) buffer.levels += ArrayBuffer.empty[Double]
      val offset = (buffer.compactions % 2L).toInt
      buffer.compactions += 1L
      val up = buffer.levels(level + 1)
      var i = offset
      while (i < items.length) { up += items(i); i += 2 }
      buffer.levels(level).clear()
      level += 1
    }
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    while (buffer.levels.length < other.levels.length) buffer.levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < other.levels.length) {
      buffer.levels(i) ++= other.levels(i)
      i += 1
    }
    buffer.n += other.n
    buffer.compactions += other.compactions
    i = 0
    while (i < buffer.levels.length) {
      if (buffer.levels(i).length >= k) compactCascade(buffer, i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var level = 0
    while (level < buffer.levels.length) {
      val w = 1L << level
      buffer.levels(level).foreach(v => items += ((v, w)))
      level += 1
    }
    val sorted = items.sortBy(identity).map { case (v, w) => InternalRow(v, w): Any }
    InternalRow(buffer.n, new GenericArrayData(sorted.toArray))
  }

  override def serialize(buffer: Buffer): Array[Byte] = {
    val size = 8 + 8 + 4 + buffer.levels.map(l => 4 + 8 * l.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buffer.n)
    bb.putLong(buffer.compactions)
    bb.putInt(buffer.levels.length)
    buffer.levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getLong()
    val compactions = bb.getLong()
    val nLevels = bb.getInt()
    val levels = ArrayBuffer.empty[ArrayBuffer[Double]]
    var i = 0
    while (i < nLevels) {
      val len = bb.getInt()
      val l = new ArrayBuffer[Double](len)
      var j = 0
      while (j < len) { l += bb.getDouble(); j += 1 }
      levels += l
      i += 1
    }
    if (levels.isEmpty) levels += ArrayBuffer.empty[Double]
    new Buffer(levels, n, compactions)
  }

  override def dataType: DataType = QuantileSketchAgg.OutputType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch requires a double value column (cast first), got ${other.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "quantile_sketch"
}

object QuantileSketchAgg {
  /** Ladder state: `levels(i)` holds values of weight 2^i; `compactions`
    * drives the deterministic offset alternation.
    */
  final class Buffer(
      val levels: ArrayBuffer[ArrayBuffer[Double]],
      var n: Long,
      var compactions: Long)

  val OutputType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("value", DoubleType, nullable = false),
      StructField("weight", LongType, nullable = false))), containsNull = false),
      nullable = false)))
}

/** `sketch_quantile(sketch, p)`: the p-quantile estimate from a
  * [[QuantileSketchAgg]] summary — the value at weighted rank `ceil(p * n)`
  * (clamped to [1, n]) over the value-sorted weighted sample. In the exact
  * regime (no compaction happened) this IS the discrete order statistic
  * `sorted[ceil(p * n) - 1]`. NULL on NULL inputs or an empty sketch.
  *
  * Interpreted eval (CodegenFallback) is deliberate: the expression runs
  * once per GROUP on an O(k log(n/k)) struct, never per input row — it is
  * not on any hot path.
  */
case class SketchQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (s: StructType, DoubleType)
        if s.length == 2 && s(0).dataType == LongType &&
          s(1).dataType.isInstanceOf[ArrayType] =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sketch_quantile requires (quantile_sketch struct, double), got (${l.sql}, ${r.sql})")
  }

  override protected def nullSafeEval(sketch: Any, p: Any): Any = {
    val row = sketch.asInstanceOf[InternalRow]
    val n = row.getLong(0)
    if (n <= 0L) return null
    val prob = p.asInstanceOf[Double]
    val items = row.getArray(1)
    val target = math.min(n, math.max(1L, math.ceil(prob * n).toLong))
    var cum = 0L
    var i = 0
    val len = items.numElements()
    var result: Any = null
    while (i < len && result == null) {
      val item = items.getStruct(i, 2)
      cum += item.getLong(1)
      if (cum >= target) result = item.getDouble(0)
      i += 1
    }
    // compaction can shrink total weight below n; fall back to the max
    if (result == null && len > 0) result = items.getStruct(len - 1, 2).getDouble(0)
    result
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sketch_quantile"
}
