package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Harvests per-file statistics (`numRecords`, per-column min/max/nullCount)
  * from Parquet footers — metadata-only, no data scan, O(files) cheap driver
  * work. This is what makes file-level data skipping possible on a plain
  * Parquet directory (the capability the reference gets from Delta's
  * `snapshot.filesWithStatsForScan` / `txn.filterFiles`,
  * `DeltaHelpers.scala:112-124,216-218`).
  *
  * Canonical string encodings in the stats maps (totally ordered per type,
  * parsed back by [[FileSkipping]] using the snapshot schema):
  *  - integral/floating/boolean: `toString`
  *  - string: the raw string
  *  - timestamp: micros since epoch as a long string
  *  - date: days since epoch as an int string
  *
  * Scale note: at very large file counts, harvest can be distributed with
  * `sparkContext.parallelize(paths).map(readFooter)`; footers are ~KB each so
  * driver-side parallel IO is fine into the tens of thousands of files.
  */
object ParquetStats {

  /** Cap on NESTED struct-leaf stats per file (top-level primitives are
    * always indexed) — bounds the stats JSON carried by every AddFile.
    */
  val MaxNestedStatsLeaves = 32

  /** Table property naming which columns get per-file stats (Delta's
    * `delta.dataSkippingStatsColumns`): comma-separated dotted LOGICAL
    * column paths. When set, ONLY the listed columns — and, for a struct
    * path, the struct-only leaves under it — are indexed, so the
    * nested-leaf budget spends itself on the fields a user actually
    * filters on instead of schema walk order. Unset keeps the default:
    * every top-level primitive plus nested leaves in walk order, capped
    * at [[MaxNestedStatsLeaves]]. Un-indexed leaves stay correct —
    * predicates on them simply cannot prune and metadata-only aggregates
    * fall back to a scan.
    */
  val StatsColumnsProperty = "graft.dataSkippingStatsColumns"

  /** The property's PHYSICAL dotted path prefixes for `schema`, resolved
    * loudly (a typo'd entry would otherwise silently turn stats off for
    * the column the user meant). None = property unset (default walk).
    */
  def statsColumnsOf(
      properties: Map[String, String],
      schema: org.apache.spark.sql.types.StructType): Option[Seq[String]] =
    properties.get(StatsColumnsProperty).map { v =>
      val paths = v.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      require(paths.nonEmpty, s"$StatsColumnsProperty is set but names no columns")
      paths.map { p =>
        ColumnMapping.physicalPath(schema, p.split('.').toSeq).getOrElse(
          throw new IllegalArgumentException(
            s"$StatsColumnsProperty names '$p', which does not resolve in the " +
              s"table schema ${schema.simpleString}"))
      }
    }

  /** Read one file's footer → FileStats.
    *
    * @param only PHYSICAL dotted path prefixes to index (from
    *             [[statsColumnsOf]]): a leaf is harvested iff one entry
    *             equals it or names an ancestor struct. None = default
    *             selection (all top-level + capped nested walk).
    */
  def forFile(absPath: String, conf: Configuration = new Configuration(),
      only: Option[Seq[String]] = None): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(absPath), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val numRecords = blocks.map(_.getRowCount).sum
      val schema = footer.getFileMetaData.getSchema

      // Indexed leaves: every top-level primitive, plus primitives reached
      // through STRUCT-ONLY paths (no repeated groups, no LIST/MAP level —
      // array/map contents have no one-value-per-row leaf to bound), keyed
      // by the dotted path. Nested leaves are capped so a very wide nested
      // schema cannot bloat every AddFile's stats JSON (Delta caps its
      // indexed columns the same way). Keys are PHYSICAL names by
      // construction — the file's own schema.
      val indexed = scala.collection.mutable.LinkedHashMap
        .empty[Seq[String], org.apache.parquet.schema.PrimitiveType]
      var nestedBudget = MaxNestedStatsLeaves
      // explicit stats-column selection (StatsColumnsProperty): a leaf is
      // in iff a selector equals its path or names an ancestor struct
      val selectors: Option[Seq[Seq[String]]] =
        only.map(_.map(_.split('.').toSeq))
      def selected(path: Seq[String]): Boolean = selectors.forall(_.exists(sel =>
        sel.length <= path.length &&
          sel.zip(path).forall { case (a, b) => a.equalsIgnoreCase(b) }))
      def walk(fields: Seq[org.apache.parquet.schema.Type], prefix: Seq[String]): Unit =
        fields.foreach { f =>
          val path = prefix :+ f.getName
          if (f.isPrimitive) {
            if (prefix.isEmpty) {
              if (selected(path)) indexed(path) = f.asPrimitiveType()
            } else if (nestedBudget > 0 && selected(path)) {
              indexed(path) = f.asPrimitiveType(); nestedBudget -= 1
            }
          } else if (!f.isRepetition(org.apache.parquet.schema.Type.Repetition.REPEATED) &&
              f.getLogicalTypeAnnotation == null)
            walk(f.asGroupType().getFields.asScala.toSeq, path)
        }
      walk(schema.getFields.asScala.toSeq, Nil)

      val mins = scala.collection.mutable.Map.empty[String, Any]
      val maxs = scala.collection.mutable.Map.empty[String, Any]
      val nulls = scala.collection.mutable.Map.empty[String, Long]
      val nullsValid = scala.collection.mutable.Set.empty[String]
      indexed.keys.foreach { p => nulls(p.mkString(".")) = 0L; nullsValid += p.mkString(".") }

      blocks.foreach { block =>
        block.getColumns.asScala.foreach { chunk =>
          val pathParts = chunk.getPath.toArray.toSeq
          indexed.get(pathParts).foreach { ptype =>
            val name = pathParts.mkString(".")
            val st = chunk.getStatistics
            if (st != null && st.isNumNullsSet) {
              if (nullsValid(name)) nulls(name) = nulls(name) + st.getNumNulls
            } else nullsValid -= name
            decodeMinMax(st, ptype).foreach { case (mn, mx) =>
              mins(name) = mins.get(name).map(reduceVal(_, mn, min = true)).getOrElse(mn)
              maxs(name) = maxs.get(name).map(reduceVal(_, mx, min = false)).getOrElse(mx)
            }
          }
        }
      }

      FileStats(
        numRecords = numRecords,
        minValues = mins.map { case (k, v) => k -> v.toString }.toMap,
        maxValues = maxs.map { case (k, v) => k -> v.toString }.toMap,
        nullCount = nulls.filter { case (k, _) => nullsValid(k) }.toMap
      )
    } finally reader.close()
  }

  /** Decode a column chunk's min/max into canonical comparable values. */
  private def decodeMinMax(st: Statistics[_], ptype: org.apache.parquet.schema.PrimitiveType): Option[(Any, Any)] = {
    if (st == null || st.isEmpty || !st.hasNonNullValue) return None
    val logical = ptype.getLogicalTypeAnnotation
    def conv(v: Any): Option[Any] = (ptype.getPrimitiveTypeName, v) match {
      case (PrimitiveTypeName.BINARY, b: Binary)
          if logical.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(b.toStringUsingUTF8)
      case (PrimitiveTypeName.INT32, i: java.lang.Integer) => Some(i.intValue())
      case (PrimitiveTypeName.INT64, l: java.lang.Long)    => Some(l.longValue())
      case (PrimitiveTypeName.DOUBLE, d: java.lang.Double) => Some(d.doubleValue())
      case (PrimitiveTypeName.FLOAT, f: java.lang.Float)   => Some(f.floatValue())
      case (PrimitiveTypeName.BOOLEAN, b: java.lang.Boolean) => Some(b.booleanValue())
      case _ => None // INT96 timestamps, decimals, raw binary: no usable stats
    }
    for {
      mn <- conv(st.genericGetMin)
      mx <- conv(st.genericGetMax)
    } yield (mn, mx)
  }

  private def reduceVal(a: Any, b: Any, min: Boolean): Any = (a, b) match {
    case (x: Int, y: Int)         => if ((x < y) == min) x else y
    case (x: Long, y: Long)       => if ((x < y) == min) x else y
    case (x: Double, y: Double)   => if ((x < y) == min) x else y
    case (x: Float, y: Float)     => if ((x < y) == min) x else y
    case (x: Boolean, y: Boolean) => if ((!x) == min) x else y
    case (x: String, y: String)   => if (Utf8Order.lt(x, y) == min) x else y // Spark/parquet order, NOT UTF-16
    case _                        => a
  }
}
