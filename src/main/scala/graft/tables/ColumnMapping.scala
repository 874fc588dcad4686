package graft.tables

import org.apache.spark.sql.types.{Metadata => FieldMetadata, MetadataBuilder, StructField, StructType}

/** Column mapping ("name mode") — metadata-only RENAME / DROP COLUMN, the
  * Delta `delta.columnMapping.mode=name` capability re-built for the graft
  * substrate. At 100 TB the point is absolute: renaming a column must be a
  * one-line log commit, never a table rewrite.
  *
  * Model: every schema field has a PHYSICAL name — the column name actually
  * stored in parquet files — defaulting to its own (logical) name and
  * recorded in the field's metadata under [[PhysicalNameKey]] once the two
  * diverge. Physical names are immutable for the life of a column:
  *  - RENAME changes only the logical name, pinning the physical one;
  *  - DROP removes the field and retires its physical name into
  *    [[DroppedProperty]] so a later column of the same logical name gets a
  *    FRESH `col_<uuid>` physical name (old files' bytes never resurface
  *    under the new column);
  *  - ADD (explicit or append schema-merge) assigns `col_<uuid>` only on a
  *    collision with a live or retired physical name.
  *
  * Boundary discipline: the entire engine — operators, merge, CDC assembly,
  * SQL — speaks LOGICAL names. Exactly two layers translate: the staged
  * write (logical → physical column rename just before parquet) and scan
  * construction (relation built on the physical schema, aliased back to
  * logical directly above). Files written before a table ever renamed have
  * physical == logical, so unmapped tables take byte-identical code paths.
  */
object ColumnMapping {

  /** Table property marking the mapping mode (`name` once any rename/drop
    * has happened; absent = identity mapping).
    */
  val ModeProperty = "graft.columnMapping.mode"

  /** Comma-joined physical names retired by DROP COLUMN. */
  val DroppedProperty = "graft.columnMapping.droppedPhysicalNames"

  /** StructField-metadata key carrying the physical name when it differs
    * from the logical one (Delta stores its mapping the same way).
    */
  val PhysicalNameKey = "graft.columnMapping.physicalName"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** True when any field's physical name differs from its logical one, at
    * ANY nesting depth — nested struct fields carry [[PhysicalNameKey]] in
    * their own metadata once renamed.
    */
  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name || typeMapped(f.dataType))

  private def typeMapped(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case st: StructType => isMapped(st)
    case org.apache.spark.sql.types.ArrayType(et, _) => typeMapped(et)
    case org.apache.spark.sql.types.MapType(k, v, _) => typeMapped(k) || typeMapped(v)
    case _ => false
  }

  /** `dt` as stored in parquet: nested struct field names replaced by their
    * physical names, metadata dropped (files know nothing of it).
    */
  def physicalDataType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(physicalName(f), physicalDataType(f.dataType), f.nullable)))
    case org.apache.spark.sql.types.ArrayType(et, n) =>
      org.apache.spark.sql.types.ArrayType(physicalDataType(et), n)
    case org.apache.spark.sql.types.MapType(k, v, n) =>
      org.apache.spark.sql.types.MapType(physicalDataType(k), physicalDataType(v), n)
    case other => other
  }

  /** `dt` with its LOGICAL names, no field metadata, and every nesting
    * level nullable — the cast target of the read boundary's
    * physical→logical translation (Cast refuses a nullable source field
    * against a NOT NULL target field, and relabeling must never care).
    */
  def cleanLogicalDataType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, cleanLogicalDataType(f.dataType))))
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(cleanLogicalDataType(et), containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(
        cleanLogicalDataType(k), cleanLogicalDataType(v), valueContainsNull = true)
    case other => other
  }

  /** [[physicalDataType]] with every nesting level nullable — the cast
    * target of the WRITE boundary's logical→physical relabeling.
    */
  def physicalCastTarget(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = cleanNullable(physicalDataType(dt))

  private def cleanNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, cleanNullable(f.dataType))))
    case org.apache.spark.sql.types.ArrayType(et, _) =>
      org.apache.spark.sql.types.ArrayType(cleanNullable(et), containsNull = true)
    case org.apache.spark.sql.types.MapType(k, v, _) =>
      org.apache.spark.sql.types.MapType(
        cleanNullable(k), cleanNullable(v), valueContainsNull = true)
    case other => other
  }

  /** The schema as stored in parquet: logical names replaced by physical at
    * every depth. Field metadata is dropped (it is a log-level concern; the
    * files know nothing of it).
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      StructField(physicalName(f), physicalDataType(f.dataType), f.nullable)))

  /** logical → physical name map (logical keys as-is). */
  def logicalToPhysical(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  def withPhysicalName(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalNameKey, physical).build())

  def droppedPhysicals(properties: Map[String, String]): Set[String] =
    properties.get(DroppedProperty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  /** Assign physical names to fields newly APPENDED to `current` (explicit
    * ADD COLUMNS or append schema-merge): identity unless the logical name
    * collides — case-insensitively — with a live or retired physical name,
    * in which case a fresh `col_<uuid>` is minted. No-op for tables that
    * never mapped (no retired names, no divergent physicals → no collision
    * beyond the duplicate-column check upstream).
    */
  def assignPhysicalNames(
      current: StructType,
      appended: Seq[StructField],
      properties: Map[String, String]): Seq[StructField] = {
    val taken = current.fields.map(f => physicalName(f).toLowerCase).toSet ++
      droppedPhysicals(properties).map(_.toLowerCase)
    appended.map { f =>
      if (f.metadata.contains(PhysicalNameKey)) f
      else if (taken.contains(f.name.toLowerCase))
        withPhysicalName(f, s"col_${java.util.UUID.randomUUID()}")
      else f
    }
  }

  /** Rename `df`'s columns (a subset of `schema`'s logical names, matched
    * case-insensitively) to their physical names — the write boundary's
    * translation. Identity (and alias-free) when nothing is mapped.
    */
  def toPhysical(df: org.apache.spark.sql.DataFrame, schema: StructType)
      : org.apache.spark.sql.DataFrame = {
    if (!isMapped(schema)) return df
    val byLogical = schema.fields.map(f => f.name.toLowerCase -> f).toMap
    import org.apache.spark.sql.functions.col
    df.select(df.columns.map { c =>
      byLogical.get(c.toLowerCase) match {
        case Some(f) =>
          val p = physicalName(f)
          // a nested mapping renames struct fields via a positional cast
          // (same shape, same types — the cast only relabels)
          val base =
            if (typeMapped(f.dataType)) col(s"`$c`").cast(physicalCastTarget(f.dataType))
            else col(s"`$c`")
          if (p != c || typeMapped(f.dataType)) base.as(p) else base
        case _ => col(s"`$c`")
      }
    }.toIndexedSeq: _*)
  }

  /** Rename `df`'s PHYSICAL columns back to their logical names — the read
    * boundary's translation (CDF assembly, stream change reads). Columns not
    * in `schema`'s mapping (e.g. `_change_type`, or a column dropped after
    * the read range) pass through untouched. Identity when nothing is
    * mapped, so unmapped tables keep their exact current plans.
    */
  def toLogical(df: org.apache.spark.sql.DataFrame, schema: StructType)
      : org.apache.spark.sql.DataFrame = {
    if (!isMapped(schema)) return df
    val byPhysical = schema.fields
      .map(f => physicalName(f).toLowerCase -> f).toMap
    import org.apache.spark.sql.functions.col
    df.select(df.columns.map { c =>
      byPhysical.get(c.toLowerCase) match {
        case Some(f) =>
          val base =
            if (typeMapped(f.dataType)) col(s"`$c`").cast(cleanLogicalDataType(f.dataType))
            else col(s"`$c`")
          if (f.name != c || typeMapped(f.dataType)) base.as(f.name) else base
        case _ => col(s"`$c`")
      }
    }.toIndexedSeq: _*)
  }

  /** The chain of fields along `path` (logical names, case-insensitive;
    * `Seq("s","a")` = field `a` of struct column `s`), or None when any
    * segment is missing or traverses a non-struct. Paths address struct
    * fields only — array elements and map entries have no named identity
    * to rename.
    */
  def fieldChain(schema: StructType, path: Seq[String]): Option[Seq[StructField]] =
    path match {
      case Seq() => None
      case head +: rest =>
        schema.fields.find(_.name.equalsIgnoreCase(head)).flatMap { f =>
          if (rest.isEmpty) Some(Seq(f))
          else f.dataType match {
            case st: StructType => fieldChain(st, rest).map(f +: _)
            case _ => None
          }
        }
    }

  /** The dotted PHYSICAL path of the field at `path` (used as the retired-
    * name key for nested drops).
    */
  def physicalPath(schema: StructType, path: Seq[String]): Option[String] =
    fieldChain(schema, path).map(_.map(physicalName).mkString("."))

  /** Rebuild `schema` with `fn` applied to the field at `path` (which must
    * exist); `fn` returning None drops the field. Containers along the path
    * keep their own names, metadata and order.
    */
  def updateFieldAt(schema: StructType, path: Seq[String])(
      fn: StructField => Option[StructField]): StructType = {
    require(path.nonEmpty, "empty field path")
    StructType(schema.fields.flatMap { f =>
      if (!f.name.equalsIgnoreCase(path.head)) Some(f)
      else if (path.length == 1) fn(f)
      else f.dataType match {
        case st: StructType =>
          Some(f.copy(dataType = updateFieldAt(st, path.tail)(fn)))
        case other => throw new IllegalArgumentException(
          s"${f.name} is ${other.simpleString}, not a struct — cannot address ${path.mkString(".")}")
      }
    })
  }

  /** The PHYSICAL names of the table's partition columns (metadata stores
    * the logical names; file paths and `partitionValues` keys are physical).
    */
  def physicalPartitionColumns(schema: StructType, partCols: Seq[String]): Seq[String] =
    partCols.map(c =>
      schema.fields.find(_.name.equalsIgnoreCase(c))
        .map(physicalName).getOrElse(c))

  /** Columns of `properties` a rename/drop must not touch: CHECK-constraint
    * references, bloom-indexed columns, clusterBy columns. Returning the
    * offending (property, reference) pairs keeps the error message exact.
    */
  def propertyReferences(
      spark: org.apache.spark.sql.SparkSession,
      properties: Map[String, String], column: String): Seq[String] = {
    // dotted = nested struct field; a hit is any reference whose path and
    // the column's path PREFIX each other (renaming `s.a` is blocked by a
    // constraint on `s.a.x`, and renaming `s` by one on `s.a`)
    val parts = column.toLowerCase.split('.').toSeq
    def overlaps(ref: Seq[String]): Boolean =
      ref.startsWith(parts) || parts.startsWith(ref)
    val constraintHits = GraftTable.constraintsOf(properties).collect {
      case (name, pred) if spark.sessionState.sqlParser.parseExpression(pred)
        .collect { case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.nameParts.map(_.toLowerCase) }
        .exists(overlaps) => s"CHECK constraint $name ($pred)"
    }.toSeq
    val listHits = Seq("graft.bloom.columns", "graft.clusterBy").flatMap { k =>
      properties.get(k).toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
        .filter(c => overlaps(c.toLowerCase.split('.').toSeq)).map(_ => s"table property $k")
    }
    // name-KEYED feature properties: a generated/identity column's property
    // key carries the column name — renaming or dropping the column would
    // silently orphan the key (the column stops being generated/identity)
    val generatedHits = properties.collect {
      case (k, genExpr) if k.startsWith(GraftTable.GeneratedPropertyPrefix) &&
        (overlaps(k.stripPrefix(GraftTable.GeneratedPropertyPrefix)
            .toLowerCase.split('.').toSeq) ||
          spark.sessionState.sqlParser.parseExpression(genExpr)
            .collect { case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              u.nameParts.map(_.toLowerCase) }
            .exists(overlaps)) =>
        s"generated column ${k.stripPrefix(GraftTable.GeneratedPropertyPrefix)} ($genExpr)"
    }.toSeq
    val identityHits = properties.keys.collect {
      case k if k.startsWith(GraftTable.IdentityPropertyPrefix) &&
        overlaps(k.stripPrefix(GraftTable.IdentityPropertyPrefix)
          .stripSuffix(".high").toLowerCase.split('.').toSeq) =>
        s"identity column ${k.stripPrefix(GraftTable.IdentityPropertyPrefix).stripSuffix(".high")}"
    }.toSeq.distinct
    constraintHits ++ listHits ++ generatedHits ++ identityHits
  }
}
