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
    * segment is missing or traverses a type it cannot. Arrays and maps
    * descend through Spark's own nested-DDL spellings — `element`, `key`,
    * `value` — as VIRTUAL steps: a synthesized metadata-free StructField
    * carrying the container's inner type, so chain logic (existence,
    * parent-struct lookup, physical paths) works unchanged through
    * containers. A virtual step's "physical name" is its fixed spelling,
    * which is exactly how parquet names these repeated groups.
    */
  def fieldChain(schema: StructType, path: Seq[String]): Option[Seq[StructField]] =
    path match {
      case Seq() => None
      case head +: rest =>
        schema.fields.find(_.name.equalsIgnoreCase(head)).flatMap { f =>
          if (rest.isEmpty) Some(Seq(f))
          else descend(f.dataType, rest).map(f +: _)
        }
    }

  private def descend(
      dt: org.apache.spark.sql.types.DataType,
      rest: Seq[String]): Option[Seq[StructField]] = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    def virtualStep(name: String, inner: org.apache.spark.sql.types.DataType) = {
      val virt = StructField(name, inner)
      if (rest.tail.isEmpty) Some(Seq(virt))
      else descend(inner, rest.tail).map(virt +: _)
    }
    dt match {
      case st: StructType => fieldChain(st, rest)
      case ArrayType(et, _) if rest.head.equalsIgnoreCase("element") =>
        virtualStep("element", et)
      case MapType(kt, _, _) if rest.head.equalsIgnoreCase("key") =>
        virtualStep("key", kt)
      case MapType(_, vt, _) if rest.head.equalsIgnoreCase("value") =>
        virtualStep("value", vt)
      case _ => None
    }
  }

  /** [[fieldChain]] restricted to STRUCT-ONLY descent — the paths with
    * exactly ONE value per row (usable as stats keys, bloom columns,
    * cluster/z-order dimensions); a path traversing an array or map has a
    * variable number of values per row and no such identity.
    */
  def structLeafChain(schema: StructType, path: Seq[String]): Option[Seq[StructField]] =
    fieldChain(schema, path).filter(_.init.forall(_.dataType.isInstanceOf[StructType]))

  /** True when `path`'s LAST step is a container position (array `element`,
    * map `key`/`value`) rather than a named field — such a step has no
    * named identity, so RENAME/DROP refuse it (its TYPE can still widen,
    * and fields INSIDE it are addressed by one more path segment).
    */
  def lastStepIsContainer(schema: StructType, path: Seq[String]): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    path.length > 1 && fieldChain(schema, path.init).exists(_.last.dataType match {
      case _: ArrayType | _: MapType => true
      case _ => false
    })
  }

  /** The dotted PHYSICAL path of the field at `path` (used as the retired-
    * name key for nested drops).
    */
  def physicalPath(schema: StructType, path: Seq[String]): Option[String] =
    fieldChain(schema, path).map(_.map(physicalName).mkString("."))

  /** Rebuild `schema` with `fn` applied to the field at `path` (which must
    * exist); `fn` returning None drops the field. Containers along the path
    * keep their own names, metadata and order; the `element`/`key`/`value`
    * spellings traverse arrays and maps, where the terminal position is a
    * VIRTUAL field — `fn` may retype it (type widening) but renaming or
    * dropping it refuses loudly (no named identity).
    */
  def updateFieldAt(schema: StructType, path: Seq[String])(
      fn: StructField => Option[StructField]): StructType = {
    require(path.nonEmpty, "empty field path")
    StructType(schema.fields.flatMap { f =>
      if (!f.name.equalsIgnoreCase(path.head)) Some(f)
      else if (path.length == 1) fn(f)
      else Some(f.copy(dataType = updateType(f.dataType, path.tail, f.name)(fn)))
    })
  }

  private def updateType(
      dt: org.apache.spark.sql.types.DataType,
      path: Seq[String], parent: String)(
      fn: StructField => Option[StructField]): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType}
    def virtual(name: String, inner: DataType): DataType = fn(StructField(name, inner)) match {
      case Some(nf) =>
        require(nf.name == name,
          s"the $name of an array/map has no named identity to rename — " +
            "rename a struct field inside it instead")
        nf.dataType
      case None => throw new IllegalArgumentException(
        s"cannot drop the $name of an array/map — drop the container column instead")
    }
    dt match {
      case st: StructType => updateFieldAt(st, path)(fn)
      case ArrayType(et, n) if path.head.equalsIgnoreCase("element") =>
        if (path.length == 1) ArrayType(virtual("element", et), n)
        else ArrayType(updateType(et, path.tail, "element")(fn), n)
      case MapType(kt, vt, n) if path.head.equalsIgnoreCase("key") =>
        if (path.length == 1) MapType(virtual("key", kt), vt, n)
        else MapType(updateType(kt, path.tail, "key")(fn), vt, n)
      case MapType(kt, vt, n) if path.head.equalsIgnoreCase("value") =>
        if (path.length == 1) MapType(kt, virtual("value", vt), n)
        else MapType(kt, updateType(vt, path.tail, "value")(fn), n)
      case other => throw new IllegalArgumentException(
        s"$parent is ${other.simpleString} — cannot address ${path.mkString(".")} " +
          "(structs descend by field name; arrays/maps by element/key/value)")
    }
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
    val listHits = Seq("graft.bloom.columns", "graft.clusterBy",
        ParquetStats.StatsColumnsProperty).flatMap { k =>
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
