package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.tables.{GraftTable, TableWriter}

/** `USING graft` — a Spark data-source binding for versioned graft tables, so
  * they live in the REAL Spark catalog like the reference's metastore tables
  * (`CREATE TABLE default.x USING DELTA LOCATION ...`,
  * reference `OperationMetricHelperSpec.scala:288`, `DeltaHelperSpec.scala:438`).
  *
  * A plain `USING parquet LOCATION` catalog table would be WRONG for a graft
  * table: the directory keeps tombstoned files physically until VACUUM, so a
  * directory-level scan reads dead rows. This relation instead resolves the
  * commit log at scan time and reads exactly the current snapshot's live
  * files.
  *
  * Scale design: [[GraftRelation.buildScan]] applies the requested column
  * pruning and every translatable filter to the inner snapshot-scoped parquet
  * DataFrame, so pushdown reaches the parquet reader (`PushedFilters` /
  * `ReadSchema` in the inner scan) — the relation adds no materialization of
  * its own. Correctness never depends on the translation: the default
  * `unhandledFilters` keeps Spark re-applying all filters above the scan.
  *
  * Registered under the short name `graft` (META-INF/services), so
  * `CREATE TABLE name USING graft LOCATION '<path>'` and
  * `df.write.format("graft")` both resolve it.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String = {
    val p = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft data source requires a path (LOCATION '<dir>' or option(\"path\", ...))"))
    // the catalog qualifies LOCATION into a (percent-encoded) file: URI
    if (p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p
  }

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext, pathOf(parameters))

  /** `df.write.format("graft").mode(...).save(path)` — maps SaveMode onto the
    * table writer's commit protocol (Append/Overwrite commits, ErrorIfExists /
    * Ignore on an existing log).
    */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val exists = GraftTable.exists(path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"graft table already exists at $path")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        TableWriter.write(spark, path, data, TableWriter.Append)
      case SaveMode.Overwrite if exists =>
        TableWriter.write(spark, path, data, TableWriter.Overwrite,
          partitionColumns = GraftTable.forPath(spark, path).snapshot.metadata.partitionColumns)
      case _ =>
        val partitions = parameters.get("partitionColumns")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        GraftTable.create(spark, path, data, partitions)
        ()
    }
    GraftRelation(sqlContext, path)
  }
}

/** Catalog-resolvable view of one graft table. The schema is fixed at
  * resolution time (Spark caches the resolved plan per table name — after a
  * schema-evolving write, `spark.catalog.refreshTable(name)` picks up the new
  * columns), but DATA is always current: every `buildScan` re-reads the
  * commit log and scans the then-live snapshot files.
  */
case class GraftRelation(sqlContext: SQLContext, path: String)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  override val schema: StructType =
    GraftTable.forPath(sqlContext.sparkSession, path).snapshot.schema

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val snap = GraftTable.forPath(sqlContext.sparkSession, path).toDF
    val filtered = filters.flatMap(GraftRelation.translate).foldLeft(snap)(_.where(_))
    // empty projection (e.g. COUNT(*)) still needs the row cardinality
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }

  /** SQL `INSERT INTO name` / `INSERT OVERWRITE TABLE name`. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val spark = sqlContext.sparkSession
    if (overwrite) GraftTable.forPath(spark, path).overwrite(data)
    else GraftTable.forPath(spark, path).append(data)
    ()
  }
}

object GraftRelation {

  /** Best-effort `sources.Filter` → `Column` translation. Untranslated
    * filters are simply not pushed — Spark re-applies every filter above the
    * scan (default `unhandledFilters`), so this is purely an optimization.
    */
  private[sources] def translate(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r)                => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r)                 => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c)                   => translate(c).map(not)
    case _                        => None
  }
}
