package graft.catalog

import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension, Identifier, Table}

import graft.tables.GraftTable

/** Optional `spark_catalog` wrapper (the shape Delta ships as DeltaCatalog):
  *
  * {{{
  *   spark.sql.catalog.spark_catalog = graft.catalog.GraftSessionCatalog
  *   spark.sql.extensions            = graft.sql.GraftSparkSessionExtension
  * }}}
  *
  * Resolves `` graft.`/path/to/table` `` identifiers in ANY SQL relation
  * position — SELECT, subqueries, joins, views, `VERSION/TIMESTAMP AS OF`
  * time travel — to the graft table at that path. This must happen at
  * CATALOG resolution: Spark's `ResolveSQLOnFile` (the rule behind
  * `` parquet.`/path` `` direct queries) runs earlier in the resolution
  * batch and REFUSES non-`FileFormat` sources outright
  * (UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY), so a plain resolution rule
  * injected by the extension never gets the chance. Identifier shape
  * claimed: single namespace part `graft` (case-insensitive) + a name that
  * LOOKS like a path (contains `/`) and actually holds a graft table —
  * everything else (including a real metastore database named `graft`)
  * delegates to the builtin session catalog untouched.
  *
  * The returned [[GraftV2Table]] flows into the exact machinery catalog
  * tables use: the extension's read-fallback rule swaps reads onto the
  * native vectorized scan, Spark-native DML routes through
  * GraftRowLevelRewrite, and INSERT takes the V1 write fallback.
  */
class GraftSessionCatalog extends DelegatingCatalogExtension {

  /** The graft-table path this identifier addresses, if it is ours. */
  private def graftPath(ident: Identifier): Option[String] =
    if (ident.namespace.length == 1 &&
        ident.namespace()(0).equalsIgnoreCase("graft") &&
        ident.name.contains('/') &&
        GraftTable.exists(ident.name))
      Some(ident.name)
    else None

  override def loadTable(ident: Identifier): Table =
    graftPath(ident) match {
      case Some(p) => new GraftV2Table(p, ident)
      case None    => super.loadTable(ident)
    }

  /** `VERSION AS OF n` over a path table. */
  override def loadTable(ident: Identifier, version: String): Table =
    graftPath(ident) match {
      case Some(p) =>
        val v = try version.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"graft time travel takes a numeric version, got '$version'")
        }
        new GraftV2Table(p, ident, versionAsOf = Some(v))
      case None => super.loadTable(ident, version)
    }

  /** `TIMESTAMP AS OF t` over a path table (micros, per the V2 contract):
    * resolved to the newest version committed at-or-before the instant —
    * the same rule the path reader's `timestampAsOf` option applies.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    graftPath(ident) match {
      case Some(p) =>
        val millis = timestampMicros / 1000L
        val v = new graft.tables.GraftLog(p).versionAtOrBefore(millis).getOrElse(
          throw new IllegalArgumentException(
            s"TIMESTAMP AS OF is before the first commit of $p"))
        new GraftV2Table(p, ident, versionAsOf = Some(v))
      case None => super.loadTable(ident, timestampMicros)
    }

  override def tableExists(ident: Identifier): Boolean =
    graftPath(ident).isDefined || super.tableExists(ident)

  /** A path-shaped graft identifier in CREATE position would otherwise
    * fall through to the delegate and die confusingly in a "database
    * graft" lookup — refuse with the supported route instead. (A graft
    * table needs no registration: once created by path it is immediately
    * queryable as `` graft.`/path` ``.)
    */
  private def refuseCreate(ident: Identifier): Unit =
    if (ident.namespace.length == 1 &&
        ident.namespace()(0).equalsIgnoreCase("graft") &&
        ident.name.contains('/'))
      throw new UnsupportedOperationException(
        s"CREATE TABLE graft.`${ident.name}` is not supported — create the " +
          "table by path (df.write.format(\"graft\").save(path), " +
          "GraftTable.create, or CREATE TABLE <name> USING graft LOCATION " +
          "'<path>'); it is then immediately queryable as graft.`<path>`")

  override def createTable(
      ident: Identifier,
      schema: org.apache.spark.sql.types.StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    refuseCreate(ident)
    super.createTable(ident, schema, partitions, properties)
  }

  override def createTable(
      ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    refuseCreate(ident)
    super.createTable(ident, columns, partitions, properties)
  }
}
