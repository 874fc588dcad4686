package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.operators.TableOps
import graft.tables.{AddFile, GraftTable, RemoveFile}

/** Maintenance statements as runnable commands (Delta's SQL surface shape:
  * `OPTIMIZE` / `VACUUM` / `RESTORE` / `FSCK REPAIR TABLE` /
  * `DESCRIBE HISTORY`). Each wraps the corresponding [[TableOps]] /
  * [[GraftTable]] operation; the SQL grammar lives in [[GraftSqlParser]].
  * All driver work here is O(log metadata) — the heavy lifting stays in the
  * distributed operation the command delegates to.
  */
case class GraftOptimizeCommand(
    path: String, where: Option[String], zorderBy: Seq[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("numFilesRemoved", LongType, nullable = false)(),
    AttributeReference("numFilesAdded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val before = t.version
    val v =
      if (zorderBy.nonEmpty) TableOps.zorder(t, zorderBy, where)
      else TableOps.compact(t, where)
    if (v == before) Seq(Row(v, 0L, 0L)) // no-op: nothing worth rewriting
    else {
      val actions = t.log.actionsAt(v)
      Seq(Row(v,
        actions.count(_.isInstanceOf[RemoveFile]).toLong,
        actions.count(_.isInstanceOf[AddFile]).toLong))
    }
  }
}

case class GraftVacuumCommand(
    path: String, retainHours: Option[Double], dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    if (dryRun) Seq(AttributeReference("path", StringType, nullable = false)())
    else Seq(AttributeReference("numFilesDeleted", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    def configuredHours = t.snapshot.metadata.properties
      .get(TableOps.LogRetentionProperty).map(TableOps.parseRetentionHours)
      .getOrElse(TableOps.DefaultLogRetentionHours)
    val hours = retainHours.getOrElse(configuredHours)
    if (dryRun) TableOps.vacuumDryRun(t, hours).map(Row(_))
    else Seq(Row(TableOps.vacuum(t, hours).toLong))
  }
}

case class GraftRestoreCommand(
    path: String, version: Option[Long], timestamp: Option[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("restoredVersion", LongType, nullable = false)(),
    AttributeReference("committedVersion", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val committed = (version, timestamp) match {
      case (Some(v), None)  => TableOps.restore(t, v)
      case (None, Some(ts)) => TableOps.restoreToTimestamp(t, ts)
      case _ => throw new IllegalArgumentException(
        "RESTORE needs exactly one of VERSION AS OF / TIMESTAMP AS OF")
    }
    val restored = version.getOrElse {
      // the restore commit records its target version in the parameters
      t.log.actionsAt(committed)
        .collectFirst { case c: graft.tables.CommitInfo =>
          c.operationParameters.get("version").map(_.toLong) }
        .flatten.getOrElse(committed)
    }
    Seq(Row(restored, committed))
  }
}

case class GraftFsckCommand(path: String, dryRun: Boolean)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("removedFile", StringType, nullable = false)(),
    AttributeReference("dryRun", BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    TableOps.fsck(t, dryRun).map(Row(_, dryRun))
  }
}

case class GraftConvertCommand(path: String, partitionDdl: Option[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("numConvertedFiles", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val ps = partitionDdl.map(StructType.fromDDL).getOrElse(new StructType())
    val t = GraftTable.convert(spark, path, ps)
    Seq(Row(t.snapshot.numFiles))
  }
}

case class GraftDeleteCommand(path: String, where: Option[String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("numDeletedRows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val v = TableOps.delete(t, where)
    Seq(Row(v, commitMetric(t, v, "numDeletedRows")))
  }
  private def commitMetric(t: GraftTable, v: Long, key: String): Long =
    t.log.actionsAt(v).collectFirst { case c: graft.tables.CommitInfo =>
      c.operationMetrics.get(key).map(_.toLong) }.flatten.getOrElse(0L)
}

case class GraftUpdateCommand(
    path: String, where: Option[String], set: Seq[(String, String)])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("numUpdatedRows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    val v = TableOps.update(t, where, set.toMap)
    val n = t.log.actionsAt(v).collectFirst { case c: graft.tables.CommitInfo =>
      c.operationMetrics.get("numUpdatedRows").map(_.toLong) }.flatten.getOrElse(0L)
    Seq(Row(v, n))
  }
}

case class GraftDescribeHistoryCommand(path: String)
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("operationParameters",
      MapType(StringType, StringType), nullable = false)(),
    AttributeReference("operationMetrics",
      MapType(StringType, StringType), nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.forPath(spark, path)
    t.history().map { case (v, ci) =>
      Row(v, new java.sql.Timestamp(ci.timestamp), ci.operation,
        ci.operationParameters, ci.operationMetrics)
    }
  }
}
