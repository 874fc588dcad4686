package graft.log

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructType}

import graft.tables.GraftLog

/** Per-version insert/update/delete count analytics from the commit log —
  * parity with the reference's `OperationMetricHelper`
  * (`OperationMetricHelper.scala:11-262`, SURVEY §2.4 L1–L8). All log walking
  * is driver-side; the only distributed work is the per-partition WRITE
  * re-derivation (L5), which reads one log JSON file.
  */
object OperationMetricHelper {
  /** Construct from a registered table name (GraftTable.registerTable). */
  def forName(spark: SparkSession, name: String,
      startingVersion: Long = 0, endingVersion: Option[Long] = None): OperationMetricHelper =
    OperationMetricHelper(spark, graft.tables.GraftTable.forName(spark, name).path,
      startingVersion, endingVersion)
}

case class OperationMetricHelper(
    spark: SparkSession,
    path: String,
    startingVersion: Long = 0,
    endingVersion: Option[Long] = None
) {
  private val log = new GraftLog(path)
  private val metricColumns = Seq("version", "deleted", "inserted", "updated", "source_rows")

  /** L1 — count metrics as a DataFrame, newest version first. */
  def getCountMetricsAsDF(partitionCondition: Option[String] = None): DataFrame = {
    import spark.implicits._
    getCountMetrics(partitionCondition).toDF(metricColumns: _*)
  }

  /** L2 — count metrics as tuples `(version, deleted, inserted, updated, source_rows)`. */
  def getCountMetrics(
      partitionCondition: Option[String] = None): Seq[(Long, Long, Long, Long, Long)] = {
    val histories = partitionCondition match {
      case None => getHistory
      case Some(condition) => getHistory.filter(h => filterHistoryByPartition(h, condition))
    }
    transformMetric(generateMetric(histories, partitionCondition))
  }

  private def getHistory: Seq[GraftHistory] = {
    val end = endingVersion.getOrElse(log.latestVersion())
    log.history()
      .filter { case (v, _) => v >= startingVersion && v <= end }
      .map { case (v, ci) =>
        GraftHistory(v, ci.timestamp, ci.operation, ci.operationParameters, ci.operationMetrics)
      }
  }

  /** L4 — ADT → (deleted, inserted, updated, source_rows) per version. */
  private def transformMetric(
      metric: Seq[(Long, OperationMetrics)]): Seq[(Long, Long, Long, Long, Long)] =
    metric.flatMap { case (version, m) =>
      m match {
        case mm: MergeMetric =>
          Seq((version, mm.numTargetRowsDeleted, mm.numTargetRowsInserted,
            mm.numTargetRowsUpdated, mm.numSourceRows))
        case wm: WriteMetric => Seq((version, 0L, wm.numOutputRows, 0L, wm.numOutputRows))
        case dm: DeleteMetric => Seq((version, dm.numDeletedRows, 0L, 0L, 0L))
        case um: UpdateMetric => Seq((version, 0L, 0L, um.numUpdatedRows, 0L))
        case _ => Seq.empty
      }
    }

  /** L3 — history rows → metric ADTs. Like the reference (`:200-258`), MERGE
    * requires all keys; DELETE/UPDATE default absent keys to 0; operations
    * other than MERGE/WRITE/DELETE/UPDATE are dropped.
    */
  private def generateMetric(
      histories: Seq[GraftHistory],
      partitionCondition: Option[String]): Seq[(Long, OperationMetrics)] =
    histories.map { h =>
      val metrics = h.operationMetrics
      val adt: OperationMetrics = h.operation match {
        case "MERGE" =>
          MergeMetric(
            numTargetRowsCopied = metrics("numTargetRowsCopied").toLong,
            numTargetRowsDeleted = metrics("numTargetRowsDeleted").toLong,
            numTargetFilesAdded = metrics("numTargetFilesAdded").toLong,
            executionTimeMs = metrics("executionTimeMs").toLong,
            numTargetRowsInserted = metrics("numTargetRowsInserted").toLong,
            scanTimeMs = metrics("scanTimeMs").toLong,
            numTargetRowsUpdated = metrics("numTargetRowsUpdated").toLong,
            numOutputRows = metrics("numOutputRows").toLong,
            numTargetChangeFilesAdded = metrics("numTargetChangeFilesAdded").toLong,
            numSourceRows = metrics("numSourceRows").toLong,
            numTargetFilesRemoved = metrics("numTargetFilesRemoved").toLong,
            rewriteTimeMs = metrics("rewriteTimeMs").toLong
          )
        case "WRITE" =>
          partitionCondition match {
            case None =>
              WriteMetric(
                numFiles = metrics("numFiles").toLong,
                numOutputRows = metrics("numOutputRows").toLong,
                numOutputBytes = metrics("numOutputBytes").toLong)
            case Some(condition) =>
              WriteMetric(0L, getWriteMetricByPartition(condition, h.version), 0L)
          }
        case "DELETE" =>
          def k(key: String) = metrics.get(key).map(_.toLong).getOrElse(0L)
          DeleteMetric(k("numDeletedRows"), k("numAddedFiles"), k("numCopiedRows"),
            k("numRemovedFiles"), k("numAddedChangeFiles"), k("numRemovedBytes"),
            k("numAddedBytes"), k("executionTimeMs"), k("scanTimeMs"), k("rewriteTimeMs"))
        case "UPDATE" =>
          def k(key: String) = metrics.get(key).map(_.toLong).getOrElse(0L)
          UpdateMetric(k("numRemovedFiles"), k("numCopiedRows"), k("numAddedChangeFiles"),
            k("executionTimeMs"), k("scanTimeMs"), k("numAddedFiles"),
            k("numUpdatedRows"), k("rewriteTimeMs"))
        case _ => null
      }
      (h.version, adt)
    }.filter(_._2 != null)

  /** L5 — inserted-row count of a WRITE version restricted to a partition:
    * read that version's log JSON, parse per-file `add.stats`, sum
    * `numRecords` of files whose path matches every `k=v` partition dir
    * (same distributed pattern as the reference `:73-98`).
    */
  def getWriteMetricByPartition(partitionCondition: String, version: Long): Long = {
    val conditions = splitConditionTo(partitionCondition).map { case (k, v) => s"$k=$v" }.toSeq
    val statsSchema = new StructType()
      .add("numRecords", LongType)
      .add("minValues", MapType(StringType, StringType))
      .add("maxValues", MapType(StringType, StringType))
      .add("nullCount", MapType(StringType, StringType))
    val logFile = log.versionFile(version).toString
    val df = spark.read.json(logFile)
    if (!df.columns.contains("add")) return 0L
    df.withColumn("stats", from_json(col("add.stats"), statsSchema))
      .select(col("add.path").as("path"), col("stats.numRecords").as("numRecords"))
      .map { row =>
        val p = row.getAs[String]("path")
        // partition dirs are percent-encoded (`seg=A/B` → `seg=A%2FB`), so
        // each path segment is decoded before the exact `k=v` comparison —
        // segment equality (not substring contains) also stops `seg=A`
        // from matching a `seg=AB` directory
        val matches = p != null && {
          lazy val segs = p.split('/').map(graft.tables.TableWriter.percentDecode)
          conditions.forall(c => segs.contains(c))
        }
        if (matches && !row.isNullAt(1)) row.getAs[Long]("numRecords") else 0L
      }(Encoders.scalaLong)
      .reduce(_ + _)
  }

  /** L6 — keep WRITE always; DELETE/MERGE/UPDATE only when the recorded
    * predicate matches the user condition; drop everything else.
    */
  def filterHistoryByPartition(h: GraftHistory, partitionCondition: String): Boolean =
    h.operation match {
      case "WRITE" => true
      case "DELETE" | "MERGE" | "UPDATE" =>
        h.operationParameters.contains("predicate") &&
          validatePartitionCondition(h, partitionCondition)
      case _ => false
    }

  /** L7 — normalize the log's recorded predicate and require every user
    * `k=v` pair to appear in it.
    */
  def validatePartitionCondition(h: GraftHistory, condition: String): Boolean = {
    val wanted = splitConditionTo(condition.toLowerCase)
    val recorded = splitConditionTo(
      h.operationParameters("predicate")
        .toLowerCase
        .replaceAll("[()\\[\\]\"]", " "))
    if (wanted.isEmpty) false
    else wanted.forall { case (k, v) => recorded.get(k).contains(v) }
  }

  /** L8 — parse `a = 'x' and b = y` → Map(a->x, b->y); tolerates Catalyst
    * attribute ids (`country#590 = USA`) and qualified names (`tbl.country = 'IND'`).
    */
  def splitConditionTo(partitionCondition: String): Map[String, String] = {
    val parts = {
      val t = partitionCondition.trim
      if (t.contains(" and ")) t.split(" and ").toSeq else Seq(t)
    }
    parts.map { part =>
      val kv = part.split("=")
      assert(kv.length == 2, s"cannot parse condition fragment '$part'")
      val rawKey = kv(0)
      val key =
        if (rawKey.contains("#")) rawKey.split("#")(0).trim
        else if (rawKey.contains(".")) rawKey.split("\\.")(1).trim
        else rawKey.trim
      key -> kv(1).trim.stripPrefix("'").stripSuffix("'")
    }.toMap
  }
}
