package graft.operators

import org.apache.spark.sql.DataFrame

import graft.GraftValidationError
import graft.tables.GraftTable

/** Type-2 slowly-changing-dimension upserts — parity with the reference's
  * `Type2Scd` (`Type2Scd.scala:8-81`): the base table keeps full history with
  * `is_current` / `effective_time` / `end_time` bookkeeping columns; an
  * upsert closes out changed current rows and inserts new current versions.
  *
  * The staging trick (reference `Type2Scd.scala:53-62`): rows whose
  * attributes changed are staged twice — once with a NULL mergeKey (which by
  * SQL `=` semantics never matches, forcing the insert path to create the new
  * current row) and once keyed by pk (matching the existing current row,
  * which the matched clause closes out).
  */
object Type2Scd {

  /** SCD2 upsert with conventional column names (`Type2Scd.scala:8-23`). */
  def upsert(baseTable: GraftTable, updatesDF: DataFrame, primaryKey: String,
      attrColNames: Seq[String]): Unit =
    genericUpsert(baseTable, updatesDF, primaryKey, attrColNames,
      "is_current", "effective_time", "end_time")

  /** SCD2 upsert with caller-chosen bookkeeping column names
    * (`Type2Scd.scala:25-81`).
    */
  def genericUpsert(
      baseTable: GraftTable,
      updatesDF: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String,
      effectiveTimeColName: String,
      endTimeColName: String): Unit = {

    val baseColNames = baseTable.toDF.columns.toSeq
    val requiredBaseColNames =
      Seq(primaryKey) ++ attrColNames ++ Seq(isCurrentColName, effectiveTimeColName, endTimeColName)
    if (baseColNames.sorted != requiredBaseColNames.sorted)
      throw GraftValidationError(
        s"The base table has these columns '$baseColNames', but these columns are required '$requiredBaseColNames'")

    val updatesColNames = updatesDF.columns.toSeq
    val requiredUpdatesColNames = Seq(primaryKey) ++ attrColNames :+ effectiveTimeColName
    if (updatesColNames.sorted != requiredUpdatesColNames.sorted)
      throw GraftValidationError(
        s"The updates DataFrame has these columns '$updatesColNames', but these columns are required '$requiredUpdatesColNames'")

    val updatesAttrs = attrColNames.map(a => s"updates.$a <> base.$a").mkString(" OR ")
    val stagedUpdatesAttrs = attrColNames.map(a => s"staged_updates.$a <> base.$a").mkString(" OR ")

    // stage 1: changed rows, NULL mergeKey → will take the insert path
    val stagedPart1 = updatesDF
      .as("updates")
      .join(baseTable.toDF.as("base"), primaryKey)
      .where(s"base.$isCurrentColName = true AND ($updatesAttrs)")
      .selectExpr("NULL as mergeKey", "updates.*")
    // stage 2: all updates keyed by pk → match current rows
    val stagedPart2 = updatesDF.selectExpr(s"$primaryKey as mergeKey", "*")
    val stagedUpdates = stagedPart1.union(stagedPart2)

    GraftMerge(baseTable, "base")
      .merge(stagedUpdates, s"base.$primaryKey = mergeKey", Some("staged_updates"))
      .whenMatchedUpdateExpr(
        Map(
          isCurrentColName -> "false",
          endTimeColName -> s"staged_updates.$effectiveTimeColName"),
        Some(s"base.$isCurrentColName = true AND ($stagedUpdatesAttrs)"))
      .whenNotMatchedInsertExpr(
        Map(primaryKey -> s"staged_updates.$primaryKey") ++
          attrColNames.map(a => a -> s"staged_updates.$a").toMap ++
          Map(
            isCurrentColName -> "true",
            effectiveTimeColName -> s"staged_updates.$effectiveTimeColName",
            endTimeColName -> "null"))
      .execute()
  }
}
