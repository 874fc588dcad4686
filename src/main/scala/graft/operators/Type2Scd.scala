package graft.operators

import org.apache.spark.sql.DataFrame

import graft.GraftValidationError
import graft.tables.GraftTable

/** Type-2 slowly-changing-dimension upserts — functional parity with the
  * reference's `Type2Scd` (`Type2Scd.scala:8-81`): the base table keeps full
  * history with `is_current` / `effective_time` / `end_time` bookkeeping
  * columns; an upsert closes out changed current rows and inserts new current
  * versions.
  *
  * Core idea (shared with the reference, which inherits it from the Delta
  * SCD2 recipe): a changed row enters the merge TWICE — once under a NULL
  * join key, which can never equi-match and therefore drives the insert
  * branch (the new current version), and once under its real key, which
  * matches the open history row so the update branch can close it out.
  */
object Type2Scd {

  /** SCD2 upsert with the conventional bookkeeping column names
    * (reference `Type2Scd.scala:8-23`).
    */
  def upsert(baseTable: GraftTable, updatesDF: DataFrame, primaryKey: String,
      attrColNames: Seq[String]): Unit =
    genericUpsert(baseTable, updatesDF, primaryKey, attrColNames,
      "is_current", "effective_time", "end_time")

  private def requireExactColumns(actual: Seq[String], required: Seq[String], what: String): Unit =
    if (actual.sorted != required.sorted)
      throw GraftValidationError(
        s"$what must have exactly the columns ${required.sorted.mkString("[", ", ", "]")} " +
          s"but has ${actual.sorted.mkString("[", ", ", "]")}")

  /** SCD2 upsert with caller-chosen bookkeeping column names
    * (reference `Type2Scd.scala:25-81`).
    */
  def genericUpsert(
      baseTable: GraftTable,
      updatesDF: DataFrame,
      primaryKey: String,
      attrColNames: Seq[String],
      isCurrentColName: String,
      effectiveTimeColName: String,
      endTimeColName: String): Unit = {

    val history = baseTable.toDF
    requireExactColumns(history.columns.toSeq,
      (primaryKey +: attrColNames) ++ Seq(isCurrentColName, effectiveTimeColName, endTimeColName),
      s"SCD2 base table at ${baseTable.path}")
    requireExactColumns(updatesDF.columns.toSeq,
      (primaryKey +: attrColNames) :+ effectiveTimeColName,
      "SCD2 updates DataFrame")

    val keyCol = "__scd_key"
    val changedVsIncoming = attrColNames.map(a => s"u.$a <> t.$a").mkString(" OR ")
    val changedVsStaged = attrColNames.map(a => s"src.$a <> t.$a").mkString(" OR ")

    // branch 1 — updates that differ from the OPEN history row, under a NULL
    // key: never equi-match, so the merge inserts them as new current rows
    val freshVersions = updatesDF.as("u")
      .join(history.as("t"), primaryKey)
      .where(s"t.$isCurrentColName = true AND ($changedVsIncoming)")
      .selectExpr(s"NULL as $keyCol", "u.*")
    // branch 2 — every update under its real key: matches the open row
    val keyedUpdates = updatesDF.selectExpr(s"$primaryKey as $keyCol", "*")

    GraftMerge(baseTable, "t")
      .merge(freshVersions.union(keyedUpdates), s"t.$primaryKey = $keyCol", Some("src"))
      .whenMatchedUpdateExpr(
        Map(
          isCurrentColName -> "false",
          endTimeColName -> s"src.$effectiveTimeColName"),
        Some(s"t.$isCurrentColName = true AND ($changedVsStaged)"))
      .whenNotMatchedInsertExpr(
        Map(primaryKey -> s"src.$primaryKey") ++
          attrColNames.map(a => a -> s"src.$a").toMap ++
          Map(
            isCurrentColName -> "true",
            effectiveTimeColName -> s"src.$effectiveTimeColName",
            endTimeColName -> "null"))
      .execute()
  }
}
