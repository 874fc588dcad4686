package graft

import org.apache.spark.sql.DataFrame

/** Validation error type for graft operations — analogue of the reference's
  * `JodieValidationError` (`JodieValidator.scala:5-6`).
  */
case class GraftValidationError(message: String) extends Exception(message)

/** Column-existence validation — analogue of
  * `JodieValidator.validateColumnsExistsInDataFrame` (`JodieValidator.scala:9-17`).
  */
object GraftValidator {
  def validateColumnsExistsInDataFrame(columns: Seq[String], df: DataFrame): Unit = {
    val missing = columns.diff(df.columns.toSeq)
    if (missing.nonEmpty)
      throw GraftValidationError(
        s"these columns: $missing do not exist in the DataFrame: ${df.columns.toSeq}")
  }
}
