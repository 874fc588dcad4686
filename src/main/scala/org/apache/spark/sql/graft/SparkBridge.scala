package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** Minimal bridge to two `private[sql]` constructors the graft read path
  * needs: building a DataFrame from a hand-assembled `LogicalRelation`.
  * Lives in an `org.apache.spark.sql.*` package solely for access scope —
  * the standard technique of Spark-ecosystem table formats; no Spark
  * internals are modified or shadowed.
  */
object SparkBridge {

  /** DataFrame over `relation` (e.g. a HadoopFsRelation wired to a
    * commit-log file index), planned by the stock file-source strategy.
    */
  def ofRelation(spark: org.apache.spark.sql.SparkSession, relation: BaseRelation): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], LogicalRelation(relation))
}
