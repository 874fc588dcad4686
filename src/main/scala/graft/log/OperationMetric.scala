package graft.log

/** Typed per-operation count metrics parsed from commit-log history — same
  * metric vocabulary as the reference ADT (`delta/OperationMetric.scala:4-43`),
  * which mirrors Delta's operationMetrics keys. Field names double as the
  * metric key names recorded by our merge/delete/update/write paths.
  */
sealed trait OperationMetrics

case class WriteMetric(
    numFiles: Long,
    numOutputRows: Long,
    numOutputBytes: Long
) extends OperationMetrics

case class DeleteMetric(
    numDeletedRows: Long,
    numAddedFiles: Long,
    numCopiedRows: Long,
    numRemovedFiles: Long,
    numAddedChangeFiles: Long,
    numRemovedBytes: Long,
    numAddedBytes: Long,
    executionTimeMs: Long,
    scanTimeMs: Long,
    rewriteTimeMs: Long
) extends OperationMetrics

case class UpdateMetric(
    numRemovedFiles: Long,
    numCopiedRows: Long,
    numAddedChangeFiles: Long,
    executionTimeMs: Long,
    scanTimeMs: Long,
    numAddedFiles: Long,
    numUpdatedRows: Long,
    rewriteTimeMs: Long
) extends OperationMetrics

case class MergeMetric(
    numTargetRowsCopied: Long,
    numTargetRowsDeleted: Long,
    numTargetFilesAdded: Long,
    executionTimeMs: Long,
    numTargetRowsInserted: Long,
    scanTimeMs: Long,
    numTargetRowsUpdated: Long,
    numOutputRows: Long,
    numTargetChangeFilesAdded: Long,
    numSourceRows: Long,
    numTargetFilesRemoved: Long,
    rewriteTimeMs: Long
) extends OperationMetrics

/** One history entry of a GraftTable commit (analogue of `DeltaHistory`). */
case class GraftHistory(
    version: Long,
    timestamp: Long,
    operation: String,
    operationParameters: Map[String, String],
    operationMetrics: Map[String, String]
)
