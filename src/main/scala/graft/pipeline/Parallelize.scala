package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{
  RebalancePartitions, Repartition, RepartitionByExpression}

/** Narrow-input widening for per-row-expensive map phases (decode, shingle,
  * hash): a scan's partition count is set by file layout and split floors
  * (`spark.sql.files.openCostInBytes`; one-row-group parquet files are
  * effectively unsplittable), NOT by the cost of the map work above it — so
  * a small input can serialize minutes of decode/shingle CPU onto a handful
  * of cores while the rest of the cluster idles.
  *
  * `widen` spreads such an input across the session's default parallelism
  * BEFORE the expensive map. The decision is made from the optimized plan's
  * SIZE STATISTICS alone — never by materializing the plan (an
  * `rdd.getNumPartitions` probe under AQE executes every upstream stage to
  * finalize the plan, i.e. runs the query once to ask how wide it is). At
  * 100 TB the estimated size far exceeds what the split-size formula needs
  * to fill every core and this is a no-op — it fires exactly in the narrow
  * regime (estimated input under openCost × parallelism, ~128 MB at 32
  * cores with defaults) where one small round-robin shuffle buys full
  * parallelism for the map phase. Round-robin repartition is
  * retry-deterministic (`spark.sql.execution.sortBeforeRepartition`, on by
  * default — see SPARK-23207).
  */
private[graft] object Parallelize {

  private def bytesConf(df: DataFrame, key: String, default: Long): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get(key))
    catch { case _: Exception => default }

  /** `df` repartitioned to the session default parallelism when its
    * estimated size cannot fill that many scan splits; unchanged otherwise,
    * when a sufficient repartition is already in the plan (idempotent under
    * chained operators), or when streaming (micro-batch partitioning is the
    * stream's own concern).
    */
  def widen(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return df
    val plan = df.queryExecution.optimizedPlan
    // the TOPMOST repartition-like node (collectFirst is pre-order) decides
    // the frame's current width — matching any >=target repartition deeper
    // in the plan would wrongly skip widening when a later narrow
    // repartition (e.g. a caller's rebalance-to-4) sits above it
    // a repartition with no explicit count resolves to the session's
    // shuffle parallelism — which can sit below defaultParallelism
    val implicitN =
      try spark.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Exception => target }
    val alreadyWide = plan.collectFirst {
      // coalesce (shuffle=false) can only REDUCE width — its numPartitions
      // is an upper bound, not an achieved parallelism
      case r: Repartition => r.shuffle && r.numPartitions >= target
      case r: RepartitionByExpression =>
        r.optNumPartitions.getOrElse(implicitN) >= target
      case r: RebalancePartitions =>
        r.optNumPartitions.getOrElse(implicitN) >= target
    }.getOrElse(false)
    if (alreadyWide) return df
    // mirror the scan split formula: maxSplit = min(maxPartitionBytes,
    // max(openCost, size/target)); the input is "narrow" when even a
    // perfectly splittable scan of its estimated bytes would yield fewer
    // splits than cores
    val sizeBig = plan.stats.sizeInBytes
    val size = if (sizeBig > Long.MaxValue) Long.MaxValue else sizeBig.toLong
    val maxPB = bytesConf(df, "spark.sql.files.maxPartitionBytes", 128L << 20)
    val openCost = bytesConf(df, "spark.sql.files.openCostInBytes", 4L << 20)
    val maxSplit = math.min(maxPB, math.max(openCost, size / target))
    val estSplits = size / math.max(1L, maxSplit)
    if (estSplits < target) df.repartition(target) else df
  }
}
