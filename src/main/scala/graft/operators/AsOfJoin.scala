package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: each left row picks the LATEST right row
  * with `rightTime <= leftTime` for the same key — the standard operator for
  * joining facts to slowly-changing state (quotes→trades, SCD dims→events)
  * that Spark has no built-in for.
  *
  * Implemented the scalable way (SURVEY guidance (a): compose existing ops):
  * tag + union both sides, ONE shuffle on (key), per-key time-ordered window
  * carrying the last-seen right payload forward with
  * `last(_, ignoreNulls = true)`. No range-join explosion, no per-key
  * collect; cost is a union sort within key partitions — survives skew via
  * AQE and scales linearly in rows.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so `<=` (inclusive)
  * semantics match DuckDB's `ASOF JOIN ... ON l.t >= r.t`. Left rows with no
  * earlier right row keep null payloads (left-join semantics).
  */
object AsOfJoin {

  /** @param left       fact side (all rows preserved)
    * @param right      state side (payload carried forward in time)
    * @param keyCols    equi-join keys present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  effective-time column on `right`
    * @param payload    right-side columns to attach (must not clash with left)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"payload columns ${payload.intersect(leftCols)} clash with left side")

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__t"), col("__side")) ++ keyCols.map(col) ++
        leftCols.diff(keyCols).map(col) ++ payload.map(c => lit(null).as(c)): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__t"), col("__side")) ++ keyCols.map(col) ++
        leftCols.diff(keyCols).map(c => lit(null).as(c)) ++ payload.map(col): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side")) // right (0) before left (1) at ties
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(col): _*)
  }
}
