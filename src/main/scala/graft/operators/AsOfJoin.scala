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
    val reserved = Seq("__t", "__side", "__payload")
    require(reserved.intersect(leftCols ++ right.columns).isEmpty,
      s"columns ${reserved.intersect(leftCols ++ right.columns)} are reserved by asofJoin")

    // the payload travels as ONE struct (null on left rows, non-null on every
    // right row even when its fields are null) so: (a) a right row with null
    // payload values still overrides older values, and (b) fields from
    // different right rows never mix. Null right times never match (ASOF
    // semantics), so they are dropped up front.
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__t"), col("__side")) ++ keyCols.map(col) ++
        leftCols.diff(keyCols).map(col) :+
        lit(null).cast(structTypeOf(right, payload)).as("__payload"): _*)
    // NULL keys never match under equi-join semantics (SQL/DuckDB ASOF):
    // dropping null-key right rows up front means a null-key left row can
    // only share a window partition with other left rows — payload stays null
    val taggedRight = right
      .where(keyCols.foldLeft(col(rightTime).isNotNull)((acc, k) => acc && col(k).isNotNull))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__t"), col("__side")) ++ keyCols.map(col) ++
        leftCols.diff(keyCols).map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as("__payload"): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__side")) // right (0) before left (1) at ties
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__payload", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__payload.$c").as(c)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
}
