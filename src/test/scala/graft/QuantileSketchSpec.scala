package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.functions.GraftFunctions.{quantileSketch, sketchQuantile}

/** The mergeable KLL-style quantile summary: exact in the n < k regime
  * (what the driver oracle pins), rank-error-bounded when compacting, and
  * partitioning-invariant in the exact regime.
  */
class QuantileSketchSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  graft.functions.GraftFunctions.register(spark)

  private def exactQuantile(sorted: Seq[Double], p: Double): Double = {
    val n = sorted.length
    val idx = math.min(n, math.max(1L, math.ceil(p * n).toLong)).toInt - 1
    sorted(idx)
  }

  it("is exact order statistics when n < k, regardless of partitioning") {
    val values = scala.util.Random.shuffle((1 to 1000).toList).map(_.toDouble)
    val sorted = values.sorted
    for (parts <- Seq(1, 7)) {
      val df = values.toDF("v").repartition(parts)
      val row = df.agg(quantileSketch(col("v"), 2048).as("sk"))
        .select(
          sketchQuantile(col("sk"), 0.5).as("p50"),
          sketchQuantile(col("sk"), 0.9).as("p90"),
          sketchQuantile(col("sk"), 0.99).as("p99"),
          sketchQuantile(col("sk"), 1.0).as("p100"),
          col("sk.n").as("n"))
        .head()
      assert(row.getDouble(0) == exactQuantile(sorted, 0.5))
      assert(row.getDouble(1) == exactQuantile(sorted, 0.9))
      assert(row.getDouble(2) == exactQuantile(sorted, 0.99))
      assert(row.getDouble(3) == 1000.0)
      assert(row.getLong(4) == 1000L)
    }
  }

  it("bounds rank error in the compacting regime") {
    val n = 20000
    val df = spark.range(n).select(col("id").cast("double").as("v")).repartition(8)
    val row = df.agg(quantileSketch(col("v"), 256).as("sk"))
      .select(
        sketchQuantile(col("sk"), 0.25).as("p25"),
        sketchQuantile(col("sk"), 0.5).as("p50"),
        sketchQuantile(col("sk"), 0.75).as("p75"),
        col("sk.n").as("n"))
      .head()
    assert(row.getLong(3) == n.toLong)
    // values ARE ranks here (0..n-1): estimate must land within 5% rank
    // error of the target — loose vs the O(1/k) theory, tight vs a bug
    for ((p, i) <- Seq(0.25 -> 0, 0.5 -> 1, 0.75 -> 2)) {
      val est = row.getDouble(i)
      val target = p * n
      assert(math.abs(est - target) <= 0.05 * n,
        s"p=$p estimate $est too far from rank $target")
    }
  }

  it("handles nulls and empty groups") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("v")
    val r = df.agg(quantileSketch(col("v"), 64).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5), col("sk.n")).head()
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 2L)
    val empty = spark.range(0).select(col("id").cast("double").as("v"))
    val e = empty.agg(quantileSketch(col("v"), 64).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5), col("sk.n")).head()
    assert(e.isNullAt(0) && e.getLong(1) == 0L)
  }

  it("aggregates from SQL and matches the Column API") {
    spark.range(500).select(col("id").cast("double").as("v"))
      .createOrReplaceTempView("qsk_vals")
    val sql = spark.sql(
      """SELECT sketch_quantile(sk, 0.5d) AS p50, sk.n AS n
        |FROM (SELECT quantile_sketch(v, 1024) AS sk FROM qsk_vals)""".stripMargin).head()
    assert(sql.getDouble(0) == 249.0 && sql.getLong(1) == 500L)
    val err = intercept[Exception] {
      spark.sql("SELECT quantile_sketch(v, CAST(v AS INT)) FROM qsk_vals").collect()
    }
    assert(err.getMessage.contains("quantile_sketch"))
  }
}
