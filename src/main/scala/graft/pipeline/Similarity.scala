package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`): brute-force cosine top-k as the correctness baseline,
  * and an IVF (inverted-file) variant as the scale path.
  *
  * Scale design: brute-force is a broadcast of the (small) query set against
  * the (huge) corpus — a single narrow pass, no corpus shuffle. IVF clusters
  * the corpus once (centroids fit on the driver), partitions by centroid id,
  * and probes only `nProbe` inverted lists per query — corpus scan cost drops
  * by ~numCentroids/nProbe at recall governed by nProbe.
  */
object Similarity {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  private def norm(v: org.apache.spark.sql.Column) =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Returns (queryId, rank, corpusId, cosine). Ties break by corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** IVF top-k: corpus assigned to the nearest of `numCentroids` sampled
    * centroids (one pass); each query probes its `nProbe` nearest centroid
    * lists only. Recall < 1.0 by construction — the brute-force variant is
    * the oracle. Centroids are deterministic: the first rows by id.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    // deterministic "training": lowest-id rows as centroids (a k-means pass
    // would go here at production quality; sampling keeps this dependency-free)
    val centroids = corpus.select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(numCentroids).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

    def nearestCentroids(vec: org.apache.spark.sql.Column, n: Int) = {
      val dists = centroids.map { case (cid, cv) =>
        struct(lit(cid).as("cid"),
          aggregate(zip_with(vec, lit(cv), (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _).as("d"))
      }
      slice(array_sort(array(dists: _*), (l, r) =>
        when(l.getField("d") < r.getField("d"), -1)
          .when(l.getField("d") > r.getField("d"), 1).otherwise(0)), 1, n)
    }

    val c = corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("__cell", nearestCentroids(col("__cv"), 1)(0).getField("cid"))

    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__cell", explode(transform(
        nearestCentroids(col("__qv"), nProbe), _.getField("cid"))))

    val scored = c.join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
