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

  /** Deterministic Lloyd's k-means over an embedding column, DataFrame-native:
    * assignment is a codegen'd argmin expression; the update step averages
    * element-wise via `posexplode` + groupBy(cell, pos). Centroids (k × dim
    * doubles) live on the driver between iterations — tiny.
    *
    * Scale: the build trains on a bounded DETERMINISTIC sample (lowest
    * `xxhash64(id)` rows, ties broken by id), not the full corpus — each
    * Lloyd iteration posexplodes `sample × dim` rows, so an unbounded build
    * would cost O(corpus × dim × iterations) shuffle rows and dominate the
    * probe savings at 100 TB. Centroid quality is insensitive to sample size
    * at k = 16..4096, and callers that need the exact full-corpus build can
    * pass `sampleSize = Int.MaxValue`.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int = 3,
      sampleSize: Int = 1 << 20): Seq[(Int, Array[Double])] = {
    require(sampleSize >= k, s"sampleSize=$sampleSize must be >= k=$k")
    val full = corpus.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    // TakeOrderedAndProject: one corpus pass, driver holds only the plan —
    // the sampled rows themselves stay distributed (persisted below)
    val data = (
      if (sampleSize == Int.MaxValue) full
      else full.orderBy(xxhash64(col("__id").cast("string")), col("__id")).limit(sampleSize)
    ).persist()
    try {
      // deterministic init: lowest-id rows
      var centroids: Seq[(Int, Array[Double])] = data.orderBy(col("__id")).limit(k)
        .collect().zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }.toSeq
      (1 to iterations).foreach { _ =>
        val assignExpr = nearestOf(centroids, col("__v"), 1)(0).getField("cid")
        // two-step: the multi-alias generator (posexplode .as(Seq(...)))
        // breaks resolution of struct getField in the same select list
        val sums = data
          .select(assignExpr.as("__cell"), col("__v"))
          .select(col("__cell"), posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy(col("__cell"), col("__pos"))
          .agg(avg(col("__x")).as("__m"))
          .collect()
        val byCell = sums.groupBy(_.getInt(0))
        centroids = centroids.map { case (cid, old) =>
          byCell.get(cid) match {
            case Some(rows) =>
              val m = old.clone()
              rows.foreach { r =>
                // ragged vectors / all-null positions: keep the old coordinate
                if (!r.isNullAt(2) && r.getInt(1) < m.length) m(r.getInt(1)) = r.getDouble(2)
              }
              (cid, m)
            case None => (cid, old) // empty cell keeps its centroid
          }
        }
      }
      centroids
    } finally { data.unpersist(); () }
  }

  /** `n` nearest centroids of `vec` as a sorted array<struct<d,cid>> column.
    * Distance leads the struct so `array_sort`'s natural field-by-field
    * ordering sorts by distance (cid breaks exact ties) — no comparator
    * lambda (whose struct field names don't survive resolution).
    */
  private def nearestOf(
      centroids: Seq[(Int, Array[Double])],
      vec: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val dists = centroids.map { case (cid, cv) =>
      struct(
        aggregate(zip_with(vec, lit(cv), (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _).as("d"),
        lit(cid).as("cid"))
    }
    slice(array_sort(array(dists: _*)), 1, n)
  }

  /** IVF top-k: the corpus is clustered once with [[kmeansCentroids]] and
    * partitioned into inverted lists by nearest centroid; each query probes
    * only its `nProbe` nearest lists. Recall < 1.0 by construction — the
    * brute-force variant is the oracle; nProbe trades scan cost for recall.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nProbe: Int = 4,
      kmeansIterations: Int = 3,
      kmeansSampleSize: Int = 1 << 20): DataFrame = {
    val centroids =
      kmeansCentroids(corpus, idCol, vecCol, numCentroids, kmeansIterations, kmeansSampleSize)

    val c = corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .withColumn("__cell", nearestOf(centroids, col("__cv"), 1)(0).getField("cid"))

    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__cell", explode(transform(
        nearestOf(centroids, col("__qv"), nProbe), _.getField("cid"))))

    val scored = c.join(broadcast(q), Seq("__cell"))
      .withColumn("cosine", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
