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

  // codegen'd vector primitives — bit-identical to the HOF compositions
  // they replace (`aggregate(zip_with(a,b,_*_),0.0,_+_)` etc.), but Spark's
  // higher-order functions evaluate INTERPRETED (boxed lambda per element);
  // see graft.functions.VectorExpressions for the measurements
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.SparkBridge.column(graft.functions.DotProduct(
      org.apache.spark.sql.graft.SparkBridge.catalystExpression(a),
      org.apache.spark.sql.graft.SparkBridge.catalystExpression(b)))

  def sqDistsTo(vec: org.apache.spark.sql.Column,
      cb: Seq[Array[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.SparkBridge.column(graft.functions.SquaredDistances(
      org.apache.spark.sql.graft.SparkBridge.catalystExpression(vec), cb.toArray))

  def norm(v: org.apache.spark.sql.Column) = sqrt(dot(v, v))

  /** Cosine similarity of two numeric-array columns as a pure built-in
    * composition (`zip_with` + `aggregate` — codegen'd, no UDF). NULL when
    * either vector is NULL or zero-normed (undefined direction), matching
    * SQL comparison semantics rather than returning an arbitrary 0.
    */
  def cosineSimilarity(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val na = norm(a)
    val nb = norm(b)
    when(a.isNotNull && b.isNotNull && na =!= 0.0d && nb =!= 0.0d,
      dot(a, b) / (na * nb))
  }

  /** Default row bound under which the query side is broadcast (embedding
    * rows are KB-sized, so 2^16 rows ≈ a few hundred MB — the practical
    * executor-memory ceiling for a broadcast table).
    */
  val DefaultBroadcastQueryRows: Long = 1L << 16

  /** The query side of a similarity join, broadcast-hinted only when SAFE:
    * `hint = Some(x)` is the caller's explicit decision; `None` probes the
    * size with a LIMIT-bounded count (one cheap early-terminating job) and
    * broadcasts only under `threshold` rows. An unconditionally-broadcast
    * million-query set would OOM every executor at once — the silent
    * scale-killer this guards against; past the threshold the join runs as
    * a plain shuffle on its keys.
    */
  private[pipeline] def maybeBroadcast(
      q: DataFrame, hint: Option[Boolean], threshold: Long): DataFrame =
    hint match {
      case Some(true)  => broadcast(q)
      case Some(false) => q
      case None =>
        // clamp before toInt: a Long threshold at/above Int.MaxValue must
        // degrade to "probe everything", not overflow into a negative limit
        // (query error) or a tiny wrapped one (vacuously broadcasting the
        // oversized set this guard exists to prevent)
        val probeRows = math.min(threshold, Int.MaxValue - 1L).toInt + 1
        if (q.limit(probeRows).count() <= threshold) broadcast(q) else q
    }

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Returns (queryId, rank, corpusId, cosine). Ties break by corpus id.
    *
    * `broadcastQueries`: see [[maybeBroadcast]] — an oversized query set
    * falls back to a (shuffled) cartesian pass instead of an executor-OOM
    * broadcast.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      broadcastQueries: Option[Boolean] = None,
      broadcastThreshold: Long = DefaultBroadcastQueryRows): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.crossJoin(maybeBroadcast(q, broadcastQueries, broadcastThreshold))
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
      val dim = centroids.headOption.map(_._2.length).getOrElse(0)
      (1 to iterations).foreach { _ =>
        val assignExpr = nearestOf(centroids, col("__v"), 1)(0).getField("cid")
        // elementwise means as `dim` explicit avg aggregates — NOT a
        // posexplode: the optimizer collapses projections into/above a
        // Generate, re-evaluating the argmin PER EXPLODED ELEMENT (dim×
        // per row — measured 0.2 s → 6.6 s on a 16k×64 corpus at k=64).
        // One hash-aggregate pass; avg skips the nulls ragged vectors
        // produce past their length, same as the exploded form did.
        val avgCols = (0 until dim).map(p => avg(col("__v")(p)).as(s"m$p"))
        val sums = data
          .select(assignExpr.as("__cell"), col("__v"))
          .groupBy(col("__cell"))
          .agg(avgCols.head, avgCols.tail: _*)
          .collect()
        val byCell = sums.map(r => r.getInt(0) -> r).toMap
        centroids = centroids.map { case (cid, old) =>
          byCell.get(cid) match {
            case Some(r) =>
              val m = old.clone()
              (0 until math.min(dim, m.length)).foreach { p =>
                if (!r.isNullAt(1 + p)) m(p) = r.getDouble(1 + p)
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
    *
    * DATA-DRIVEN: the centroids ride the plan as one literal nested array
    * and distances come from a `transform` over it — k per-centroid inlined
    * subtrees would put the whole codebook INSIDE the generated code
    * (k=64 × dim=64 ≈ an 8k-node janino tree, seconds of compile per
    * distinct plan — the zorder when-chain lesson), where this stays a
    * constant-size expression at any k.
    */
  private[pipeline] def nearestOf(
      centroids: Seq[(Int, Array[Double])],
      vec: org.apache.spark.sql.Column,
      n: Int): org.apache.spark.sql.Column = {
    val sorted = centroids.sortBy(_._1)
    val cids = array(sorted.map { case (cid, _) => lit(cid) }: _*)
    val dists = sqDistsTo(vec, sorted.map(_._2))
    slice(array_sort(zip_with(dists, cids,
      (d, c) => struct(d.as("d"), c.as("cid")))), 1, n)
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
      kmeansSampleSize: Int = 1 << 20,
      broadcastQueries: Option[Boolean] = None,
      broadcastThreshold: Long = DefaultBroadcastQueryRows): DataFrame = {
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

    // bounded query sets broadcast (no corpus movement at all); larger ones
    // run a plain equi-join on __cell — both sides shuffle on the cell id,
    // which is the correct plan once the query side itself is cluster-sized
    val scored = c.join(maybeBroadcast(q, broadcastQueries, broadcastThreshold), Seq("__cell"))
      .withColumn("cosine", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Materialize an IVF index as graft tables, so the k-means build runs
    * ONCE and every later query batch probes it ([[ivfTopK]] rebuilds
    * centroids and re-assigns the corpus per call — fine interactively,
    * wasteful for a daily batch-scoring pipeline over a stable corpus):
    *
    *  - `<indexPath>/centroids` — (cid, centroid), k×dim, driver-tiny;
    *  - `<indexPath>/cells` — the corpus with precomputed norm and nearest
    *    cell, PARTITIONED BY cell: a probe filters on the cell ids it
    *    needs, so the table's own partition pruning drops every unprobed
    *    inverted list at the FILE level before any byte is read.
    */
  def buildIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      numCentroids: Int = 16,
      kmeansIterations: Int = 3,
      kmeansSampleSize: Int = 1 << 20): Unit = {
    import spark.implicits._
    val centroids = kmeansCentroids(corpus, idCol, vecCol, numCentroids,
      kmeansIterations, kmeansSampleSize)
    graft.tables.GraftTable.create(spark, s"$indexPath/centroids",
      centroids.toDF("cid", "centroid"))
    val assigned = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("vector"))
      .withColumn("norm", norm(col("vector")))
      .withColumn("cell", nearestOf(centroids, col("vector"), 1)(0).getField("cid"))
    graft.tables.GraftTable.create(spark, s"$indexPath/cells", assigned,
      partitionColumns = Seq("cell"))
    ()
  }

  /** Incrementally extend a [[buildIvfIndex]] index with newly ingested
    * vectors: assign them to the EXISTING centroids (reading the k×dim
    * centroids table, never re-clustering) and append to the partitioned
    * cells table — an ACID commit, so concurrent probes see the old or the
    * new index, never half. Centroid drift under sustained ingest is
    * handled the way IVF deployments do: periodic [[buildIvfIndex]]
    * rebuilds, not per-batch re-clustering.
    */
  def appendToIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      newRows: DataFrame,
      idCol: String,
      vecCol: String): Unit = {
    val centroids = graft.tables.GraftTable.forPath(spark, s"$indexPath/centroids")
      .toDF.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq.sortBy(_._1)
    val assigned = newRows
      .select(col(idCol).as("corpus_id"), col(vecCol).cast("array<double>").as("vector"))
      .withColumn("norm", norm(col("vector")))
      .withColumn("cell", nearestOf(centroids, col("vector"), 1)(0).getField("cid"))
    graft.tables.GraftTable.forPath(spark, s"$indexPath/cells").append(assigned)
    ()
  }

  // ==================================================================
  // Product quantization (Jégou et al. 2011, "Product Quantization for
  // Nearest Neighbor Search")
  // ==================================================================

  /** (id, L2-normalized vector) projection — the norm is computed ONCE per
    * row in its own column (an `aggregate` inside the `transform` lambda
    * would re-reduce the array per element: O(dim²)/row).
    */
  private def l2normalized(df: DataFrame, idCol: String, vecCol: String,
      outId: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId), col(vecCol).cast("array<double>").as("__raw"))
      .withColumn("__nn", norm(col("__raw")))
      .select(col(outId), transform(col("__raw"), _ / col("__nn")).as(outVec))

  /** Argmin codeword of `sv` against a fixed codebook, lowest-id on exact
    * ties — same tie-break as nearestOf's (distance, cid) struct sort. The
    * distances come from the codegen'd [[graft.functions.SquaredDistances]].
    */
  private def subArgmin(cb: Seq[Array[Double]],
      sv: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = sqDistsTo(sv, cb)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** The codebooks as ONE literal nested array column:
    * `cb[sub][code] = Array[Double]`. */
  private def codebooksLit(
      cbs: Seq[Seq[(Int, Array[Double])]]): org.apache.spark.sql.Column =
    array(cbs.map(cb => array(cb.map { case (_, cw) => lit(cw) }: _*)): _*)

  /** Per-subspace PQ codebooks over the L2-NORMALIZED corpus: the dim-D
    * space splits into `m` contiguous subspaces of D/m dims, each k-means'd
    * with a deterministic shared sample + init (identical results to running
    * [[kmeansCentroids]] per subspace — pinned by spec). Returns `m`
    * codebooks of `ksub` centroids — m × ksub × D/m doubles, driver-tiny at
    * any corpus size.
    *
    * Scale AND latency: all m subspaces train TOGETHER — the sample
    * explodes once into (id, sub, subvector) rows, each Lloyd iteration is
    * ONE assignment+average job over them (m separate k-means runs cost
    * m × iterations sequential mini-jobs; job overhead dominated the build
    * at small scale). The full corpus is never shuffled; train cost is
    * independent of corpus size.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iterations: Int = 3,
      sampleSize: Int = 1 << 18): Seq[Seq[(Int, Array[Double])]] = {
    require(sampleSize >= ksub, s"sampleSize=$sampleSize must be >= ksub=$ksub")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val dsub = dim / m
    val normed = l2normalized(corpus, idCol, vecCol, "__id", "__v")
    val data0 = (
      if (sampleSize == Int.MaxValue) normed
      else normed.orderBy(xxhash64(col("__id").cast("string")), col("__id")).limit(sampleSize)
    )
    val subRows = data0.select(col("__id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("s"), slice(col("__v"), j * dsub + 1, dsub).as("v"))): _*)).as("__e"))
      .select(col("__e.s").as("__sub"), col("__e.v").as("__sv"))
      .persist()
    try {
      // deterministic init: the ksub lowest-id sampled rows, sliced per sub
      // (exactly kmeansCentroids' init applied to each subspace)
      val initFull = data0.orderBy(col("__id")).limit(ksub)
        .collect().map(_.getSeq[Double](1).toArray)
      var cbs: Seq[Seq[(Int, Array[Double])]] = (0 until m).map(j =>
        initFull.toSeq.zipWithIndex.map { case (v, i) =>
          (i, v.slice(j * dsub, j * dsub + dsub)) })
      (1 to iterations).foreach { _ =>
        // small when-chain over the m subspaces, each branch a codegen'd
        // fixed-codebook argmin (m is 8-16; the chain stays tiny)
        val assign = (0 until m).map(j => (j, subArgmin(cbs(j).map(_._2), col("__sv"))))
          .foldRight(lit(-1).cast("int")) { case ((j, e), acc) =>
            when(col("__sub") === j, e).otherwise(acc) }
        // elementwise means as dsub explicit avg aggregates — see
        // kmeansCentroids: a posexplode here re-evaluates the argmin per
        // exploded element (the Generate/projection-collapse hazard)
        val avgCols = (0 until dsub).map(p => avg(col("__sv")(p)).as(s"m$p"))
        val sums = subRows
          .select(col("__sub"), assign.as("__cell"), col("__sv"))
          .groupBy(col("__sub"), col("__cell"))
          .agg(avgCols.head, avgCols.tail: _*)
          .collect()
        val bySubCell = sums.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
        cbs = cbs.zipWithIndex.map { case (cb, j) =>
          cb.map { case (cid, old) =>
            bySubCell.get((j, cid)) match {
              case Some(r) =>
                val nv = old.clone()
                (0 until math.min(dsub, nv.length)).foreach { p =>
                  if (!r.isNullAt(2 + p)) nv(p) = r.getDouble(2 + p)
                }
                (cid, nv)
              case None => (cid, old) // empty cell keeps its centroid
            }
          }
        }
      }
      cbs
    } finally { subRows.unpersist(); () }
  }

  /** Encode each vector as `m` small codeword ids (nearest codebook entry
    * per subspace) — one codegen'd argmin pass, no shuffle. A 64-dim float
    * vector (256 B) compresses to m bytes of codes (32× at m=8): the whole
    * corpus' codes fit where 3% of its vectors would.
    */
  def pqEncode(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      codebooks: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    val m = codebooks.size
    val dsub = codebooks.head.head._2.length
    val codes = array((0 until m).map(j =>
      subArgmin(codebooks(j).map(_._2), slice(col("__nv"), j * dsub + 1, dsub))): _*)
    l2normalized(df, idCol, vecCol, idCol, "__nv")
      .select(col(idCol), codes.as("codes"))
  }

  /** Approximate cosine top-k by asymmetric-distance computation over PQ
    * codes, with optional exact re-ranking: score every (query, code-row)
    * pair as Σ_j ⟨query_subvector_j, codeword_j⟩ (the query side stays
    * UN-quantized — that's the "asymmetric" in ADC), shortlist `rerank`
    * candidates per query, then re-score only the shortlist against the
    * true vectors.
    *
    * Scale: the corpus-wide pass reads CODES (m bytes/row), not vectors —
    * the memory-bandwidth path that makes exhaustive scans affordable at
    * 100 TB; true vectors are fetched for `queries × rerank` rows only.
    * Codebooks ride the expression tree as literals (m × ksub × D/m
    * doubles); the query side broadcasts under the same guard as
    * [[bruteForceTopK]]. With `rerank = 0` the ADC score itself ranks
    * (fastest, lowest recall); `rerank ≥ 4k` is the standard quality
    * setting.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 0,
      iterations: Int = 3,
      sampleSize: Int = 1 << 18,
      broadcastQueries: Option[Boolean] = None,
      broadcastThreshold: Long = DefaultBroadcastQueryRows): DataFrame = {
    val codebooks = pqCodebooks(corpus, idCol, vecCol, m, ksub, iterations, sampleSize)
    val dsub = codebooks.head.head._2.length

    val codeRows = pqEncode(corpus, idCol, vecCol, codebooks)
      .select(col(idCol).as("corpus_id"), col("codes"))
    val q = l2normalized(queries, idCol, vecCol, "query_id", "__qv")

    def cbCol(j: Int) = array(codebooks(j).map { case (_, cw) => lit(cw) }: _*)
    val adc = (0 until m).map { j =>
      dot(slice(col("__qv"), j * dsub + 1, dsub),
        element_at(cbCol(j), col("codes")(j) + 1))
    }.reduce(_ + _)

    val scored = codeRows
      .crossJoin(maybeBroadcast(q, broadcastQueries, broadcastThreshold))
      .withColumn("adc_score", adc)
    val w = Window.partitionBy("query_id").orderBy(col("adc_score").desc, col("corpus_id"))

    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          col("adc_score").as("score"))
    } else {
      val shortlist = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(k, rerank))
        .select(col("query_id"), col("corpus_id"), col("__qv"))
      val c = corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).cast("array<double>").as("__cv"))
        .withColumn("__cn", norm(col("__cv")))
      val exact = shortlist.join(c, "corpus_id")
        .withColumn("cosine", dot(col("__cv"), col("__qv")) / col("__cn"))
      val w2 = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
      exact.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
    }
  }

  /** Materialize a PQ index as graft tables — the persisted form of
    * [[pqTopK]]'s build stage, so codebook training and corpus encoding run
    * ONCE and every later batch probes the compressed codes:
    *
    *  - `<indexPath>/codebooks` — (sub, code, centroid): m × ksub × D/m
    *    doubles, driver-tiny;
    *  - `<indexPath>/codes` — (corpus_id, codes array<int>): m small ints
    *    per vector (the 32× compression that makes an exhaustive ADC scan
    *    affordable), plus the TRUE vector for exact re-ranking.
    *
    * Appending new vectors re-uses [[pqEncode]] with the stored codebooks
    * (codebook drift under sustained ingest → periodic rebuilds, like IVF).
    */
  def buildPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      indexPath: String,
      m: Int = 8,
      ksub: Int = 16,
      iterations: Int = 3,
      sampleSize: Int = 1 << 18): Unit = {
    import spark.implicits._
    val cbs = pqCodebooks(corpus, idCol, vecCol, m, ksub, iterations, sampleSize)
    graft.tables.GraftTable.create(spark, s"$indexPath/codebooks",
      cbs.zipWithIndex.flatMap { case (cb, j) =>
        cb.map { case (code, cw) => (j, code, cw) }
      }.toDF("sub", "code", "centroid"))
    val codes = pqEncode(corpus, idCol, vecCol, cbs)
      .withColumnRenamed(idCol, "corpus_id")
    val vecs = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).cast("array<double>").as("vector"))
    graft.tables.GraftTable.create(spark, s"$indexPath/codes",
      codes.join(vecs, "corpus_id"))
    ()
  }

  /** Probe a [[buildPqIndex]] index: ADC scoring over the stored codes with
    * exact re-ranking from the stored vectors — same semantics as
    * [[pqTopK]] at the index's (m, ksub), but the only per-query-batch work
    * is the scan of the code table (and the rerank slice of vectors).
    */
  def pqTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerank: Int = 0,
      broadcastQueries: Option[Boolean] = None,
      broadcastThreshold: Long = DefaultBroadcastQueryRows): DataFrame = {
    val cbs = graft.tables.GraftTable.forPath(spark, s"$indexPath/codebooks")
      .toDF.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(r => (r._2, r._3)).toSeq }
    val m = cbs.size
    val dsub = cbs.head.head._2.length
    val codeTable = graft.tables.GraftTable.forPath(spark, s"$indexPath/codes").toDF
    val q = l2normalized(queries, idCol, vecCol, "query_id", "__qv")

    def cbCol(j: Int) = array(cbs(j).map { case (_, cw) => lit(cw) }: _*)
    val adc = (0 until m).map { j =>
      dot(slice(col("__qv"), j * dsub + 1, dsub),
        element_at(cbCol(j), col("codes")(j) + 1))
    }.reduce(_ + _)

    // the corpus-wide pass carries CODES only (m small ints/row); true
    // vectors join back for the shortlist alone
    val scored = codeTable.select(col("corpus_id"), col("codes"))
      .crossJoin(maybeBroadcast(q, broadcastQueries, broadcastThreshold))
      .withColumn("adc_score", adc)
    val w = Window.partitionBy("query_id").orderBy(col("adc_score").desc, col("corpus_id"))
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          col("adc_score").as("score"))
    } else {
      val shortlist = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= math.max(k, rerank))
        .select(col("query_id"), col("corpus_id"), col("__qv"))
      val exact = shortlist
        .join(codeTable.select(col("corpus_id"), col("vector")), "corpus_id")
        .withColumn("__cn", norm(col("vector")))
        .withColumn("cosine", dot(col("vector"), col("__qv")) / col("__cn"))
      val w2 = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
      exact.withColumn("rank", row_number().over(w2))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
    }
  }

  /** Probe a [[buildIvfIndex]] index: same semantics and output shape as
    * [[ivfTopK]] at the index's centroid count, but the only corpus work is
    * a partition-pruned scan of the probed cells (≤ queries × nProbe
    * partitions of the cells table; the probed-cell collect is bounded by
    * the centroid count, never by data).
    */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int = 4,
      broadcastQueries: Option[Boolean] = None,
      broadcastThreshold: Long = DefaultBroadcastQueryRows): DataFrame = {
    val centroids = graft.tables.GraftTable.forPath(spark, s"$indexPath/centroids")
      .toDF.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq.sortBy(_._1)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .withColumn("__cell", explode(transform(
        nearestOf(centroids, col("__qv"), nProbe), _.getField("cid"))))
    val probedCells = q.select("__cell").distinct()
      .collect().map(_.getInt(0)).toSeq // bounded by numCentroids
    val cells = graft.tables.GraftTable.forPath(spark, s"$indexPath/cells").toDF
      .filter(col("cell").isInCollection(probedCells))
      .select(col("cell").as("__cell"), col("corpus_id"),
        col("vector").as("__cv"), col("norm").as("__cn"))
    val scored = cells.join(maybeBroadcast(q, broadcastQueries, broadcastThreshold), Seq("__cell"))
      .withColumn("cosine", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
