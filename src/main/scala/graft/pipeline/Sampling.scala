package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and shard-packing for
  * training-data curation (the "mixing" stage of an LLM data pipeline:
  * subsample each source/language to a target weight, then pack the
  * survivors into fixed-token-budget shards).
  *
  * Everything here is keyed on an md5 rank of the row's identity columns, so
  * results are reproducible run-to-run, engine-to-engine (md5 hex is
  * bit-identical in Spark and DuckDB/Trino/any SQL engine), and INDEPENDENT
  * of partitioning, task order, and cluster size — properties
  * `df.sample(fraction, seed)` cannot give (its output depends on partition
  * layout). No RNG state is involved: "random" order IS the hash order.
  *
  * Scale design (100 TB corpus):
  *  - [[hashSample]] is a pure map-side filter — zero shuffles, fully
  *    codegen'd, pushes through any downstream plan.
  *  - [[stratifiedSample]] never sorts the corpus: md5 ranks are uniform BY
  *    CONSTRUCTION, so the K-th smallest rank in a stratum of n rows
  *    concentrates sharply around K/n·2^32; a conservative map-side
  *    threshold prefilter keeps O(K) rows per stratum, and only that sliver
  *    is window-sorted. A per-stratum count check catches the
  *    (cryptographically unlikely) shortfall and falls back to an exact pass
  *    over just the affected strata, so the result is EXACT top-K-by-hash.
  *  - [[packByBudget]] assigns docs to a deterministic bucket and runs the
  *    token cumsum per bucket — numBuckets-way parallel windows instead of
  *    one global sort, and each bucket packs independently exactly like a
  *    per-worker packer in a real shard-writer would.
  */
object Sampling {

  /** Deterministic rank in [0, 2^32): first 8 md5 hex digits of
    * `seed|key1|key2|...`, parsed as a number. Uniform by construction. */
  def hashRank(seed: String, keyCols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", (lit(seed) +: keyCols): _*)), 1, 8), 16, 10)
      .cast("long")

  /** Hex-string form of the same rank (lexicographic order == numeric order
    * at fixed width) — what the SQL oracle sorts/compares on. */
  def hashRankHex(seed: String, keyCols: Seq[Column]): Column =
    substring(md5(concat_ws("|", (lit(seed) +: keyCols): _*)), 1, 8)

  /** Deterministic Bernoulli(fraction) sample: keep a row iff its hash rank
    * falls below `fraction * 2^32`. Map-only (NO shuffle, no RNG): the same
    * rows survive on 1 executor or 1000, today and in every rerun, and a
    * later resample at a larger fraction is a SUPERSET of this one (nested
    * samples for free — grow a training mix without re-drawing it). */
  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double,
      seed: String = "42"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    val threshold = math.round(fraction * 4294967296.0) // 2^32
    df.filter(hashRank(seed, keyCols.map(col)) < lit(threshold))
  }

  /** 8-hex-digit threshold for fraction `f` of the rank space — the string
    * [[hashRankHex]] ranks compare against. Fraction 1.0 maps to "g"
    * (greater than every hex digit), because `%08x` of 2^32 would be NINE
    * digits and lexicographically SMALLER than most ranks. */
  private[graft] def fractionThresholdHex(f: Double): String = {
    require(f >= 0.0 && f <= 1.0, s"fraction $f not in [0,1]")
    // clamp: for f in [1 - 2^-33, 1) the rounding reaches 2^32, whose %08x
    // is NINE digits ("100000000") and sorts BELOW most 8-hex ranks — a
    // keep-everything stratum would keep ~6%
    if (f >= 1.0) "g"
    else f"${math.min(4294967295L, math.round(f * 4294967296.0))}%08x"
  }

  /** Per-stratum deterministic Bernoulli mix — the "source weights" stage
    * of a training-data recipe (keep 80% of wiki, 30% of web, 5% of logs):
    * each stratum keeps its own fraction, strata missing from `fractions`
    * keep `defaultFraction` (default 0 = dropped). Still a PURE MAP-SIDE
    * filter: the per-stratum threshold is a when-chain over the (small)
    * fractions map, so the mix runs in the scan with zero shuffles, and
    * every stratum's sample nests within any larger-fraction rerun. */
  def hashSampleMix(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], keyCols: Seq[String],
      defaultFraction: Double = 0.0, seed: String = "42"): DataFrame = {
    val thr = fractions.foldLeft(lit(fractionThresholdHex(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(fractionThresholdHex(f)))
          .otherwise(acc)
    }
    df.filter(hashRankHex(seed, keyCols.map(col)) < thr)
  }

  /** Temperature-flattened corpus mixing — the multilingual-LM alpha rule:
    * stratum `l`'s share of a `targetRows` sample is proportional to
    * `n_l^alpha`, so alpha=1 keeps the natural distribution, alpha=0 is
    * uniform across strata, and alpha∈(0,1) upweights the tail (the
    * standard fix for high-resource strata drowning the mix). Selection is
    * the same deterministic hash-threshold Bernoulli as [[hashSampleMix]],
    * with the per-stratum fractions computed FROM the data: one counting
    * pass (O(#strata) driver rows), then a map-only broadcast-join filter —
    * no when-chain (a 10⁵-stratum chain would blow up janino), no shuffle
    * of the corpus, nested-sample property preserved per stratum.
    *
    * Replayability: weights are fixed-point `floor(n^alpha * 1e6 + 0.5)` so
    * the cross-stratum weight sum is an integer — exact and
    * summation-order-free — and every further step (two divisions, the
    * 2^32 threshold) is a fixed IEEE op sequence an oracle reproduces
    * bit-for-bit (alpha=0.5 keeps even the power exact: sqrt is a
    * correctly-rounded IEEE op; other alphas depend on the platform's
    * `pow` rounding).
    */
  def temperatureMix(df: DataFrame, strataCol: String, targetRows: Long,
      keyCols: Seq[String], alpha: Double = 0.5, seed: String = "42"): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha $alpha not in [0,1]")
    val sizeRows = strataCounts(df, strataCol, "temperatureMix")
    // alpha=0.5 routes through sqrt, not pow: sqrt is correctly rounded by
    // the IEEE spec, while pow is only within 1 ulp (platform intrinsics
    // need not special-case y=0.5) — the documented bit-for-bit replay
    // contract for the default alpha holds on every JVM only via sqrt
    def power(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    val ws = sizeRows.map { case (stratum, n) =>
      (stratum, n, math.floor(power(n.toDouble) * 1e6 + 0.5).toLong)
    }
    val sumW = ws.map(_._3).sum
    val thresholds = ws.map { case (stratum, n, w) =>
      val frac = math.min(1.0,
        targetRows.toDouble * w.toDouble / sumW.toDouble / n.toDouble)
      (stratum, fractionThresholdHex(frac))
    }
    val thrDf = thresholdFrame(df, strataCol, "__tm_stratum", "__tm_thr", thresholds.toSeq)
    // null-safe join: a NULL stratum is a stratum too (it was counted into
    // the weight sum — dropping its rows would silently undershoot the
    // target); plain === would never match the null threshold row
    df.join(broadcast(thrDf), col(strataCol) <=> col("__tm_stratum"))
      .filter(hashRankHex(seed, keyCols.map(col)) < col("__tm_thr"))
      .drop("__tm_stratum", "__tm_thr")
  }

  /** Per-stratum counts with the shared cardinality guard (`take(bound+1)`
    * caps the transfer even when a key column is mistakenly passed as the
    * stratum — fail loudly rather than pull a data-sized result).
    */
  private def strataCounts(df: DataFrame, strataCol: String,
      op: String): Array[(Any, Long)] = {
    val rows = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n")).take(1000001)
    require(rows.length <= 1000000,
      s"$op: column '$strataCol' has over 1e6 distinct values — " +
        "that is a key, not a stratum")
    rows.map(r => (r.get(0), r.getLong(1)))
  }

  /** O(#strata) broadcastable (stratum → hex threshold) frame — the shared
    * alternative to a per-stratum when-chain (which at 10⁵ strata compiles
    * pathological janino).
    */
  private def thresholdFrame(df: DataFrame, strataCol: String,
      stratumName: String, thrName: String, rows: Seq[(Any, String)]): DataFrame =
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(
        rows.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(stratumName,
          df.schema(strataCol).dataType),
        org.apache.spark.sql.types.StructField(thrName,
          org.apache.spark.sql.types.StringType))))

  /** Deterministic integer upsampling — the "epochs per source" stage of a
    * training mix (see high-quality sources 3x per epoch, the long tail
    * once): each row of stratum s is replicated `epochs(s)` times (strata
    * absent from the map: `defaultEpochs`), tagged with a `copy` index so
    * downstream shard packing treats copies as distinct units. Generator
    * (explode of a per-row sequence) — no join, no shuffle; row counts
    * scale exactly by the epoch weights. */
  def replicateByStratum(df: DataFrame, strataCol: String,
      epochs: Map[String, Int], defaultEpochs: Int = 1): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "epoch counts must be >= 0")
    val n = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (stratum, e)) =>
      when(col(strataCol) === lit(stratum), lit(e)).otherwise(acc)
    }
    df.withColumn("__n", n)
      .filter(col("__n") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), (col("__n") - 1).cast("long"))))
      .drop("__n")
  }

  /** Exact per-stratum top-K-by-hash sample: for each stratum, the `perStratum`
    * rows with the smallest (hash rank, tiebreak keys) — i.e. a deterministic
    * uniform sample WITHOUT replacement of fixed size per stratum (all rows
    * if the stratum is smaller). Two phases:
    *  1. one partial-agg pass per stratum computing the row count AND a
    *     33-level rank histogram (`c_k` = rows with rank below 2^k), from
    *     which both the ~3K+slack prefilter threshold and a CONSERVATIVE
    *     kept-count lower bound per stratum are derived;
    *  2. a window row_number over the surviving sliver only.
    * A stratum whose histogram cannot PROVE at least min(K, n) rows survive
    * the prefilter (probability < e^-K for the 3x margin) is flagged and
    * bypasses the prefilter entirely — trim over all of a stratum's rows
    * equals trim over its prefiltered rows whenever ≥K actually survived,
    * so a conservatively flagged stratum returns identical rows either way.
    * The flag rides the broadcast threshold table, so the operator runs the
    * UPSTREAM exactly twice (decide + emit) — the previous formulation's
    * separate post-prefilter count was a third full upstream execution,
    * which at 100 TB re-runs everything above it (measured on the d16
    * funnel: the langId/fingerprint subtree executed 3x per consume). */
  def stratifiedSample(df: DataFrame, strataCol: String, perStratum: Int,
      keyCols: Seq[String], seed: String = "42"): DataFrame = {
    require(perStratum > 0, s"perStratum must be positive, got $perStratum")
    val rank = hashRankHex(seed, keyCols.map(col))
    val ranked = df.withColumn("__rank", rank)

    // per-stratum sizes AND rank histogram in ONE partial-aggregated pass,
    // O(#strata) rows: c_k = #(rank < 2^k) lets the driver both size the
    // prefilter threshold and LOWER-BOUND how many rows will survive it,
    // so no second upstream pass is needed to certify exactness.
    // The collect below is #strata-bounded — a mistakenly high-cardinality
    // stratum column (a doc id, a timestamp) would turn it into a
    // data-sized driver pull, so fail loudly past a sanity bound instead.
    val ladder = (0 to 32).map { k =>
      // k = 32 covers the whole 32-bit rank space; hex digits sort below
      // 'g', so "g" compares above every rank
      val lim = if (k == 32) "g" else f"${1L << k}%08x"
      sum(when(col("__rank") < lit(lim), 1L).otherwise(0L)).as(s"__c$k")
    }
    val sizes = ranked.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"), ladder: _*)

    // conservative uniform-hash threshold: fraction (3K+200)/n of 2^32,
    // as an 8-hex-digit string (so the filter is a plain string compare
    // against the precomputed rank column — stays in codegen)
    // #strata-bounded driver pull: `take(bound + 1)` caps the transfer even
    // if a key column was mistakenly passed as the stratum — fail loudly
    // rather than collecting a data-sized result
    val sizeRows = sizes.take(1000001)
    require(sizeRows.length <= 1000000,
      s"stratifiedSample: column '$strataCol' has over 1e6 distinct values — " +
        "that is a key, not a stratum; sample with hashSample instead")
    val thresholds = sizeRows.map { r =>
      val stratum = r.get(0)
      val n = r.getLong(1)
      val frac = math.min(1.0, (3.0 * perStratum + 200.0) / math.max(n, 1L))
      val tnum = math.min(4294967295L, math.round(frac * 4294967296.0))
      val thr = f"$tnum%08x"
      // exactness guard, decided from the SAME pass: ranks below 2^k are
      // all <= thr whenever 2^k - 1 <= tnum, so c_k lower-bounds the
      // prefilter's kept count. A stratum the bound cannot certify
      // (keptLb < min(K, n)) bypasses the prefilter — trim over ALL its
      // rows returns the same K smallest (rank, keys) rows whenever >= K
      // actually survived, so conservative flagging never changes output.
      val k = math.min(32, 63 - java.lang.Long.numberOfLeadingZeros(tnum + 1))
      val keptLb = r.getLong(2 + k)
      val exact = keptLb < math.min(perStratum.toLong, n)
      (stratum, n, thr, exact)
    }
    val thrDf = df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(
        thresholds.map(t =>
          org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)).toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__stratum",
          df.schema(strataCol).dataType),
        org.apache.spark.sql.types.StructField("__n",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__thr",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__exact",
          org.apache.spark.sql.types.BooleanType))))

    // broadcast the O(#strata) threshold table; the corpus-side filter is
    // map-only — only ~3K rows per stratum (all rows of a flagged stratum)
    // ever reach the window sort. Null-safe join: a NULL stratum is a
    // stratum too (it was counted by the sizes pass and owns a threshold
    // row); plain === would silently drop its rows — same rule as
    // temperatureMix's threshold join below.
    val pre = ranked.join(broadcast(thrDf), col(strataCol) <=> col("__stratum"))
      .filter(col("__rank") <= col("__thr") || col("__exact"))

    val w = Window.partitionBy(col(strataCol))
      .orderBy((col("__rank") +: keyCols.map(col)): _*)
    pre
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rank", "__rn", "__stratum", "__n", "__thr", "__exact")
  }

  /** Token-budget shard packing: assign each doc to a shard such that every
    * shard holds ~`budget` tokens. Docs are laid out deterministically —
    * bucket = id mod numBuckets, then by id within the bucket — and a doc
    * lands in the shard where its start offset falls (`floor(exclusive
    * cumsum / budget)`), so shards fill to the budget with at most one
    * boundary-spanning doc, exactly the layout a sequence-packing shard
    * writer produces. Each bucket packs independently (numBuckets parallel
    * window sorts, each over corpus/numBuckets rows — no global sort), which
    * is also the unit a 1000-executor writer would own. Output adds
    * `bucket`, `shard` (global: `local_shard * numBuckets + bucket`, an
    * interleaving that never collides whatever each bucket's shard count),
    * and `offset` (tokens before this doc within its shard's bucket-local
    * stream). */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      budget: Long, numBuckets: Int): DataFrame = {
    require(budget > 0 && numBuckets > 0, "budget and numBuckets must be positive")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", pmod(col(idCol), lit(numBuckets.toLong)).cast("long"))
      .withColumn("__cum", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("__local_shard", floor(col("__cum") / lit(budget)))
      .withColumn("shard",
        col("__local_shard") * lit(numBuckets.toLong) + col("bucket"))
      .withColumn("offset", col("__cum") - col("__local_shard") * lit(budget))
      .drop("__cum", "__local_shard")
  }
}
