package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Scratch profiler for the dedup hot path — NOT part of the library surface.
  * Breaks d2/d4 wall time into stages so optimization targets the real cost.
  */
object ProfileDedup {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROFILE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-dedup")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("read+count")(docs.count())

    // stage 1: tokenize only
    val toks = docs.select(col("doc_id").as("__id"), Dedup.tokenize(col("text")).as("__toks"))
    time("tokenize")(toks.agg(sum(size(col("__toks")))).collect())

    // stage 2: shingles (tokenize + gram-hash + distinct)
    val sh = toks.select(col("__id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
    time("shingles")(sh.agg(sum(size(col("__sh")))).collect())
    time("shingles-2nd")(sh.agg(sum(size(col("__sh")))).collect())

    // stage 3: + minhash signature
    val sig = sh.select(col("__id"), Dedup.minhashSignature(col("__sh"), 64).as("__sig"))
    time("shingles+minhash")(sig.agg(sum(size(col("__sig")))).collect())

    // d4 stage breakdown: postings, hot count, candidates, verification
    val withSh2 = docs.select(col("doc_id").as("__id"), Dedup.shingles(col("text"), 3).as("__sh")).persist()
    val inverted = withSh2.select(explode(col("__sh")).as("__g"), col("__id"), size(col("__sh")).as("__sz"))
    time("d4_postings_count")(println("postings=" + inverted.count()))
    val grouped = inverted.groupBy("__g")
      .agg(collect_list(struct(col("__id"), col("__sz"))).as("__ms"))
      .filter(size(col("__ms")) >= 2)
    time("d4_grouped")(println("groups>=2 " + grouped.count()))
    val cands = grouped
      .select(explode(col("__ms")).as("__a"), col("__ms"))
      .select(col("__a"), explode(col("__ms")).as("__b"))
      .filter(col("__a.__id") < col("__b.__id"))
    time("d4_rawpairs")(println("rawpairs=" + cands.count()))
    time("d4_distinct_pairs")(println("pairs=" +
      cands.select(col("__a.__id").as("idA"), col("__b.__id").as("idB"))
        .dropDuplicates("idA", "idB").count()))
    withSh2.unpersist()

    // d2 stage breakdown
    val withSh3 = docs.select(col("doc_id").as("__id"), Dedup.shingles(col("text"), 3).as("__sh")).persist()
    val sig3 = withSh3.withColumn("__sig", Dedup.minhashSignature(col("__sh"), 64))
    time("d2_sig")(sig3.agg(sum(size(col("__sig")))).collect())
    val banded3 = sig3.select(col("__id"), size(col("__sh")).as("__sz"),
      explode(transform(sequence(lit(0), lit(31)),
        b => struct(b.as("band"), xxhash64(slice(col("__sig"), b * 2 + 1, lit(2))).as("bh")))).as("__b"))
      .select(col("__id"), col("__sz"), col("__b.band"), col("__b.bh"))
    time("d2_banded")(println("banded=" + banded3.count()))
    val grouped3 = banded3.groupBy("band", "bh")
      .agg(collect_list(struct(col("__id"), col("__sz"))).as("__ms"))
      .filter(size(col("__ms")) >= 2)
    time("d2_buckets")(println("buckets>=2 " + grouped3.count()))
    withSh3.unpersist()

    // full pipelines
    time("d2_full")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, numHashes = 64,
        bands = 32, threshold = 0.5).count())
    time("d4_full")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count())

    spark.stop()
  }
}
