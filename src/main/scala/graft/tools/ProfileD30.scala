package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Leg-by-leg breakdown of d30_ensemble_pairs — NOT library surface. */
object ProfileD30 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def consume(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1))).first().getLong(0)

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      time("jaccard_leg")(println("  rows=" + consume(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5))))
      time("simhash32_leg")(println("  rows=" + consume(
        Dedup.simhashPairs(docs, "doc_id", "text",
          maxHamming = 3, bits = 32, tokenHash = Dedup.md5TokenHash32))))
      time("simhash32_hash_only")(println("  rows=" + consume(
        Dedup.simhash(docs, "doc_id", "text", 32, Dedup.md5TokenHash32))))
      time("simhash32_xxhash")(println("  rows=" + consume(
        Dedup.simhash(docs, "doc_id", "text", 32))))
      time("md5_tokens_only")(println("  sum=" + docs
        .select(explode(Dedup.tokenize(col("text"))).as("t"))
        .filter(length(col("t")) > 0)
        .agg(sum(Dedup.md5TokenHash32(col("t")))).first().getLong(0)))
      time("d30_join")(println("  rows=" + consume(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
          .join(Dedup.simhashPairs(docs, "doc_id", "text",
            maxHamming = 3, bits = 32, tokenHash = Dedup.md5TokenHash32),
            Seq("idA", "idB")))))
    }
    spark.stop()
  }
}
