package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Core-scaling spot check for the two headline candidate generators
  * (VERDICT r17 #9) — NOT library surface. sf0.1 is fixed-overhead
  * dominated (8-core ≈ 32-core), so this upsamples to ~sf1-equivalent
  * volume and times ONLY the operators, letting a low/high-core wall ratio
  * ≫ 1 demonstrate the shapes parallelize.
  *
  * Usage: SPARK_GRAFT_CPUS=<n> sbt "runMain graft.tools.ScaleCoresProbe <sfDir> <docCopies> <hashRows>"
  */
object ScaleCoresProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val hashRows = if (args.length > 2) args(2).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALEPROBE cores=$cpus%-3s $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // hammingPairs: hashRows synthetic 64-bit hashes, 4-member duplicate
    // groups plus a 2-bit-perturbed member per 64-group (two-tier regime,
    // same shape as mm5/d3)
    val hashed = spark.range(0, hashRows).toDF("id")
      .withColumn("h",
        when(col("id") % 64 === 63,
          xxhash64(expr("id div 4").cast("string")).bitwiseXOR(lit(0x0000010000000100L)))
          .otherwise(xxhash64(expr("id div 4").cast("string"))))
    // warm one small run (janino compile off the clock)
    Dedup.hammingPairs(spark.range(0, 1000).toDF("id")
      .withColumn("h", xxhash64(col("id").cast("string"))), "id", "h")
      .agg(count(lit(1))).collect()
    (1 to 2).foreach { rep =>
      timed(s"hammingPairs_${hashRows}r_rep$rep") {
        val n = Dedup.hammingPairs(hashed, "id", "h", maxHamming = 3)
          .agg(count(lit(1))).first().getLong(0)
        println(s"  pairs=$n")
      }
    }

    // minhashLshPairs (the bucketPairs consumer): sf0.1 documents upsampled
    // key-shifted with IDENTICAL text, so copy groups form known clusters
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val up = (0 until copies).map(i =>
      docs.select((col("doc_id") + i.toLong * 10000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    Dedup.minhashLshPairs(docs.limit(512), "doc_id", "text", threshold = 0.5)
      .agg(count(lit(1))).collect() // warm
    (1 to 2).foreach { rep =>
      timed(s"minhashLshPairs_${copies}x_rep$rep") {
        val n = Dedup.minhashLshPairs(up, "doc_id", "text", threshold = 0.5)
          .agg(count(lit(1))).first().getLong(0)
        println(s"  pairs=$n")
      }
    }
    spark.stop()
  }
}
