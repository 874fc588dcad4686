package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q15_stream_dedup conf probe — NOT library surface. Replays the q15
  * harness under (noDataMicroBatches × shuffle.partitions) combinations to
  * settle VERDICT r17's open regression question.
  */
object ProfileQ15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()

    def runOnce(ndmb: Boolean, parts: Int): Double = {
      val t0 = System.nanoTime()
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val prevNdmb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", ndmb.toString)
      try {
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val stream = input.toDF().toDF("doc_id", "text")
        val name = "q15p_" + java.util.UUID.randomUUID().toString.replace("-", "")
        val query = graft.streaming.StreamingOps.fingerprintDedupStream(stream)
          .select("fingerprint")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try {
          rows.grouped(math.max(1, rows.length / 4 + 1))
            .foreach { b => input.addData(b.toIndexedSeq); query.processAllAvailable() }
        } finally query.stop()
        val n = spark.table(name).count()
        require(n > 0)
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNdmb)
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm
    runOnce(ndmb = false, parts = 8)
    for (rep <- 1 to 3; ndmb <- Seq(false, true); parts <- Seq(8, 4, 32)) {
      val s = runOnce(ndmb, parts)
      println(f"PROFILE q15 rep$rep ndmb=$ndmb%-5s parts=$parts%-2d $s%7.3f s")
    }
    spark.stop()
  }
}
