package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** minhashLshPairs sub-part breakdown — NOT library surface. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var cpuMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        cpuMs += s.stageInfo.taskMetrics.executorRunTime
    })
    def time[A](label: String)(f: => A): A = {
      val c0 = cpuMs
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(200)
      println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(cpuMs - c0) / 1000.0}%7.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      // mirror of minhashLshPairs internals at the d2 setting
      val withSh = time("shingle+checkpoint") {
        val p = graft.pipeline.Parallelize.widen(
          docs.select(col("doc_id").as("__id"), col("text").as("__t")))
          .select(col("__id"), Dedup.tokenize(col("__t")).as("__toks"))
          .select(col("__id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("__sh"))
          .filter(size(col("__sh")) > 0)
        p.localCheckpoint()
      }
      val banded = withSh
        .withColumn("__sig", Dedup.minhashSignature(col("__sh"), 64))
        .select(col("__id"), size(col("__sh")).as("__sz"),
          explode(transform(sequence(lit(0), lit(15)),
            b => struct(b.as("band"),
              xxhash64(slice(col("__sig"), b * 4 + 1, lit(4))).as("bh")))).as("__b"))
        .select(col("__id"), col("__sz"), col("__b.band"), col("__b.bh"))
      time("banded_consume")(banded.agg(count(lit(1))).collect())
      val shuffleParts = 32
      val cand = banded
        .repartition(shuffleParts, col("band"), col("bh"))
        .groupBy(col("band"), col("bh"))
        .agg(collect_list(struct(col("__id"), col("__sz"))).as("__ms"))
        .filter(size(col("__ms")).between(2, 1 << 20))
        .select(explode(col("__ms")).as("__a"), col("__ms"))
        .select(col("__a"), explode(col("__ms")).as("__b"))
        .filter(col("__a.__id") < col("__b.__id"))
        .filter(least(col("__a.__sz"), col("__b.__sz")) >=
          greatest(col("__a.__sz"), col("__b.__sz")) * 0.8)
        .groupBy(col("__a.__id").as("idA"), col("__b.__id").as("idB"),
          col("__a.__sz").as("szA"), col("__b.__sz").as("szB"))
        .agg(count(lit(1)).as("cnt"))
      time("candidates_consume")(println("  cand=" + cand.count()))
      val verified = cand
        .join(withSh.select(col("__id").as("idA"), col("__sh").as("shA")), "idA")
        .join(withSh.select(col("__id").as("idB"), col("__sh").as("shB")), "idB")
        .withColumn("__inter", size(array_intersect(col("shA"), col("shB"))).cast("double"))
        .withColumn("jaccard",
          col("__inter") / (size(col("shA")) + size(col("shB")) - col("__inter")))
        .filter(col("jaccard") >= 0.8)
      time("verify_consume")(println("  pairs=" + verified.count()))
      time("full_operator")(println("  rows=" +
        Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8).count()))
    }
    spark.stop()
  }
}
