package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 optimization probe — NOT part of the library surface.
  *
  * Runs named SparkEntry queries in the Bench session shape, with a
  * SparkListener counting jobs/stages and summing task time, so a change's
  * effect shows up as structure (fewer jobs/stages), not just wall noise.
  *
  * Usage: runMain graft.tools.ProfileR18 <sfDir> <reps> <q1,q2,...> [planDir]
  * With planDir set, each query's .explain("formatted") lands at
  * <planDir>/<name>.txt (plan of the LAST rep).
  */
object ProfileR18 {

  final class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskTimeMs = 0L
    val stageDetail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += s.stageInfo.numTasks
      val ms = s.stageInfo.taskMetrics.executorRunTime
      taskTimeMs += ms
      val wall = (for {
        a <- s.stageInfo.completionTime; b <- s.stageInfo.submissionTime
      } yield a - b).getOrElse(-1L)
      stageDetail.add(
        f"      stage ${s.stageInfo.stageId}%-4d tasks=${s.stageInfo.numTasks}%-4d " +
          f"wall=${wall / 1000.0}%6.2f cpuTask=${ms / 1000.0}%7.2f  ${s.stageInfo.name.take(90)}")
    }
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0L; stageDetail.clear() }
  }

  private def consume(df: DataFrame): Unit = {
    val hashable = df.select(df.columns.map { c =>
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.MapType => col(c).cast("string").as(c)
        case _ => col(c)
      }
    }.toIndexedSeq: _*)
    hashable.agg(bit_xor(xxhash64(struct(hashable.columns.map(col).toIndexedSeq: _*)))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val planDir = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog", "graft.catalog.GraftSessionCatalog")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    // same warmups as Bench so first-rep numbers aren't JIT noise
    spark.range(1000000).selectExpr("sum(id)").collect()
    try consume(graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }
    try {
      import spark.implicits._
      val toy = (0 until 64)
        .map(i => (i.toLong, s"sample text ${i % 8} lorem ipsum dolor sit amet tok$i"))
        .toDF("doc_id", "text")
      graft.pipeline.Dedup.minhashDedupClusters(toy, "doc_id", "text", threshold = 0.5)
        .agg(count(lit(1))).collect()
    } catch { case _: Throwable => () }
    try {
      import spark.implicits._
      val toyIds = (0 until 64).map(_.toLong).toDF("doc_id")
      val toyAssets = graft.pipeline.Multimodal
        .synthesizePatternPngAssets(spark, toyIds, "doc_id")
      graft.pipeline.Multimodal.imageNearDupPairs(toyAssets, maxHamming = 3)
        .agg(count(lit(1))).collect()
    } catch { case _: Throwable => () }
    try {
      import spark.implicits._
      val dirW = java.nio.file.Files.createTempDirectory("profwarm").resolve("t").toString
      val base = (0 until 64).map(i => (i.toLong, i.toString)).toDF("id", "v")
      val tw = graft.tables.GraftTable.create(spark, dirW, base)
      graft.operators.GraftMerge(tw, "t")
        .merge(base.withColumn("v", concat(col("v"), lit("x"))), "t.id = s.id", Some("s"))
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    } catch { case _: Throwable => () }

    names.foreach { name =>
      val fn = graft.SparkEntry.staged(name)
      (1 to reps).foreach { rep =>
        // fixture rebuilt PER REP (matches Bench's rerun behavior — several
        // fixtures are single-consume: txn-appId sinks, scratch tables)
        val f0 = System.nanoTime()
        val thunk = fn(spark, sfDir)
        val f1 = System.nanoTime()
        if (rep == 1) println(f"PROBE $name fixture ${(f1 - f0) / 1e9}%.3f s")
        counts.reset()
        val t0 = System.nanoTime()
        val df = thunk()
        consume(df)
        val t1 = System.nanoTime()
        // listener events drain asynchronously; give them a beat
        Thread.sleep(300)
        println(f"PROBE $name rep$rep ${(t1 - t0) / 1e9}%7.3f s  jobs=${counts.jobs}%-3d " +
          f"stages=${counts.stages}%-4d tasks=${counts.tasks}%-5d taskTime=${counts.taskTimeMs / 1000.0}%7.2f s")
        if (rep == reps && sys.env.contains("PROFILE_STAGES"))
          counts.stageDetail.forEach(println(_))
        if (rep == reps) planDir.foreach { pd =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(pd, s"$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }
    spark.streams.active.foreach { q =>
      try { q.stop(); q.awaitTermination(10000); () } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
