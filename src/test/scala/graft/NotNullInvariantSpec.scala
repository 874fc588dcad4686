package graft

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TableOps
import graft.tables._

/** NOT NULL invariants (Delta's nullability enforcement): the table
  * schema's brand is authoritative and survives appends of nullable-schema
  * frames; VALUES are checked per row inside the write projection; frames
  * missing a branded column outright are refused; evolution-appended
  * columns are forcibly nullable; SET NOT NULL validates existing rows
  * (footer nullCounts first, one scan when stats can't prove it) and DROP
  * NOT NULL relaxes metadata-only.
  */
class NotNullInvariantSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def violated(body: => Any): Boolean =
    try { body; false }
    catch {
      case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(c => Option(c.getMessage).exists(_.contains("NOT NULL")))
    }

  it("create preserves the brand; nullable-schema appends keep it; null values refuse") {
    val t = GraftTable.create(spark, tmpTableDir("nn-basic"),
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")) // id: BIGINT NOT NULL
    assert(!t.snapshot.schema("id").nullable, "Seq.toDF long is non-null — brand must persist")

    // nullable-SCHEMA frame, null-free VALUES: accepted, brand stands
    val nullableFrame = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(3L, "c")),
      StructType(Seq(StructField("id", LongType, nullable = true),
        StructField("name", StringType, nullable = true))))
    t.append(nullableFrame)
    val t2 = GraftTable.forPath(spark, t.path)
    assert(!t2.snapshot.schema("id").nullable, "a nullable append must not erode the brand")
    assert(t2.toDF.count() == 3)

    // a null VALUE in the branded column refuses at write, nothing commits
    val vBefore = t2.version
    val nullRow = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null, "d")),
      StructType(Seq(StructField("id", LongType, nullable = true),
        StructField("name", StringType, nullable = true))))
    assert(violated(t2.append(nullRow)), "null into NOT NULL must throw")
    assert(GraftTable.forPath(spark, t.path).version == vBefore)
    assert(GraftTable.forPath(spark, t.path).toDF.count() == 3)
  }

  it("a frame missing a branded column refuses; declared DEFAULT satisfies it") {
    val t = GraftTable.create(spark, tmpTableDir("nn-missing"),
      Seq((1L, "a")).toDF("id", "name"))
    val e = intercept[IllegalArgumentException] { t.append(Seq("b").toDF("name")) }
    assert(e.getMessage.contains("NOT NULL") && e.getMessage.contains("id"), e.getMessage)

    // the default fill runs BEFORE the invariant, so a declared DEFAULT
    // (or identity/generated) column satisfies it
    val t2 = GraftTable.create(spark, tmpTableDir("nn-default"),
      Seq((1L, "a")).toDF("id", "name"),
      properties = Map(GraftTable.DefaultPropertyPrefix + "id" -> "CAST(0 AS BIGINT)"))
    t2.append(Seq("b").toDF("name"))
    assert(GraftTable.forPath(spark, t2.path).toDF
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
  }

  it("evolution-appended columns are forcibly nullable") {
    val t = GraftTable.create(spark, tmpTableDir("nn-evolve"),
      Seq((1L, "a")).toDF("id", "name"))
    t.append(Seq((2L, "b", 7L)).toDF("id", "name", "extra")) // extra: non-null frame
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.snapshot.schema("extra").nullable,
      "pre-evolution files read null for the new column — it cannot be branded")
    assert(t2.toDF.where(col("extra").isNull).count() == 1)
  }

  it("nested struct leaves enforce through non-null ancestors only") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("leaf", LongType, nullable = false),
        StructField("free", StringType, nullable = true))), nullable = true)))
    def row(id: java.lang.Long, s: org.apache.spark.sql.Row) =
      org.apache.spark.sql.Row(id, s)
    val dir = tmpTableDir("nn-nested")
    val t = GraftTable.create(spark, dir, spark.createDataFrame(
      java.util.List.of(row(1L, org.apache.spark.sql.Row(10L, "x"))), schema))
    // a NULL struct passes (nullable parent: no leaf to check)
    t.append(spark.createDataFrame(java.util.List.of(row(2L, null)), schema))
    assert(GraftTable.forPath(spark, dir).toDF.count() == 2)
    // a present struct with a null branded leaf refuses
    val nullLeaf = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("leaf", LongType, nullable = true),
        StructField("free", StringType, nullable = true))), nullable = true)))
    assert(violated(GraftTable.forPath(spark, dir).append(spark.createDataFrame(
      java.util.List.of(row(3L, org.apache.spark.sql.Row(null, "y"))), nullLeaf))))
  }

  it("SET NOT NULL validates existing rows; DROP NOT NULL relaxes") {
    val t = GraftTable.create(spark, tmpTableDir("nn-set"),
      Seq((Some(1L), "a"), (None, "b")).toDF("id", "name")) // nullable id, one null
    assert(t.snapshot.schema("id").nullable)
    // footer nullCount > 0 at top level: refused without a scan
    val e = intercept[IllegalArgumentException] {
      t.setColumnNullability("id", nullable = false)
    }
    assert(e.getMessage.contains("existing rows are null"), e.getMessage)
    // clean the nulls, then SET succeeds (footer nullCounts prove it)
    TableOps.delete(t, Some("id IS NULL"))
    val t2 = GraftTable.forPath(spark, t.path)
    val v = t2.setColumnNullability("id", nullable = false)
    val t3 = GraftTable.forPath(spark, t.path)
    assert(t3.version == v && !t3.snapshot.schema("id").nullable)
    assert(t3.history().head._2.operation == "SET NOT NULL")
    // enforcement is live
    assert(violated(t3.append(Seq((Option.empty[Long], "c")).toDF("id", "name"))))
    // DROP relaxes; the null append then lands (SQL surface round-trips)
    spark.sql(s"ALTER TABLE '${t.path}' ALTER COLUMN id DROP NOT NULL")
    val t4 = GraftTable.forPath(spark, t.path)
    assert(t4.snapshot.schema("id").nullable)
    t4.append(Seq((Option.empty[Long], "c")).toDF("id", "name"))
    assert(GraftTable.forPath(spark, t.path).toDF.where(col("id").isNull).count() == 1)
  }

  it("SET NOT NULL over a DV-masked null falls back to a live-row scan") {
    val t = GraftTable.create(spark, tmpTableDir("nn-dv"),
      Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c")).toDF("id", "name").coalesce(1),
      properties = Map(DeletionVectors.Property -> "true"))
    TableOps.delete(t, Some("id IS NULL")) // DV masks the null row in place
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.snapshot.files.exists(_.dv.exists(_.cardinality > 0)),
      "fixture must take the DV path")
    // footer nullCount still counts the masked null — only the scan can
    // prove the LIVE rows are clean
    val v = t2.setColumnNullability("id", nullable = false)
    assert(!GraftTable.forPath(spark, t.path).snapshot.schema("id").nullable)
    assert(v == t2.version + 1 || v == t2.version) // committed
  }

  it("plain overwrites keep the brand; REPLACE TABLE redefines it") {
    val t = GraftTable.create(spark, tmpTableDir("nn-ovw"),
      Seq((1L, "a")).toDF("id", "name")) // id branded NOT NULL
    // mode=overwrite with a nullable-SCHEMA frame: brand survives (like
    // CHECK constraints), values enforced
    val clean = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(2L, "b")),
      StructType(Seq(StructField("id", LongType, nullable = true),
        StructField("name", StringType, nullable = true))))
    t.overwrite(clean)
    val t2 = GraftTable.forPath(spark, t.path)
    assert(!t2.snapshot.schema("id").nullable,
      "an overwrite must not silently un-brand (DROP NOT NULL exists for that)")
    // a branded overwrite WITH nulls refuses instead of un-branding
    val dirty = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null, "c")),
      StructType(Seq(StructField("id", LongType, nullable = true),
        StructField("name", StringType, nullable = true))))
    assert(violated(t2.overwrite(dirty)))
    // REPLACE TABLE is a redefinition: the new declared schema stands
    TableOps.replaceTable(GraftTable.forPath(spark, t.path), Some(dirty))
    val t3 = GraftTable.forPath(spark, t.path)
    assert(t3.snapshot.schema("id").nullable)
    assert(t3.toDF.where(col("id").isNull).count() == 1)
  }

  it("SET NOT NULL landing mid-stream reroutes later epochs through enforcement") {
    val _ = SparkSessionTestWrapper.catalogWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.nn2")
    spark.sql("DROP TABLE IF EXISTS graft_cat.nn2.t")
    spark.sql("CREATE TABLE graft_cat.nn2.t (id BIGINT, name STRING) USING graft")
    val src = java.nio.file.Files.createTempDirectory("nn2-src-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("nn2-ckpt-").toString
    Seq((Some(1L), "a")).toDF("id", "name")
      .write.mode("append").parquet(s"$src/files")
    val q = spark.readStream.schema("id BIGINT, name STRING").parquet(s"$src/files")
      .writeStream.option("checkpointLocation", ckpt).toTable("graft_cat.nn2.t")
    try {
      q.processAllAvailable() // epoch 1: nullable table, direct path
      assert(spark.table("graft_cat.nn2.t").count() == 1)
      // the brand lands while the SAME query (plan-time snapshot already
      // taken) keeps running — commit-time coverage must reroute epoch 2
      // through the full engine, which rejects the null row
      val t = GraftTable.forName(spark, "graft_cat.nn2.t")
      t.setColumnNullability("id", nullable = false)
      Seq((Option.empty[Long], "b")).toDF("id", "name")
        .write.mode("append").parquet(s"$src/files")
      val failed =
        try { q.processAllAvailable(); false }
        catch { case e: Throwable =>
          Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(12)
            .exists(c => Option(c.getMessage).exists(_.contains("NOT NULL"))) }
      assert(failed, "the mid-stream brand must be enforced on later epochs")
      assert(spark.table("graft_cat.nn2.t").count() == 1)
    } finally q.stop()
  }

  it("streaming toTable epoch writers enforce the table's brand per row") {
    val _ = SparkSessionTestWrapper.catalogWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.nn")
    spark.sql("DROP TABLE IF EXISTS graft_cat.nn.t")
    spark.sql("CREATE TABLE graft_cat.nn.t (id BIGINT NOT NULL, name STRING) USING graft")
    val t = GraftTable.forName(spark, "graft_cat.nn.t")
    assert(!t.snapshot.schema("id").nullable, "DDL NOT NULL must brand the table")
    val src = java.nio.file.Files.createTempDirectory("nn-src-").toString
    Seq((Some(2L), "b"), (None, "c")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$src/files")
    val ckpt = java.nio.file.Files.createTempDirectory("nn-ckpt-").toString
    val q = spark.readStream.schema("id BIGINT, name STRING").parquet(s"$src/files")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("graft_cat.nn.t")
    val failed =
      try { q.awaitTermination(120000); false }
      catch { case e: Throwable =>
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10)
          .exists(c => Option(c.getMessage).exists(_.contains("NOT NULL"))) }
    assert(failed, "a null row through the epoch writers must fail the stream")
    // nothing committed: the table is still empty
    assert(spark.table("graft_cat.nn.t").count() == 0)
  }
}
