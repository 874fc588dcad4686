package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Dedup

/** The codegen'd [[graft.functions.MinHashSignature]] must be bit-identical
  * to the composed-built-ins formulation it replaced (the d2 oracle's recall
  * math was derived for that exact permutation family).
  */
class MinHashExprSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def randomShingles(seed: Long, rows: Int): Seq[(Long, Seq[Long])] = {
    val rnd = new java.util.Random(seed)
    (0 until rows).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(rnd.nextInt(Int.MaxValue).toLong))
    }
  }

  describe("MinHashSignature expression") {

    it("matches the composed array_min/transform formulation bit-for-bit") {
      val df = randomShingles(7L, 200).toDF("id", "sh")
      val mismatches = df
        .withColumn("fast", Dedup.minhashSignature(col("sh"), 64))
        .withColumn("slow", Dedup.minhashSignatureComposed(col("sh"), 64))
        .filter(not(col("fast") <=> col("slow")))
        .count()
      assert(mismatches == 0)
    }

    it("matches under a different seed and hash count") {
      val df = randomShingles(99L, 50).toDF("id", "sh")
      val mismatches = df
        .withColumn("fast", Dedup.minhashSignature(col("sh"), 16, seed = 1234L))
        .withColumn("slow", Dedup.minhashSignatureComposed(col("sh"), 16, seed = 1234L))
        .filter(not(col("fast") <=> col("slow")))
        .count()
      assert(mismatches == 0)
    }

    it("interpreted eval agrees with codegen") {
      // filter-pushed predicates sometimes run interpreted; both paths must agree
      val expr = graft.functions.MinHashSignature(
        org.apache.spark.sql.graft.SparkBridge.expression(col("sh")), 8, 42L)
      val df = randomShingles(3L, 20).toDF("id", "sh")
      val viaCodegen = df
        .select(org.apache.spark.sql.graft.SparkBridge.column(expr).as("sig"))
        .collect().map(_.getSeq[Long](0))
      val rows = df.select("sh").collect().map(_.getSeq[Long](0))
      val viaEval = rows.map { sh =>
        val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sh.toArray)
        expr.copy(child = org.apache.spark.sql.catalyst.expressions.Literal(
          arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
          .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
      }
      assert(viaCodegen.map(_.toSeq).toSeq == viaEval.map(_.toSeq).toSeq)
    }

    it("handles empty arrays and null elements like the composed form") {
      val df = Seq(
        (1L, Seq.empty[Option[Long]]),
        (2L, Seq(Some(5L), None, Some(17L))),
        (3L, Seq[Option[Long]](None, None))
      ).toDF("id", "sh")
      val bad = df
        .withColumn("fast", Dedup.minhashSignature(col("sh"), 8))
        .withColumn("slow", Dedup.minhashSignatureComposed(col("sh"), 8))
        .filter(not(col("fast") <=> col("slow")))
        .count()
      assert(bad == 0)
    }

    it("propagates null input") {
      val df = Seq((1L, null.asInstanceOf[Seq[Long]])).toDF("id", "sh")
      val out = df.select(Dedup.minhashSignature(col("sh"), 8).as("sig")).collect()
      assert(out.head.isNullAt(0))
    }

    it("rejects non-array<bigint> input at analysis time") {
      val df = Seq((1, "text")).toDF("id", "t")
      intercept[Exception] {
        df.select(Dedup.minhashSignature(col("t"), 8)).collect()
      }
      ()
    }
  }

    it("registers as a SQL function: literal args, same results as the Column API") {
      graft.functions.GraftFunctions.register(spark)
      val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text")
      docs.select(Dedup.shingles($"text", 3).as("sh")).createOrReplaceTempView("mh_sql_in")
      val viaSql = spark.sql("SELECT minhash_signature(sh, 16, 7) AS sig FROM mh_sql_in")
        .head().getSeq[Long](0)
      val viaApi = docs.select(
        Dedup.minhashSignature(Dedup.shingles($"text", 3), 16, 7L).as("sig"))
        .head().getSeq[Long](0)
      assert(viaSql == viaApi)
      // defaults apply with one argument
      assert(spark.sql("SELECT size(minhash_signature(sh)) FROM mh_sql_in")
        .head().getInt(0) == 64)
      // non-literal numHashes is rejected loudly
      val err = intercept[Exception] {
        spark.sql("SELECT minhash_signature(sh, CAST(size(sh) AS INT)) FROM mh_sql_in").collect()
      }
      assert(err.getMessage.contains("integer literal") ||
        Option(err.getCause).exists(_.getMessage.contains("integer literal")))
    }
}
