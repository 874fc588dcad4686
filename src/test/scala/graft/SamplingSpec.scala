package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Sampling

class SamplingSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def corpus(n: Int) = spark.range(n)
    .select(col("id").as("doc_id"),
      concat(lit("stratum_"), pmod(col("id"), lit(5))).as("lang"),
      (col("id") % 97 + 5).as("tokens"))

  describe("Sampling.hashSample") {
    it("is deterministic and partitioning-independent") {
      val df = corpus(2000)
      val a = Sampling.hashSample(df, Seq("doc_id"), 0.3)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val b = Sampling.hashSample(df.repartition(13), Seq("doc_id"), 0.3)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(a == b)
      assert(a.nonEmpty)
    }
    it("fraction is approximately honored and samples nest by fraction") {
      val df = corpus(5000)
      val small = Sampling.hashSample(df, Seq("doc_id"), 0.2)
        .select("doc_id").as[Long].collect().toSet
      val large = Sampling.hashSample(df, Seq("doc_id"), 0.5)
        .select("doc_id").as[Long].collect().toSet
      assert(small.subsetOf(large)) // nested: same seed, larger fraction
      assert(math.abs(small.size / 5000.0 - 0.2) < 0.03)
      assert(math.abs(large.size / 5000.0 - 0.5) < 0.03)
    }
    it("different seeds draw different samples") {
      val df = corpus(2000)
      val a = Sampling.hashSample(df, Seq("doc_id"), 0.3, seed = "a")
        .select("doc_id").as[Long].collect().toSet
      val b = Sampling.hashSample(df, Seq("doc_id"), 0.3, seed = "b")
        .select("doc_id").as[Long].collect().toSet
      assert(a != b)
    }
  }

  describe("Sampling.hashSampleMix") {
    it("applies per-stratum fractions; unlisted strata follow the default") {
      val df = corpus(5000)
      val out = Sampling.hashSampleMix(df, "lang",
        Map("stratum_0" -> 0.5, "stratum_1" -> 0.1), Seq("doc_id"))
      val counts = out.groupBy("lang").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(math.abs(counts("stratum_0") / 1000.0 - 0.5) < 0.06)
      assert(math.abs(counts("stratum_1") / 1000.0 - 0.1) < 0.06)
      assert(!counts.contains("stratum_2")) // default fraction 0 drops
      // fraction 1.0 keeps EVERY row (the "g" threshold edge)
      val all = Sampling.hashSampleMix(df, "lang",
        Map("stratum_3" -> 1.0), Seq("doc_id"))
      assert(all.count() == 1000)
    }
    it("each stratum's mix nests within the single-fraction hashSample") {
      val df = corpus(3000)
      val mix = Sampling.hashSampleMix(df, "lang",
        Map("stratum_2" -> 0.3), Seq("doc_id"))
        .select("doc_id").as[Long].collect().toSet
      val plain = Sampling.hashSample(df.filter(col("lang") === "stratum_2"),
        Seq("doc_id"), 0.3).select("doc_id").as[Long].collect().toSet
      assert(mix == plain)
    }
  }

  describe("Sampling.replicateByStratum") {
    it("replicates rows by stratum epochs with distinct copy tags") {
      val df = corpus(100)
      val out = Sampling.replicateByStratum(df, "lang",
        Map("stratum_0" -> 3, "stratum_1" -> 0)).cache()
      val counts = out.groupBy("lang").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(counts("stratum_0") == 60) // 20 docs x 3
      assert(!counts.contains("stratum_1")) // zero epochs drops
      assert(counts("stratum_2") == 20) // default 1
      val copies = out.filter(col("lang") === "stratum_0")
        .groupBy("doc_id").agg(countDistinct("copy").as("c"))
        .filter(col("c") =!= 3).count()
      assert(copies == 0)
      out.unpersist()
    }
  }

  describe("Sampling.stratifiedSample") {
    it("returns exactly K per stratum (all rows of smaller strata)") {
      // 5 strata x 400 rows, plus one tiny stratum of 7 rows
      val big = corpus(2000)
      val tiny = spark.range(7).select((col("id") + 100000).as("doc_id"),
        lit("tiny").as("lang"), lit(10L).as("tokens"))
      val out = Sampling.stratifiedSample(big.unionByName(tiny), "lang",
        perStratum = 50, keyCols = Seq("doc_id"))
      val counts = out.groupBy("lang").count().collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(counts("tiny") == 7)
      (0 until 5).foreach(i => assert(counts(s"stratum_$i") == 50))
    }
    it("matches the brute-force window-over-everything result exactly") {
      val df = corpus(1500)
      val got = Sampling.stratifiedSample(df, "lang", 40, Seq("doc_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(Sampling.hashRankHex("42", Seq(col("doc_id"))), col("doc_id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 40)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == want)
    }
    it("shortfall fallback still yields the exact result (threshold forced tiny via huge stratum count math)") {
      // a stratum of 1 row exercises the n < K edge; K > n keeps everything
      val df = Seq((1L, "only")).toDF("doc_id", "lang")
      val out = Sampling.stratifiedSample(df, "lang", 10, Seq("doc_id"))
      assert(out.count() == 1)
    }
  }

  describe("Sampling.packByBudget") {
    it("assigns shards by exclusive cumulative sum within deterministic buckets") {
      val df = corpus(800)
      val out = Sampling.packByBudget(df, "doc_id", "tokens",
        budget = 500L, numBuckets = 4).cache()
      // bucket is id mod numBuckets
      assert(out.filter(col("bucket") =!= pmod(col("doc_id"), lit(4))).count() == 0)
      // within a (bucket, shard), offsets start below budget and every
      // doc's start offset is < budget by construction
      assert(out.filter(col("offset") >= 500L || col("offset") < 0L).count() == 0)
      // shard ids reconstruct from a driver-side replay of one bucket
      // (global shard = local * numBuckets + bucket; bucket 0 → local * 4)
      val b0 = out.filter(col("bucket") === 0).orderBy("doc_id")
        .select("doc_id", "tokens", "shard").collect()
      var cum = 0L
      b0.foreach { r =>
        assert(r.getLong(2) == (cum / 500L) * 4L, s"doc ${r.getLong(0)}")
        cum += r.getLong(1)
      }
      out.unpersist()
    }
    it("is partitioning-independent") {
      val df = corpus(600)
      val a = Sampling.packByBudget(df, "doc_id", "tokens", 300L, 3)
        .select("doc_id", "shard", "offset").collect().map(_.toSeq).sortBy(_.toString)
      val b = Sampling.packByBudget(df.repartition(17), "doc_id", "tokens", 300L, 3)
        .select("doc_id", "shard", "offset").collect().map(_.toSeq).sortBy(_.toString)
      assert(a.toSeq == b.toSeq)
    }
  }

  describe("Sampling.temperatureMix") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // heavily skewed corpus: 10000 "en", 400 "de", 100 "fr"
    def skewed = (0L until 10500L).map { i =>
      val lang = if (i < 10000) "en" else if (i < 10400) "de" else "fr"
      (i, lang)
    }.toDF("doc_id", "lang")

    it("alpha < 1 flattens the mix toward the tail; totals land near the target") {
      val out = Sampling.temperatureMix(skewed, "lang", targetRows = 1000L, Seq("doc_id"))
      val byLang = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = byLang.values.sum
      assert(math.abs(total - 1000L) < 150, s"total $total far from target")
      // natural shares would be ~95%/4%/1%; sqrt-flattening lifts the tail
      val en = byLang("en").toDouble / total
      assert(en < 0.80, s"en share $en not flattened")
      assert(byLang("fr") > 50, s"fr kept only ${byLang("fr")} rows")
      // and a small stratum never exceeds its own size
      assert(byLang("fr") <= 100)
    }

    it("alpha = 1 reproduces the natural distribution's uniform fraction") {
      val out = Sampling.temperatureMix(skewed, "lang", targetRows = 1050L,
        Seq("doc_id"), alpha = 1.0)
      val byLang = out.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // every stratum keeps ~10% — shares match the corpus shares
      assert(math.abs(byLang("en") - 1000L) < 120)
      assert(byLang("de") < 80 && byLang("fr") < 30)
    }

    it("is deterministic and partitioning-independent") {
      val a = Sampling.temperatureMix(skewed.repartition(1), "lang", 500L, Seq("doc_id"))
      val b = Sampling.temperatureMix(skewed.repartition(17), "lang", 500L, Seq("doc_id"))
      assertSmallDataFrameEquality(a, b)
    }

    it("a NULL stratum is sampled like any other, not silently dropped") {
      val withNulls = (0L until 2000L)
        .map(i => (i, if (i % 2 == 0) null else "en"))
        .toDF("doc_id", "lang")
      val out = Sampling.temperatureMix(withNulls, "lang", 400L, Seq("doc_id"))
      val nullKept = out.filter(col("lang").isNull).count()
      val total = out.count()
      assert(nullKept > 100, s"null stratum kept only $nullKept rows")
      assert(math.abs(total - 400L) < 80, s"total $total far from target 400")
    }

    it("fraction thresholds clamp at the top of the rank space") {
      // f just below 1.0 rounds to 2^32, whose nine-digit hex would sort
      // BELOW most ranks — the clamp keeps it at ffffffff
      assert(Sampling.fractionThresholdHex(1.0 - 1e-12) == "ffffffff")
      assert(Sampling.fractionThresholdHex(1.0) == "g")
      assert(Sampling.fractionThresholdHex(0.5) == "80000000")
    }
  }
}
