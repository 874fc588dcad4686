package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec

import graft.operators.{GraftHelpers, GraftMerge}
import graft.pipeline.Dedup
import graft.tables.GraftTable

/** Property-based invariants for the merge engine and dedup operators
  * (SURVEY §7.5: merge correctness corners are the top risk).
  */
class PropertySpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** Deterministic generator sampling (no scalatest-scalacheck bridge in the
    * offline cache): N seeded draws per property.
    */
  private def forAll[T](g: Gen[T], n: Int = 5)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(30)
    (0 until n).foreach { i =>
      g.apply(params, Seed(42L + i)).foreach(body)
    }
  }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(body: (A, B) => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(30)
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(params, Seed(42L + i))
        b <- gb.apply(params, Seed(1042L + i))
      } body(a, b)
    }
  }
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowsGen: Gen[List[(Int, String, Int)]] = Gen.nonEmptyListOf(for {
    id <- Gen.choose(0, 20)
    name <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.choose(0, 100)
  } yield (id, name, v))

  it("merge upsert ≡ unionByName + dropDuplicates on key (unique-key inputs)") {
    forAll2(rowsGen, rowsGen) { (baseRows, srcRows) =>
      val base = baseRows.distinctBy(_._1)
      val src = srcRows.distinctBy(_._1)
      whenever(base.nonEmpty && src.nonEmpty) {
        val t = GraftTable.create(spark, tmpTableDir("prop-merge"),
          base.toDF("id", "name", "v"))
        GraftMerge(t, "tgt")
          .merge(src.toDF("id", "name", "v"), "tgt.id = s.id", Some("s"))
          .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        val expected = (src ++ base.filterNot(b => src.exists(_._1 == b._1)))
        assertSmallDataFrameEquality(t.toDF, expected.toDF("id", "name", "v"))
      }
    }
  }

  it("killDuplicateRecords leaves only singleton keys; removeDuplicateRecords keeps min pk") {
    forAll(rowsGen) { rows =>
      val data = rows.zipWithIndex.map { case ((id, name, v), i) => (i, name, v) }
      whenever(data.nonEmpty) {
        // M3: no surviving (name,v) group had >1 member
        val t1 = GraftTable.create(spark, tmpTableDir("prop-m3"), data.toDF("pk", "name", "v"))
        GraftHelpers.killDuplicateRecords(t1, Seq("name", "v"))
        val expected1 = data.groupBy(r => (r._2, r._3)).filter(_._2.size == 1)
          .values.flatten.toList
        assertSmallDataFrameEquality(t1.toDF, expected1.toDF("pk", "name", "v"))

        // M4: survivor per (name,v) group is the min pk
        val t2 = GraftTable.create(spark, tmpTableDir("prop-m4"), data.toDF("pk", "name", "v"))
        GraftHelpers.removeDuplicateRecords(t2, "pk", Seq("name", "v"))
        val expected2 = data.groupBy(r => (r._2, r._3))
          .values.map(_.minBy(_._1)).toList
        assertSmallDataFrameEquality(t2.toDF, expected2.toDF("pk", "name", "v"))
      }
    }
  }

  it("minhash LSH pairs are a subset of all-pairs exact jaccard; exact pairs superset check") {
    val texts = Gen.listOfN(8, Gen.oneOf(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different words entirely here now",
      "sphinx of black quartz judge my vow today"))
    forAll(texts) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val lsh = Dedup.minhashLshPairs(df, "doc_id", "text",
            numHashes = 64, bands = 32, threshold = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text", threshold = 0.5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // LSH candidates are exact-verified → no false positives
        assert(lsh.subsetOf(exact))
        // identical docs always collide in every band → found for sure
        val identicalPairs = for {
          i <- docs.indices; j <- docs.indices
          if i < j && docs(i) == docs(j)
        } yield (i.toLong, j.toLong)
        identicalPairs.foreach(p => assert(lsh.contains(p)))
      }
    }
  }

  it("SCD2 invariant: exactly one current row per key; closed rows have end_time") {
    import java.sql.Timestamp
    val updatesGen = Gen.nonEmptyListOf(for {
      pk <- Gen.choose(0, 8)
      attr <- Gen.oneOf("x", "y", "z")
    } yield (pk, attr))
    forAll(updatesGen) { ups =>
      val updates = ups.distinctBy(_._1)
      whenever(updates.nonEmpty) {
        val base = (0 to 5).map(i =>
          (i, "x", true, Timestamp.valueOf("2020-01-01 00:00:00"), None: Option[Timestamp]))
        val t = GraftTable.create(spark, tmpTableDir("prop-scd"),
          base.toDF("pk", "attr", "is_current", "effective_time", "end_time").repartition(1))
        graft.operators.Type2Scd.upsert(t,
          updates.map { case (pk, a) => (pk, a, Timestamp.valueOf("2024-01-01 00:00:00")) }
            .toDF("pk", "attr", "effective_time"),
          "pk", Seq("attr"))
        val out = t.toDF.collect()
        val currents = out.filter(_.getBoolean(2))
        // one current row per key
        assert(currents.map(_.getInt(0)).distinct.length == currents.length)
        // every key present is covered by a current row
        assert(currents.map(_.getInt(0)).toSet ==
          out.map(_.getInt(0)).toSet)
        // non-current rows must carry an end_time
        assert(out.filterNot(_.getBoolean(2)).forall(!_.isNullAt(4)))
      }
    }
  }

  it("connected components: both tiers agree with a reference union-find on random graphs") {
    // random edge lists over a small id space (forces collisions, chains and
    // cycles): the distributed min-label/pointer-jump tier must equal the
    // driver union-find tier, which must equal an in-spec reference fold
    val edgesGen = for {
      n <- Gen.choose(1, 40)
      edges <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 25L); b <- Gen.choose(0L, 25L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    forAll(edgesGen, n = 5) { edges =>
      val pairs = edges.toDF("idA", "idB")
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val driver = asMap(Dedup.connectedComponents(pairs, "idA", "idB"))
      val dist = asMap(Dedup.connectedComponents(pairs, "idA", "idB", maxDriverEdges = 0))
      // reference: naive repeated relaxation to fixpoint
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var lab = nodes.map(v => v -> v).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lab(a), lab(b))
          if (lab(a) != m) { lab += a -> m; changed = true }
          if (lab(b) != m) { lab += b -> m; changed = true }
        }
      }
      assert(driver == lab, s"driver tier diverged on $edges")
      assert(dist == lab, s"distributed tier diverged on $edges")
    }
  }

  it("sink idempotence: any interleaving of epoch replays appends each epoch once") {
    // random sequences over epochs 0..4 where each epoch appears 1-3 times
    // (Spark's at-least-once foreachBatch contract, arbitrarily reordered
    // zombie replays included): the table must converge to exactly one
    // append per DISTINCT epoch that arrived while it was the frontier —
    // an epoch older than the committed watermark is always skipped
    val seqGen = Gen.listOfN(12, Gen.choose(0, 4))
    forAll(seqGen, n = 4) { arrivals =>
      val dir = tmpTableDir("prop_sink")
      GraftTable.create(spark, dir, Seq((-1, "seed")).toDF("id", "name"))
      var frontier = -1L // highest epoch committed so far (the model)
      val expected = scala.collection.mutable.Set(-1)
      arrivals.foreach { e =>
        val rows = Seq((e, s"epoch$e")).toDF("id", "name")
        val committed = graft.streaming.GraftSink.writeEpoch(dir, "prop")(rows, e.toLong)
        // model: monotone watermark — only a strictly newer epoch lands
        if (e > frontier) { assert(committed.isDefined); frontier = e; expected += e }
        else assert(committed.isEmpty, s"epoch $e re-appended at frontier $frontier")
      }
      val got = GraftTable.forPath(spark, dir).toDF
        .collect().map(_.getInt(0)).toSeq
      assert(got.sorted == expected.toSeq.sorted,
        s"arrivals=$arrivals got=$got expected=$expected")
    }
  }

  it("stratifiedSample equals the brute-force window on random skewed strata") {
    import org.apache.spark.sql.functions._
    // random strata sizes (1..400, heavily skewed) and random K: the
    // two-phase prefilter+trim must equal a plain window over everything
    val cfgGen = for {
      sizes <- Gen.nonEmptyListOf(Gen.choose(1, 400)).map(_.take(6))
      k <- Gen.choose(1, 120)
    } yield (sizes, k)
    forAll(cfgGen, n = 4) { case (sizes, k) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s.toLong * 100000 + i, s"stratum_$s"))
      }
      val df = rows.toDF("doc_id", "lang")
      val got = graft.pipeline.Sampling.stratifiedSample(df, "lang", k, Seq("doc_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        .orderBy(graft.pipeline.Sampling.hashRankHex("42", Seq(col("doc_id"))), col("doc_id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got == want, s"sizes=$sizes k=$k")
    }
  }

  it("packByBudget invariants: offsets in [0, budget), contiguous per-bucket shards, no cross-bucket collisions") {
    import org.apache.spark.sql.functions._
    val cfgGen = for {
      n <- Gen.choose(10, 400)
      budget <- Gen.choose(50L, 2000L)
      buckets <- Gen.choose(1, 7)
    } yield (n, budget, buckets)
    forAll(cfgGen, n = 4) { case (n, budget, buckets) =>
      val df = spark.range(n).select(col("id").as("doc_id"),
        (pmod(col("id") * 37 + 11, lit(97)) + 1).as("tokens"))
      val out = graft.pipeline.Sampling
        .packByBudget(df, "doc_id", "tokens", budget, buckets)
        .select("doc_id", "tokens", "bucket", "shard", "offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(out.forall(r => r._5 >= 0 && r._5 < budget), s"offset out of range")
      // shard→bucket is a function (interleaved ids cannot collide)
      out.groupBy(_._4).foreach { case (_, rs) =>
        assert(rs.map(_._3).distinct.length == 1)
      }
      // driver replay per bucket
      out.groupBy(_._3).foreach { case (b, rs) =>
        var cum = 0L
        rs.sortBy(_._1).foreach { r =>
          assert(r._4 == (cum / budget) * buckets + b, s"doc ${r._1}")
          assert(r._5 == cum % budget)
          cum += r._2
        }
      }
    }
  }
}
