package graft

import org.scalatest.funspec.AnyFunSpec

import graft.pipeline._

class PipelineSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup of 1
    (4L, "completely different content about machine learning and neural networks training"),
    (5L, "der hund und die katze sind in das haus und der garten ist schoen heute"),
    (6L, "le chat et le chien sont dans la maison et le jardin est beau")
  ).toDF("doc_id", "text")

  describe("Dedup.exact") {
    it("keeps the lowest-id survivor per text group") {
      val out = Dedup.exact(docs, Seq("text"), "doc_id")
      assert(out.count() == 5)
      assert(out.filter("doc_id = 2").count() == 0)
    }
  }

  describe("Dedup.minhashLshPairs") {
    it("finds exact and near duplicates, not unrelated docs") {
      val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L))) // identical
      assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
      assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
    }
    it("minhashDedup drops near-duplicates of lower ids") {
      val out = Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.5)
      val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && !ids.contains(2L))
      assert(ids.contains(4L) && ids.contains(5L) && ids.contains(6L))
    }
  }

  describe("Dedup.minhashDedupClustersBest") {
    it("keeps the highest-score doc per cluster, not the lowest id") {
      val rows = Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today", 10L),
        (2L, "the quick brown fox jumps over the lazy dog near the river bank today", 99L), // best
        (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday", 50L),
        (4L, "completely different content about machine learning and neural networks training", 1L)
      ).toDF("doc_id", "text", "score")
      val kept = Dedup.minhashDedupClustersBest(rows, "doc_id", "text", "score", 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(2L, 4L), s"got $kept")
    }
    it("ties break to the lowest id") {
      val rows = Seq(
        (7L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 5L),
        (9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", 5L)
      ).toDF("doc_id", "text", "score")
      val kept = Dedup.minhashDedupClustersBest(rows, "doc_id", "text", "score", 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(7L))
    }
  }

  describe("Dedup.minhashDedupAgainst") {
    it("drops new docs that near-duplicate the reference corpus, keeps the rest") {
      val ref = Seq(
        (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (101L, "der hund und die katze sind in das haus und der garten ist schoen heute")
      ).toDF("doc_id", "text")
      val fresh = Seq(
        (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of 100
        (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup of 100
        (3L, "completely different content about machine learning and neural networks training"),
        (4L, "le chat et le chien sont dans la maison et le jardin est beau")
      ).toDF("doc_id", "text")
      val kept = Dedup.minhashDedupAgainst(fresh, ref, "doc_id", "text", threshold = 0.5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(3L, 4L))
    }
    it("cross pairs never compare within a side and match exact jaccard semantics") {
      val a = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
      val b = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
      val pairs = Dedup.minhashCrossPairs(a, b, "doc_id", "text", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // both new docs pair with ref 9, but 1-2 (intra-new exact dups) never appear
      assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 9L), (2L, 9L)))
      assert(pairs.forall(_._3 == 1.0))
    }
  }

  describe("CollectListCapped") {
    it("matches collect_list under the cap and truncates at cap+1 over it") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graft.SparkBridge
      def capped(c: org.apache.spark.sql.Column, cap: Int) =
        SparkBridge.column(graft.functions.CollectListCapped(
          SparkBridge.expression(c), cap).toAggregateExpression())
      // groups of size 1..6 under cap 3: under-cap groups must agree with
      // stock collect_list element-for-element (sorted — gather order is
      // partition-dependent); over-cap groups stop at exactly cap+1 = 4
      val df = (1 to 6).flatMap(g => (1 to g).map(i => (g, i))).toDF("g", "x")
        .repartition(5)
      val out = df.groupBy($"g")
        .agg(sort_array(capped($"x", 3)).as("capped"),
          sort_array(collect_list($"x")).as("full"))
        .collect().map(r => (r.getInt(0), r.getSeq[Int](1), r.getSeq[Int](2))).toSeq
      out.foreach { case (g, cappedV, fullV) =>
        if (g <= 3) assert(cappedV == fullV, s"group $g diverged under cap")
        else assert(cappedV.length == 4, s"group $g buffered ${cappedV.length}, want cap+1")
      }
    }
  }

  describe("Dedup.connectedComponents") {
    it("closes transitive chains: A~B, B~C => one cluster, min-id label") {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("idA", "idB")
      val cc = Dedup.connectedComponents(pairs, "idA", "idB")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    }
    it("collapses a long path and a cycle to their minimum ids") {
      // 0-1-2-...-19 path (worst case for plain propagation: pointer jumping
      // must beat 20 rounds) plus a disjoint 3-cycle given in reverse order
      val path = (0L until 19L).map(i => (i, i + 1))
      val cycle = Seq((102L, 101L), (101L, 100L), (100L, 102L))
      val cc = Dedup.connectedComponents((path ++ cycle).toDF("idA", "idB"), "idA", "idB")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((0L to 19L).forall(cc(_) == 0L))
      assert(Seq(100L, 101L, 102L).forall(cc(_) == 100L))
    }
    it("driver and distributed tiers agree on the same graph") {
      // maxDriverEdges = 0 forces the iterative DataFrame tier; the default
      // runs driver union-find — identical (id, cluster) output required
      val edges = (0L until 19L).map(i => (i, i + 1)) ++
        Seq((102L, 101L), (101L, 100L), (100L, 102L), (50L, 51L))
      val pairs = edges.toDF("idA", "idB")
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val driver = asMap(Dedup.connectedComponents(pairs, "idA", "idB"))
      val dist = asMap(Dedup.connectedComponents(pairs, "idA", "idB", maxDriverEdges = 0))
      assert(driver == dist)
      assert(driver(19L) == 0L && driver(102L) == 100L && driver(51L) == 50L)
    }
    it("minhashDedupClusters keeps exactly one survivor per transitive cluster") {
      // docs 1, 2, 3 chain transitively (1~2 exact, 1~3 near): the edge-wise
      // minhashDedup could keep 3 depending on pair direction; the cluster
      // closure must keep ONLY doc 1 of the three
      val out = Dedup.minhashDedupClusters(docs, "doc_id", "text", threshold = 0.5)
      val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
      assert(ids.contains(4L) && ids.contains(5L) && ids.contains(6L))
    }
  }

  describe("Dedup.duplicatedSpans / dedupSubstrings") {
    import org.apache.spark.sql.functions._
    // doc 10 and 11 share an 8-token opening passage; 12 repeats its own
    // 8-token phrase twice; 13 is unrelated; 14 is a verbatim copy of 13
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta unique ten tail"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta other eleven tail"),
      (12L, "one two three four five six seven eight one two three four five six seven eight"),
      (13L, "isolated words with no overlap whatsoever here today friend"),
      (14L, "isolated words with no overlap whatsoever here today friend")
    ).toDF("doc_id", "text")

    it("flags non-canonical occurrences only; canonical copy survives") {
      val spans = Dedup.duplicatedSpans(corpus, "doc_id", "text", k = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // doc 10 holds the canonical (smallest doc_id) opening — not flagged;
      // doc 11's copy of the 8-token opening is span [1,8]
      assert(!spans.exists(_._1 == 10L))
      assert(spans.contains((11L, 1L, 8L)))
      // doc 12's SECOND occurrence of its phrase starts at token 9
      assert(spans.contains((12L, 9L, 16L)))
      // doc 14 is a verbatim copy: every window flagged, one merged span
      assert(spans.contains((14L, 1L, 9L)))
      assert(!spans.exists(_._1 == 13L))
    }

    it("rewrite drops covered tokens, keeps everything else, one row per doc") {
      val out = Dedup.dedupSubstrings(corpus, "doc_id", "text", k = 8)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(out.size == 5)
      assert(out(10L) == "alpha beta gamma delta epsilon zeta eta theta unique ten tail")
      assert(out(11L) == "other eleven tail")
      assert(out(12L) == "one two three four five six seven eight")
      assert(out(13L) == "isolated words with no overlap whatsoever here today friend")
      assert(out(14L) == "") // fully covered verbatim copy
    }

    it("docs shorter than k tokens have no windows and pass through") {
      val tiny = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
      assert(Dedup.duplicatedSpans(tiny, "doc_id", "text", k = 8).count() == 0)
      val out = Dedup.dedupSubstrings(tiny, "doc_id", "text", k = 8)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(out == Map(1L -> "a b c", 2L -> "a b c"))
    }

    it("positionalShingles keeps order and duplicates; short input is empty") {
      val df = Seq(
        (1L, Seq("x", "y", "x", "y")),
        (2L, Seq("x", "y"))
      ).toDF("id", "toks")
        .select($"id", Dedup.positionalShingles($"toks", 3).as("h"))
      val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(rows(1L).length == 2) // "x y x", "y x y" — order-preserving
      assert(rows(1L).distinct.length == 2)
      assert(rows(2L).isEmpty)
      // parity with the set-semantics sibling's hashing: same gram text
      // hashed by xxhash64 seed 42 — verify against the SQL function
      val expect = Seq(("x y x"), ("y x y")).toDF("g")
        .select(expr("xxhash64(g)")).collect().map(_.getLong(0)).toSeq
      assert(rows(1L) == expect)
    }
  }

  describe("Dedup.simhash") {
    it("identical docs share a simhash; near dups are close in hamming") {
      val hashes = Dedup.simhash(docs, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hashes(1L) == hashes(2L))
      val hamming13 = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
      val hamming14 = java.lang.Long.bitCount(hashes(1L) ^ hashes(4L))
      assert(hamming13 < hamming14)
    }
    it("simhashPairs returns pairs within the hamming budget") {
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0))
    }
  }

  describe("Dedup.ngramJaccardPairs") {
    it("scores exact dup 1.0 and near dup below") {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs((1L, 2L)) == 1.0)
      assert(pairs.get((1L, 3L)).exists(j => j > 0.3 && j < 1.0))
    }

    it("maxGramDf caps hot-gram candidate explosion, keeps distinct near-dups") {
      // 40 docs made ENTIRELY of one boilerplate gram (df=40 > cap) — without
      // the cap they alone produce 780 pairs; with it, none. Two docs sharing
      // distinctive grams (df=2 <= cap) must still be found with exact jaccard.
      val boiler = (100L until 140L).map(i => (i, "all rights reserved"))
      val dups = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"))
      val df = (boiler ++ dups).toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        threshold = 0.5, maxGramDf = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs == Map((1L, 2L) -> 1.0))
    }

    it("hot-ambiguous pairs verify exactly: upper-bound survivors are re-checked") {
      // When BOTH docs carry hot (capped) grams, their shared-kept-gram
      // count is only a LOWER bound of the true intersection — the prune
      // keeps every pair whose UPPER bound (cnt + min(hotA, hotB)) clears
      // the threshold, and exact shingle verification decides. Calibrated
      // construction (5-token shared prefix + a distinct hot 3-token tail
      // per doc): A-B share 3 kept grams of 6 each; upper bound 4 gives
      // upper-J 4/8 = 0.5 — EXACTLY at threshold, so the pair survives the
      // prune — but the true jaccard is 3/9 = 0.33, so exact verification
      // must reject it. A-C are identical docs: jaccard 1.0 through the
      // same verified branch.
      val prefix = "alpha beta gamma delta epsilon"
      val h1 = "pp qq rr"
      val h2 = "xx yy zz"
      val filler = (100L until 140L).map(i => (i, h1)) ++
        (200L until 240L).map(i => (i, h2))
      val df = (filler ++ Seq(
        (1L, s"$prefix $h1"), (2L, s"$prefix $h2"), (3L, s"$prefix $h1")))
        .toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        threshold = 0.5, maxGramDf = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(pairs.get((1L, 3L)).contains(1.0), s"got $pairs")
      assert(!pairs.contains((1L, 2L)), s"hot-ambiguous pair not re-verified: $pairs")
      assert(!pairs.contains((2L, 3L)), s"hot-ambiguous pair not re-verified: $pairs")
    }
  }

  describe("Dedup.embeddingCosinePairs") {
    it("finds high-cosine vector pairs via hyperplane LSH") {
      val vecs = Seq(
        (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
        (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)),  // near dup of 1
        (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
        (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
      ).toDF("vec_id", "embedding")
      val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", threshold = 0.95)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.contains((1L, 2L)))
      assert(pairs.length == 1)
    }
  }

  describe("Dedup.contaminationReport") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    it("scores full, zero and partial gram overlap exactly") {
      val eval = Seq(
        (10L, "alpha beta gamma delta"),        // grams all in train doc 1
        (11L, "xx yy zz ww"),                   // no overlap
        (12L, "beta gamma delta qq rr"))        // 1 of 3 grams hit
      .toDF("doc_id", "text")
      val out = Dedup.contaminationReport(train, eval, "doc_id", "text", n = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(out(10L) == ((2L, 2L, 1.0)))
      assert(out(11L) == ((2L, 0L, 0.0)))
      assert(out(12L)._1 == 3L && out(12L)._2 == 1L)
      assert(math.abs(out(12L)._3 - 0.333333) < 1e-9)
    }
    it("unhinted large eval side still answers (shuffle fallback)") {
      val eval = Seq((10L, "alpha beta gamma")).toDF("doc_id", "text")
      val out = Dedup.contaminationReport(train, eval, "doc_id", "text", n = 3,
        broadcastEval = Some(false))
      assert(out.collect().head.getDouble(3) == 1.0)
    }
  }

  describe("TextAnalysis.hashedLinearScore") {
    it("constant weights give the constant; empty text gives the bias") {
      val in = Seq((1L, "some words here"), (2L, "...")).toDF("doc_id", "text")
      val out = in.select($"doc_id",
        TextAnalysis.hashedLinearScore($"text", Array.fill(16)(2.0), bias = 0.5).as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out(1L) == 2.5) // bias + mean(2.0)
      assert(out(2L) == 0.5) // no tokens -> bias only
    }
    it("is deterministic and sensitive to the weight table") {
      val in = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
      def score(w: Array[Double]) = in.select(
        TextAnalysis.hashedLinearScore($"text", w).as("s")).first().getDouble(0)
      val w1 = Array.tabulate(64)(i => ((i * 37 + 11) % 21 - 10).toDouble)
      assert(score(w1) == score(w1))
      // shifting every bucket weight by +1 shifts the mean by exactly +1
      assert(score(w1.map(_ + 1.0)) == score(w1) + 1.0)
    }
  }

  describe("VectorExpressions (codegen ≡ higher-order-function composition)") {
    import org.apache.spark.sql.functions.{aggregate => fAggregate, transform => fTransform, _}
    // adversarial vectors: plain, negatives, a null element, a length
    // mismatch against the 4-dim codebook, and a NULL vector
    val vecs = Seq(
      (1L, Array(1.0, 2.0, 3.0, 4.0)),
      (2L, Array(-0.5, 0.25, 0.0, 8.0)),
      (3L, Array(1.0, 2.0, 3.0)) // short
    ).toDF("id", "v")
      .union(Seq((4L, null.asInstanceOf[Array[Double]])).toDF("id", "v"))
      .withColumn("vn", when($"id" === 2, array(lit(1.0), lit(null).cast("double"),
        lit(2.0), lit(3.0))).otherwise($"v"))

    it("DotProduct matches aggregate(zip_with(_*_)) bit-for-bit incl. nulls") {
      val hof = fAggregate(zip_with($"v", $"vn", _ * _), lit(0.0d), _ + _)
      val bad = vecs.select(Similarity.dot($"v", $"vn").as("a"), hof.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0)
    }
    it("BucketRank matches the boundary fold incl. null, NaN and duplicates") {
      val bs = Array(10.0, 20.0, 20.0, 30.0, Double.NaN)
      val vals = Seq(Some(-5.0), Some(10.0), Some(25.0), Some(1e9),
        None, Some(Double.NaN)).toDF("v")
      val foldExpr = fAggregate(lit(bs), lit(0L),
        (acc, b) => acc + when($"v" >= b, 1L).otherwise(0L))
      val rankExpr = org.apache.spark.sql.graft.SparkBridge.column(
        graft.functions.BucketRank(
          org.apache.spark.sql.graft.SparkBridge.expression($"v"), bs))
      val bad = vals.select(rankExpr.as("a"), foldExpr.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0)
    }

    it("HashedShingles matches the composed shingle pipeline exactly") {
      val texts = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "one two"),          // fewer tokens than n=3: single whole gram
        (3L, "solo"),             // one token
        (4L, ""),                 // tokenize("") -> [""] -> hash of ""
        (5L, "a b a b a b a b")   // repeated grams: distinct order matters
      ).toDF("id", "text")
      for (n <- Seq(2, 3, 5)) {
        val bad = texts.select(
          Dedup.shinglesFromTokens(Dedup.tokenize($"text"), n).as("a"),
          Dedup.shinglesFromTokensComposed(Dedup.tokenize($"text"), n).as("b"))
          .filter(not($"a" <=> $"b")).count()
        assert(bad == 0, s"n=$n diverged")
      }
      // empty token ARRAY (not [""]): both forms yield empty
      val emptyArr = Seq(Tuple1(Array.empty[String])).toDF("t")
      assert(emptyArr.select(Dedup.shinglesFromTokens($"t", 3).as("a"))
        .first().getSeq[Long](0).isEmpty)
      assert(emptyArr.select(Dedup.shinglesFromTokensComposed($"t", 3).as("a"))
        .first().getSeq[Long](0).isEmpty)
    }

    it("SquaredDistances matches the transform/zip_with fold incl. nulls") {
      val cb = Seq(Array(0.0, 0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0, 4.0))
      val hof = fTransform(
        array(cb.map(cw => lit(cw)): _*),
        cw => fAggregate(zip_with($"vn", cw, (x, y) => (x - y) * (x - y)), lit(0.0d), _ + _))
      // documented divergence (same as MinHashSignature): NULL INPUT yields
      // NULL where the composition yields an array of nulls — strictly
      // safer; everything else (incl. null elements, length mismatch) must
      // match bit-for-bit
      val bad = vecs.filter($"vn".isNotNull)
        .select(Similarity.sqDistsTo($"vn", cb).as("a"), hof.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(bad == 0)
      assert(vecs.filter($"vn".isNull)
        .select(Similarity.sqDistsTo($"vn", cb)).first().isNullAt(0))
    }
  }

  describe("TextAnalysis.distinctTokenSketches") {
    import org.apache.spark.sql.functions._
    it("per-stratum HLL estimates track exact counts and union without rescans") {
      val corpus = (1 to 400).map { i =>
        (i.toLong, s"src${i % 4}", s"tok${i % 97} tok${i % 53} shared common")
      }.toDF("doc_id", "source", "text")
      val sk = TextAnalysis.distinctTokenSketches(corpus, "source", "text")
      assert(sk.count() == 4)
      val exact = corpus.select($"source",
        explode(split(TextAnalysis.normalized($"text"), " ")).as("t"))
        .groupBy("source").agg(countDistinct("t").as("exact"))
      val bad = sk.join(exact, "source")
        .filter(abs($"estimate" - $"exact").cast("double") / $"exact" > 0.05).count()
      assert(bad == 0)
      val unionEst = TextAnalysis.unionSketchEstimate(sk)
      val globalExact = corpus.select(
        explode(split(TextAnalysis.normalized($"text"), " ")).as("t")).distinct().count()
      assert(math.abs(unionEst - globalExact).toDouble / globalExact <= 0.05,
        s"union estimate $unionEst vs exact $globalExact")
    }
  }

  describe("TextAnalysis.frequentItems (Misra–Gries)") {
    import org.apache.spark.sql.functions._

    it("exact regime: capacity ≥ distinct ⇒ counts equal groupBy, max_error 0") {
      // skewed multiset across 8 partitions to force real partial merges
      val items = (1 to 400).map(i => s"w${i % 7}") ++ (1 to 50).map(_ => "hot")
      val df = items.toDF("w").repartition(8)
      val out = df.agg(TextAnalysis.frequentItems($"w", 16).as("fi"))
        .select(explode($"fi.items").as("x"), $"fi.max_error")
        .select($"x.item", $"x.count", $"max_error")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(out.forall(_._3 == 0L))
      assert(out.map(t => t._1 -> t._2).toMap == exact)
      // deterministic output order: count desc, item asc
      val counts = out.map(_._2)
      assert(counts.sameElements(counts.sortBy(-_)))
    }

    it("approximate regime: bounds hold and heavy items survive") {
      // 1000 × "heavy" drowned in 2000 distinct singletons, capacity 8
      val items = (1 to 1000).map(_ => "heavy") ++ (1 to 2000).map(i => s"rare$i")
      val df = items.toDF("w").repartition(16)
      val row = df.agg(TextAnalysis.frequentItems($"w", 8).as("fi"))
        .select($"fi.items", $"fi.max_error").head()
      val maxErr = row.getLong(1)
      val got = row.getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // reported ≤ true ≤ reported + max_error, for every reported item
      got.foreach { case (k, c) =>
        assert(c <= exact(k) && exact(k) <= c + maxErr, s"$k: $c vs ${exact(k)} ± $maxErr")
      }
      // presence guarantee: heavy's true count exceeds the error mass
      assert(maxErr < 1000L)
      assert(got.contains("heavy"))
    }

    it("merge rule keeps the summary within capacity under adversarial splits") {
      val items = (1 to 5000).map(i => s"k${i % 300}")
      val out = items.toDF("w").repartition(32)
        .agg(TextAnalysis.frequentItems($"w", 10).as("fi"))
        .select(size($"fi.items")).head().getInt(0)
      assert(out <= 10)
    }
  }

  describe("TextAnalysis.bm25Lite") {
    it("ranks term-bearing docs above term-free docs, rare terms above common") {
      val corpus = Seq(
        (1L, "spark merge window spark spark"),   // heavy on the rare term
        (2L, "merge window table row column"),    // common terms only
        (3L, "apple banana cherry date fig"),     // no query terms
        (4L, "spark table"),                      // one rare hit, short doc
        (5L, "merge merge merge merge merge")     // common-term spam
      ).toDF("doc_id", "text")
      val scores = TextAnalysis.bm25Lite(corpus, "doc_id", "text", Seq("spark", "merge"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(scores(3L) == 0.0)                    // no terms, zero score
      assert(scores(1L) > scores(2L))              // rare term dominates
      assert(scores(4L) > scores(3L))
      assert(scores.values.forall(_ >= 0.0))
      // deterministic across invocations
      val again = TextAnalysis.bm25Lite(corpus, "doc_id", "text", Seq("spark", "merge"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(again == scores)
    }
    it("rejects an empty query") {
      val e = intercept[IllegalArgumentException] {
        TextAnalysis.bm25Lite(docs, "doc_id", "text", Nil)
      }
      assert(e.getMessage.contains("queryTerms"))
    }
  }

  describe("Dedup.semanticDedup") {
    // two well-separated directions, each with a near-identical follower —
    // SemDeDup must drop the followers (higher ids) regardless of how
    // k-means splits the space
    val semVecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f, 0.0f)),   // near dup of 1
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.01f, 0.999f, 0.0f)),   // near dup of 3
      (5L, Array(0.7f, 0.0f, 0.7f, 0.1f))       // between, not a dup of either
    ).toDF("vec_id", "embedding")

    it("drops within-cluster near-dups, keeps lowest ids and distinct rows") {
      val ids = Dedup.semanticDedup(semVecs, "vec_id", "embedding",
        threshold = 0.99, numClusters = 2, kmeansIterations = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && ids.contains(3L) && ids.contains(5L))
      assert(!ids.contains(2L) && !ids.contains(4L))
    }
    it("single-cluster config equals the global anti-join rule") {
      val one = Dedup.semanticDedup(semVecs, "vec_id", "embedding",
        threshold = 0.99, numClusters = 1, kmeansIterations = 1)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(one == Set(1L, 3L, 5L))
    }
    it("fails loudly when a cluster exceeds maxClusterSize") {
      val e = intercept[IllegalArgumentException] {
        Dedup.semanticDedup(semVecs, "vec_id", "embedding",
          threshold = 0.99, numClusters = 1, maxClusterSize = 2)
      }
      assert(e.getMessage.contains("maxClusterSize"))
    }
  }

  describe("Similarity") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter("vec_id < 3")

    it("bruteForceTopK rank 1 is the query itself (cosine 1.0)") {
      val top = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
      val rank1 = top.filter("rank = 1").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rank1 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
      assert(top.count() == 15)
    }

    it("pqEncode emits m codes per row bounded by the codebook size") {
      val cbs = Similarity.pqCodebooks(corpus, "vec_id", "embedding", m = 4, ksub = 8)
      assert(cbs.size == 4 && cbs.forall(_.size == 8))
      val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cbs)
        .collect().map(r => r.getSeq[Int](1))
      assert(codes.length == 50)
      assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    }

    it("pqTopK with exact rerank finds the identical vector at rank 1") {
      val top = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5,
        m = 4, ksub = 8, rerank = 25)
      val rank1 = top.filter("rank = 1").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rank1 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
      assert(top.count() == 15)
    }

    it("pqTopKFromIndex equals the in-memory pqTopK at the same parameters") {
      val dir = java.nio.file.Files.createTempDirectory("pqidx").resolve("i").toString
      Similarity.buildPqIndex(spark, corpus, "vec_id", "embedding", dir, m = 4, ksub = 8)
      val fromIndex = Similarity.pqTopKFromIndex(spark, dir, queries,
        "vec_id", "embedding", 5, rerank = 25)
        .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
      val direct = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5,
        m = 4, ksub = 8, rerank = 25)
        .select("query_id", "rank", "corpus_id").collect().map(_.toSeq).toSet
      assert(fromIndex == direct)
    }

    it("pqTopK rerank recall dominates raw ADC ranking") {
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
        .select("query_id", "corpus_id")
      def recall(rr: Int): Double = {
        val approx = Similarity.pqTopK(corpus, queries, "vec_id", "embedding", 5,
          m = 4, ksub = 8, rerank = rr).select("query_id", "corpus_id")
        exact.join(approx, Seq("query_id", "corpus_id"), "left_semi").count().toDouble / 15
      }
      val r0 = recall(0)
      val r25 = recall(25)
      assert(r25 >= r0)
      assert(r25 >= 0.8, s"rerank=25 recall $r25 below 0.8")
    }

    it("kmeansCentroids trains on a bounded deterministic sample") {
      import org.apache.spark.sql.functions.{col, xxhash64}
      // centroids from (full corpus, sampleSize=12) must equal centroids from
      // the 12-row sample trained unbounded — proving the build touches ONLY
      // the sample (and that the sample itself is deterministic)
      val sample = corpus
        .orderBy(xxhash64(col("vec_id").cast("string")), col("vec_id")).limit(12)
      val bounded = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", 4, sampleSize = 12)
      val unboundedOnSample =
        Similarity.kmeansCentroids(sample, "vec_id", "embedding", 4, sampleSize = Int.MaxValue)
      assert(bounded.map(_._1) == unboundedOnSample.map(_._1))
      bounded.zip(unboundedOnSample).foreach { case ((_, a), (_, b)) =>
        assert(a.sameElements(b))
      }
    }

    it("ivfTopK achieves decent recall against brute force") {
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
        .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5,
        numCentroids = 8, nProbe = 4)
        .select("query_id", "corpus_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      assert(recall >= 0.5, s"IVF recall $recall too low")
    }

    it("persisted IVF index probe equals the in-memory ivfTopK and prunes unprobed cells") {
      val idx = tmpTableDir("ivf_idx")
      Similarity.buildIvfIndex(spark, corpus, "vec_id", "embedding", idx,
        numCentroids = 8)
      val fromIndex = Similarity.ivfTopKFromIndex(spark, idx, queries,
        "vec_id", "embedding", 5, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      val inMemory = Similarity.ivfTopK(corpus, queries, "vec_id", "embedding", 5,
        numCentroids = 8, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(fromIndex == inMemory)
      // the cells table is partitioned by cell, so a single-cell probe
      // keeps strictly fewer files than the table holds (file-level pruning)
      val cellsTable = graft.tables.GraftTable.forPath(spark, s"$idx/cells")
      val someCell = cellsTable.toDF.select("cell").first().getInt(0)
      val m = graft.operators.GraftHelpers.getNumShuffleFiles(
        cellsTable, s"cell = $someCell")
      assert(m("overall").asInstanceOf[Int].toLong < m("totalFilesInTable").asInstanceOf[Long],
        s"single-cell probe did not prune: $m")
    }

    it("appendToIvfIndex assigns new vectors to existing cells; probes see them") {
      val idx = tmpTableDir("ivf_append")
      Similarity.buildIvfIndex(spark, corpus.filter("vec_id < 40"),
        "vec_id", "embedding", idx, numCentroids = 8)
      val before = Similarity.ivfTopKFromIndex(spark, idx, queries,
        "vec_id", "embedding", 5, nProbe = 8)
        .select("corpus_id").as[Long].collect().toSet
      Similarity.appendToIvfIndex(spark, idx,
        corpus.filter("vec_id >= 40"), "vec_id", "embedding")
      val after = Similarity.ivfTopKFromIndex(spark, idx, queries,
        "vec_id", "embedding", 5, nProbe = 8)
      // full index + full probe = exact: must equal brute force over ALL 50
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      val got = after.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
      assert(got == exact)
      assert(before.nonEmpty)
      // an appended vector queried against the index finds ITSELF at rank 1
      // — direct proof the probe sees post-append rows
      val self = Similarity.ivfTopKFromIndex(spark, idx,
        corpus.filter("vec_id = 45"), "vec_id", "embedding", 1, nProbe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(self == Seq((45L, 45L)))
    }

    it("a query set past the broadcast threshold joins WITHOUT the hint") {
      // threshold forced below the query count: no broadcast HINT may be
      // injected (an unconditional hint would OOM executors once the query
      // side is cluster-sized). Size-based auto-broadcast is disabled for
      // the assertion — at scale the optimizer's own stats make that call,
      // and hint-free is exactly what leaves it free to.
      val manyQueries = corpus.filter("vec_id < 20")
      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val unhinted = Similarity.ivfTopK(corpus, manyQueries, "vec_id", "embedding", 3,
          numCentroids = 4, nProbe = 4, broadcastThreshold = 5)
        assert(!planOf(unhinted).contains("BroadcastHashJoin"),
          "query side above the threshold must not be hint-broadcast")
        val hinted = Similarity.ivfTopK(corpus, manyQueries, "vec_id", "embedding", 3,
          numCentroids = 4, nProbe = 4, broadcastQueries = Some(true))
        assert(planOf(hinted).contains("BroadcastHashJoin"),
          "explicit broadcast flag must hint the join")
        val a = unhinted.select("query_id", "rank", "corpus_id").collect().toSet
        val b = hinted.select("query_id", "rank", "corpus_id").collect().toSet
        assert(a == b, "join strategy changed results")
        assert(a.nonEmpty)

        // brute force: the oversized query set runs a plain cartesian pass
        val bf = Similarity.bruteForceTopK(corpus, manyQueries, "vec_id", "embedding", 3,
          broadcastThreshold = 5)
        assert(planOf(bf).contains("CartesianProduct"),
          s"expected an unhinted cartesian pass:\n${planOf(bf)}")
        assert(bf.filter("rank = 1").count() == 20)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    }
  }

  describe("TextAnalysis") {
    it("langId picks the dominant marker language") {
      val out = TextAnalysis.enrich(docs, "text")
        .select("doc_id", "lang_pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out(1L) == "en" && out(5L) == "de" && out(6L) == "fr")
    }
    it("quality score is in [0,1] and higher for real text than noise") {
      val noisy = Seq((1L, "a b c!!! ??? !!!"), (2L,
        "The study of language is a window into the human mind and it was always the case that words are the tools of thought."))
        .toDF("doc_id", "text")
      val q = noisy.select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(q.values.forall(v => v >= 0 && v <= 1))
      assert(q(2L) > q(1L))
    }
    it("fingerprint ignores case/punctuation/whitespace differences") {
      val variants = Seq((1L, "Hello,   World!"), (2L, "hello world"), (3L, "HELLO ... world"))
        .toDF("doc_id", "text")
      val fps = variants.select(TextAnalysis.fingerprint($"text")).distinct().count()
      assert(fps == 1)
    }
    it("repetitionSignals computes exact fractions and gates repeated docs") {
      val in = Seq(
        (1L, "aa aa bb"), // 3 words, 2 distinct, top 2/3
        (2L, "one two three four five six seven eight nine ten"))
        .toDF("doc_id", "text")
      val out = TextAnalysis.repetitionSignals(in, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      val r1 = out(1L)
      assert(r1.getLong(1) == 3 && r1.getLong(2) == 2)
      assert(math.abs(r1.getDouble(3) - 0.333333) < 1e-9) // dup_word_frac
      assert(math.abs(r1.getDouble(4) - 0.666667) < 1e-9) // top_word_frac
      assert(r1.getDouble(5) == 2.0)                      // mean_word_len
      assert(!r1.getBoolean(6))                           // gated: top word dominates
      assert(out(2L).getBoolean(6))                       // all-distinct doc passes
    }
    it("redactPii replaces emails/ips/phones with placeholders and counts them") {
      val in = Seq(
        (1L, "mail bob.smith+x@corp.example.org server 192.168.1.200 call +1-555-0142 done"),
        (2L, "no pii here at all"))
        .toDF("doc_id", "text")
      val out = TextAnalysis.redactPii(in, "text")
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(out(1L).getString(1) == "mail [EMAIL] server [IP] call [PHONE] done")
      assert(out(1L).getLong(2) == 1 && out(1L).getLong(3) == 1 && out(1L).getLong(4) == 1)
      assert(out(2L).getString(1) == "no pii here at all")
      assert(out(2L).getLong(2) == 0 && out(2L).getLong(3) == 0 && out(2L).getLong(4) == 0)
    }
    it("vocabStats ranks by frequency with deterministic alphabetic ties") {
      val in = Seq(
        (1L, "apple banana apple"),
        (2L, "apple cherry banana"))
        .toDF("doc_id", "text")
      val rows = TextAnalysis.vocabStats(in, "doc_id", "text", 10)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        (1, "apple", 3L, 2L),   // 3 occurrences across 2 docs
        (2, "banana", 2L, 2L),
        (3, "cherry", 1L, 1L)))
    }
  }

  describe("Dedup under skew") {
    // the 100 TB claim, demonstrated rather than asserted: one boilerplate
    // passage shared by a large fraction of the corpus is the classic
    // scale-killer of inverted-index candidate generation (~df² pair rows
    // from a single hot gram). The hot-gram cap must keep the shuffled row
    // count bounded WITHOUT changing the reported pairs (verification
    // stays exact). Shuffle rows are an exact, deterministic metric — no
    // timing flakiness.
    it("hot-gram cap bounds d4 candidate shuffle on a 30% boilerplate corpus") {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

      val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
      val docs = (0 until 1000).map { i =>
        val unique = s"doc $i " + (1 to 12).map(j => s"w${i}x$j").mkString(" ")
        (i.toLong, if (i < 300) s"$unique $boiler" else unique)
      }
      val dups = (0 until 10).map(i => (10000L + i, docs(i)._2 + " tail"))
      val corpus = (docs ++ dups).toDF("doc_id", "text")

      def shuffledRows(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Long) = {
        // materialize THIS DataFrame (not a derived projection), so the
        // walked plan is the one whose shuffle metrics were populated
        val pairs = df.collect()
          .map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB"))).toSet
        def walk(p: SparkPlan): Long = {
          val self = p match {
            case s: ShuffleExchangeLike =>
              s.metrics.get("shuffleRecordsWritten").orElse(s.metrics.get("numOutputRows"))
                .map(_.value).getOrElse(0L)
            case _ => 0L
          }
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec => Seq(q.plan)
            case o => o.children
          }
          self + kids.map(walk).sum
        }
        (pairs, walk(df.queryExecution.executedPlan))
      }

      val (cappedPairs, cappedRows) = shuffledRows(
        Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5, maxGramDf = 50))
      val (uncappedPairs, uncappedRows) = shuffledRows(
        Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5,
          maxGramDf = Int.MaxValue))

      val expected = (0 until 10).map(i => (i.toLong, 10000L + i)).toSet
      // exact verification makes the cap invisible in the OUTPUT...
      assert(cappedPairs == expected, s"capped run pairs: $cappedPairs")
      assert(uncappedPairs == expected, s"uncapped run pairs: $uncappedPairs")
      // ...while candidate generation shrinks by the boilerplate df² factor.
      // Margin recalibrated from 3× to 2× when pair generation was fused
      // into one postings shuffle: the uncapped baseline no longer pays the
      // two-sided self-join, so the cap's RELATIVE saving shrank while its
      // absolute df²-pair saving (the thing this spec pins) is unchanged.
      assert(cappedRows * 2 < uncappedRows,
        s"hot-gram cap did not bound the shuffle: capped=$cappedRows uncapped=$uncappedRows")
    }

    it("minhash stays complete when one bucket holds a 6% identical-doc clump") {
      // identical docs all collapse into ONE LSH bucket per band — the
      // quadratic OUTPUT is inherent (they really are duplicates); the
      // design point is that candidates travel as bare id pairs and the
      // full pair set still comes out exactly
      val uniq = (0 until 940).map(i => (i.toLong, s"unique doc $i " + (1 to 15).map(j => s"u${i}y$j").mkString(" ")))
      val clump = (0 until 60).map(i => (5000L + i, "identical boilerplate body " * 8))
      val pairs = Dedup.minhashLshPairs((uniq ++ clump).toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.9)
        .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        a <- 0 until 60; b <- (a + 1) until 60
      } yield (5000L + a, 5000L + b)).toSet
      assert(pairs == expected, s"got ${pairs.size} pairs, expected ${expected.size}")
    }
  }

  describe("Multimodal") {
    it("extractFeatures produces deterministic features with real plumbing") {
      val ids = (1L to 20L).toDF("id")
      val assets = Multimodal.synthesizeAssets(spark, ids, "id")
      assert(assets.schema("payload").dataType.typeName == "binary")
      val f1 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
      val f2 = Multimodal.extractFeatures(Multimodal.rebalanceForDecode(assets, 7))
        .orderBy("asset_id").collect()
      assert(f1.length == 20)
      // determinism across partitionings
      assert(f1.map(_.getLong(3)).toSeq == f2.map(_.getLong(3)).toSeq)
      val feat = f1.head.getSeq[Float](4)
      assert(feat.length == Multimodal.FeatureDim)
      val modalities = f1.map(_.getString(1)).toSet
      assert(modalities.subsetOf(Set("image", "audio", "video")))
    }

    it("decodes real PNG payloads with ImageIO: dims, mean luma, histogram") {
      // encode → decode round trip matches the synthesis formulas exactly
      val ids = (0L to 60L).toDF("id")
      val assets = Multimodal.synthesizePngAssets(spark, ids, "id")
      val feats = Multimodal.extractImageFeatures(Multimodal.rebalanceForDecode(assets, 5))
        .orderBy("asset_id").collect()
      assert(feats.length == 61)
      feats.foreach { r =>
        val id = r.getLong(0)
        assert(r.getInt(2) == (8 + id % 25).toInt, s"width mismatch for id=$id")
        assert(r.getInt(3) == (8 + (id / 25) % 25).toInt, s"height mismatch for id=$id")
        assert(r.getInt(4) == (id % 256).toInt, s"mean luma mismatch for id=$id")
        assert(r.getLong(1) > 0L)
      }
      // a solid-gray image's histogram is a single full bin at its luma level
      val hist = Multimodal.imageHistogramFeature(Multimodal.encodeGrayPng(10, 10, 200)).get
      assert(hist((200 * Multimodal.FeatureDim) / 256) == 1.0f)
      assert(hist.sum == 1.0f)
      // an image-labeled but undecodable payload falls back to the stub,
      // and extractImageFeatures reports nulls for it
      assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
      val junk = Seq((99L, "image", Array[Byte](1, 2, 3))).toDF("asset_id", "modality", "payload")
      val jf = Multimodal.extractImageFeatures(junk).head()
      assert(jf.isNullAt(2) && jf.isNullAt(3) && jf.isNullAt(4))
      val stubbed = Multimodal.extractFeatures(junk).head().getSeq[Float](4)
      assert(stubbed == Multimodal.decodeStub(Array[Byte](1, 2, 3)).toSeq)
    }

    it("decodes real WAV payloads with AudioSystem: rate, frames, exact RMS") {
      // encode → decode round trip matches the synthesis formulas exactly
      val ids = (0L to 60L).toDF("id")
      val assets = Multimodal.synthesizeWavAssets(spark, ids, "id")
      val feats = Multimodal.extractAudioFeatures(Multimodal.rebalanceForDecode(assets, 5))
        .orderBy("asset_id").collect()
      assert(feats.length == 61)
      feats.foreach { r =>
        val id = r.getLong(0)
        val n = (50 + id % 100).toInt
        assert(r.getLong(1) == 44L + 2L * n, s"byte size mismatch for id=$id")
        assert(r.getInt(2) == (8000 + (id % 5) * 2000).toInt, s"rate mismatch for id=$id")
        assert(r.getInt(3) == 1, s"channels mismatch for id=$id")
        assert(r.getLong(4) == n.toLong, s"frames mismatch for id=$id")
        assert(r.getInt(5) == (id % 1000 + 1).toInt, s"rms mismatch for id=$id")
      }
      // direct decode of a hand-built wave: RMS of a constant ±a square wave
      // is exactly a; truncating frames changes the decoded frame count
      val wav = Multimodal.encodeWavPcm16(16000, Array.tabulate(80)(j =>
        if (j % 2 == 0) 1234.toShort else (-1234).toShort))
      val info = Multimodal.decodeAudio(wav).get
      assert(info == Multimodal.AudioInfo(16000, 1, 16, 80L, 1234))
      // an amplitude histogram of that wave is one full bin
      val hist = Multimodal.audioHistogramFeature(wav).get
      assert(hist((1234 * Multimodal.FeatureDim) / 32768) == 1.0f)
      assert(hist.sum == 1.0f)
      // an audio-labeled but undecodable payload: nulls from the typed
      // extractor, stub feature from the generic one
      assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9)).isEmpty)
      val junk = Seq((99L, "audio", Array[Byte](9, 9, 9))).toDF("asset_id", "modality", "payload")
      val jf = Multimodal.extractAudioFeatures(junk).head()
      assert(jf.isNullAt(2) && jf.isNullAt(3) && jf.isNullAt(4) && jf.isNullAt(5))
      val stubbed = Multimodal.extractFeatures(junk).head().getSeq[Float](4)
      assert(stubbed == Multimodal.decodeStub(Array[Byte](9, 9, 9)).toSeq)
    }

    it("crafted RIFF chunk sizes decode to None, never crash the task") {
      // untrusted corpus bytes: sizes near 2^31/2^32 must not wrap the
      // chunk cursor into negative offsets (AIOOBE) — the walk runs in Long
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      for (evil <- Seq(0x7FFFFFF6L, 0x80000000L, 0xFFFFFFF8L)) {
        val p = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
          "JUNK".getBytes ++ le32(evil) ++ Array.fill(32)(0.toByte)
        assert(Multimodal.decodeAudio(p).isEmpty)
        assert(Multimodal.audioDHash(p).isEmpty)
        assert(Multimodal.audioHistogramFeature(p).isEmpty)
      }
      // truncated data chunk: declared length clamps to the payload, same
      // as a stream decoder hitting EOF
      val wav = Multimodal.encodeWavPcm16(8000, Array.tabulate(100)(_ => 7.toShort))
      val truncated = wav.take(wav.length - 40)
      val info = Multimodal.decodeAudio(truncated).get
      assert(info.numFrames == 80L && info.rmsAmp == 7)
    }

    it("non-plain WAV format tags defer to the stream decoder (parity, not rejection)") {
      // WAVE_FORMAT_EXTENSIBLE PCM16: the fast path must hand it to
      // AudioSystem, matching whatever the pre-fast-path gate did on this
      // JDK (accept as PCM_SIGNED or reject) — never unilaterally None
      def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val samples = Array.tabulate(80)(j => if (j % 2 == 0) 500 else -500)
      val data = samples.flatMap(s => le16(s & 0xffff))
      val pcmGuid = Array(0x01, 0x00, 0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
        0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71).map(_.toByte)
      val fmt = le16(0xFFFE) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16) ++ le16(22) ++ le16(16) ++ le32(4) ++ pcmGuid
      val body = "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
        "data".getBytes ++ le32(data.length) ++ data
      val ext = "RIFF".getBytes ++ le32(4 + body.length) ++ "WAVE".getBytes ++ body
      val viaStream =
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(ext))
          try {
            val f = ais.getFormat
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              (f.getSampleSizeInBits == 8 || f.getSampleSizeInBits == 16)
          } finally ais.close()
        } catch { case _: Exception => false }
      val decoded = Multimodal.decodeAudio(ext)
      assert(decoded.isDefined == viaStream,
        s"fast path must mirror the stream gate on extensible WAV (stream=$viaStream)")
      decoded.foreach(i => assert(i.rmsAmp == 500 && i.sampleRate == 8000))
    }

    it("decodes real uncompressed-DIB AVI payloads: dims, fps, per-frame luma, sampling") {
      // encode → decode round trip matches the synthesis formulas exactly
      val ids = (0L to 60L).toDF("id")
      val assets = Multimodal.synthesizeAviAssets(spark, ids, "id")
      val feats = Multimodal.extractVideoFeatures(Multimodal.rebalanceForDecode(assets, 5))
        .orderBy("asset_id", "frame_idx").collect()
      feats.foreach { r =>
        val id = r.getLong(0)
        val f = r.getInt(5)
        assert(r.getInt(1) == (16 + (id % 4) * 8).toInt, s"width mismatch for id=$id")
        assert(r.getInt(2) == (8 + (id % 5) * 4).toInt, s"height mismatch for id=$id")
        assert(r.getInt(3) == (5 + id % 10).toInt, s"fps mismatch for id=$id")
        assert(r.getInt(4) == (2 + id % 6).toInt, s"frames mismatch for id=$id")
        assert(r.getInt(6) == ((id * 31 + f * 17) % 256).toInt, s"luma mismatch id=$id f=$f")
      }
      assert(feats.length == (0L to 60L).map(id => (2 + id % 6).toInt).sum)
      // frame SAMPLING: stride 2 keeps exactly the even frame indices
      val sampled = Multimodal.extractVideoFeatures(assets, frameStride = 2)
        .select("frame_idx").collect().map(_.getInt(0))
      assert(sampled.nonEmpty && sampled.forall(_ % 2 == 0))
      // direct decode of a hand-built AVI: the RIFF walk sees every chunk
      val avi = Multimodal.encodeGrayAvi(20, 10, 12, Array(5, 250, 128))
      val info = Multimodal.decodeVideo(avi).get
      assert(info.width == 20 && info.height == 10 && info.fps == 12)
      assert(info.numFrames == 3 && info.frameLumas.toSeq == Seq(5, 250, 128))
      // the per-frame histogram is one full bin per uniform frame
      val hist = Multimodal.videoHistogramFeature(avi).get
      assert(hist((5 * Multimodal.FeatureDim) / 256) > 0 && math.abs(hist.sum - 1.0f) < 1e-6)
      // a video-labeled but undecodable payload: null row from the typed
      // extractor, stub feature from the generic one
      assert(Multimodal.decodeVideo(Array[Byte](9, 9, 9, 9)).isEmpty)
      val junkV = Seq((99L, "video", Array[Byte](9, 9, 9, 9))).toDF("asset_id", "modality", "payload")
      val jv = Multimodal.extractVideoFeatures(junkV).head()
      assert(jv.isNullAt(1) && jv.isNullAt(5) && jv.isNullAt(6))
      val stubbedV = Multimodal.extractFeatures(junkV).head().getSeq[Float](4)
      assert(stubbedV == Multimodal.decodeStub(Array[Byte](9, 9, 9, 9)).toSeq)
    }
  }
}
