package graft

import org.scalatest.funspec.AnyFunSpec

import graft.tables._

class FileSkippingSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** 24 rows split into 6 files of 4 consecutive ids each. */
  private def rangedTable(prefix: String): GraftTable = {
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try {
      GraftTable.create(spark, tmpTableDir(prefix),
        (1 to 24).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "amount")
          .orderBy("id").coalesce(1))
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  private def survivors(t: GraftTable, cond: String): Int = {
    val cls = FileSkipping.classify(spark, t.toDF, cond)
    FileSkipping.filesMatching(t.snapshot, cls.all,
      Some(BloomIndex.ProbeContext(spark, t.path))).size
  }

  it("skips files outside the predicate's min/max range") {
    val t = rangedTable("fs-range")
    assert(t.snapshot.numFiles == 6)
    assert(survivors(t, "id = 5") == 1)
    assert(survivors(t, "id >= 10 AND id <= 12") == 1)
    assert(survivors(t, "id > 20") == 1)
    assert(survivors(t, "id <= 4") == 1)
    assert(survivors(t, "id >= 5 AND id <= 13") == 3)
  }

  it("float stats round-trip exactly: boundary equality keeps the matching file") {
    // float min/max are Float.toString strings; parsing them as DOUBLE
    // ("0.1".toDouble) differs from the widened float literal (0.1f) in
    // the 17th digit — a file whose every row IS the value used to read
    // lit > max and get pruned, silently returning nothing
    val t = GraftTable.create(spark, tmpTableDir("fs-float"),
      spark.sql("SELECT id, CAST(0.1 AS FLOAT) AS f FROM range(4) " +
        "UNION ALL SELECT id + 10, CAST(7.3 AS FLOAT) FROM range(4)")
        .repartition(2, $"f"))
    assert(t.snapshot.numFiles == 2)
    assert(survivors(t, "f = CAST(0.1 AS FLOAT)") == 1)
    assert(t.toDF.where("f = CAST(0.1 AS FLOAT)").count() == 4)
    assert(survivors(t, "f >= CAST(7.3 AS FLOAT)") == 1)
  }

  it("decimal interval contradiction is exact, never a lossy double") {
    // two distinct DECIMAL(38,20) bounds that round to ONE double used to
    // declare a false-empty interval and prune every file
    val t = GraftTable.create(spark, tmpTableDir("fs-decimal"),
      spark.sql("SELECT id, CAST('0.12345678901234567892' AS DECIMAL(38,20)) AS d " +
        "FROM range(4)").coalesce(1))
    val cond = "d > CAST('0.12345678901234567890' AS DECIMAL(38,20)) AND " +
      "d < CAST('0.12345678901234567895' AS DECIMAL(38,20))"
    assert(survivors(t, cond) == 1, "exact decimal bounds must not contradict")
    assert(t.toDF.where(cond).count() == 4)
    // a GENUINE decimal contradiction still selects zero files
    assert(survivors(t, "d > CAST(2 AS DECIMAL(38,20)) AND " +
      "d < CAST(1 AS DECIMAL(38,20))") == 0)
  }

  it("timestamp partition values keep microsecond precision") {
    // toEpochMilli * 1000 truncated sub-millisecond fractions: an equality
    // on the exact micro value pruned the matching partition wholesale
    val t = GraftTable.create(spark, tmpTableDir("fs-ts-micro"),
      spark.sql("SELECT id, TIMESTAMP'2024-01-01 00:00:00.000001' AS ts FROM range(3) " +
        "UNION ALL SELECT id + 10, TIMESTAMP'2024-06-01 12:00:00.5' AS ts FROM range(3)"),
      partitionColumns = Seq("ts"))
    assert(survivors(t, "ts = TIMESTAMP'2024-01-01 00:00:00.000001'") >= 1)
    assert(t.toDF.where("ts = TIMESTAMP'2024-01-01 00:00:00.000001'").count() == 3)
    assert(survivors(t, "ts = TIMESTAMP'2024-06-01 12:00:00.5'") >= 1)
    // and a non-matching micro value still prunes everything
    assert(survivors(t, "ts = TIMESTAMP'2024-01-01 00:00:00.000002'") == 0)
  }

  it("bloom columns resolve by PHYSICAL path under column mapping") {
    // DROP then re-ADD mints a fresh physical name: the bloom build must
    // read and key by the physical spelling (what probes look up), not
    // resolve the logical name against the physical layout — which found
    // nothing (feature silently dead) or, worse, a retired physical name
    val dir = tmpTableDir("fs-bloom-mapped")
    val t = GraftTable.create(spark, dir,
      (0 until 64).map(i => (i.toLong, s"k$i")).toDF("id", "name").coalesce(1))
    t.dropColumns(Seq("name"))
    GraftTable.forPath(spark, dir).addColumns(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("name",
          org.apache.spark.sql.types.StringType))))
    val t2 = GraftTable.forPath(spark, dir)
    assert(graft.tables.ColumnMapping.physicalPath(
      t2.snapshot.schema, Seq("name")).exists(_ != "name"),
      "fixture needs a re-minted physical name")
    t2.setProperties(Map(BloomIndex.ColumnsProperty -> "name"))
    GraftTable.forPath(spark, dir).append(
      (0 until 64).map(i => (i.toLong + 100, s"v$i")).toDF("id", "name").repartition(4))
    val t3 = GraftTable.forPath(spark, dir)
    // the fresh files carry sidecar references keyed by the physical path
    val stamped = t3.snapshot.files.filter(f =>
      GraftLog.parseStats(f.stats).exists(_.bloomSidecar.isDefined))
    assert(stamped.size == 4, s"bloom must be built for the mapped column: $stamped")
    // an absent-but-in-range key prunes the bloom-indexed files; a present
    // key reads its rows correctly
    assert(survivors(t3, "name = 'nosuchvalue'") <= 2) // the 1 unindexed file + fp
    assert(t3.toDF.where("name = 'v7'").count() == 1)
  }

  it("contradictory ranges select zero files") {
    val t = rangedTable("fs-contra")
    assert(survivors(t, "id <= 10 AND id >= 12") == 0)
    assert(survivors(t, "id = 3 AND id = 17") == 0)
  }

  it("string and double stats prune too") {
    val t = rangedTable("fs-types")
    assert(survivors(t, "amount > 30.0") == 1)  // only ids 21..24 (31.5..36); 17..20 maxes at exactly 30.0
    assert(survivors(t, "amount >= 30.0") == 2) // inclusive bound re-admits the 17..20 file
    assert(survivors(t, "name = 'zzz'") <= 6)  // strings: conservative but valid
  }

  it("unknown predicates and unresolved columns never prune") {
    val t = rangedTable("fs-unknown")
    assert(survivors(t, "id % 2 = 0") == 6)      // arithmetic: not prunable
    val cls = FileSkipping.classify(spark, t.toDF, "bogus = 1 AND id <= 4")
    assert(cls.unresolvedColumns == Seq("bogus"))
    // the resolved conjunct still prunes
    assert(FileSkipping.filesMatching(t.snapshot, cls.all,
      Some(BloomIndex.ProbeContext(spark, t.path))).size == 1)
  }

  it("NESTED struct-leaf stats prune files; renames keep the physical stats keys") {
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    val t = try {
      GraftTable.create(spark, tmpTableDir("fs-nested"),
        spark.range(1, 25).selectExpr("id",
          "named_struct('a', CAST(id AS INT), 'b', concat('n', id)) AS s")
          .orderBy("id").coalesce(1))
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    assert(t.snapshot.numFiles == 6)
    // struct-leaf paths carry per-file min/max — predicates on them prune
    // exactly like top-level columns (the 100 TB point: a filter on s.a
    // reads 1 file, not 30,000)
    assert(survivors(t, "s.a = 5") == 1)
    assert(survivors(t, "s.a >= 10 AND s.a <= 12") == 1)
    assert(survivors(t, "s.a > 20") == 1)
    assert(survivors(t, "id <= 4 AND s.a <= 4") == 1)
    assert(survivors(t, "s.a IS NULL") == 0) // leaf nullCount: no nulls anywhere
    assert(survivors(t, "s.b = 'zzz'") <= 6) // strings: conservative but valid
    // the SCAN path itself prunes: a nested-predicate read touches ONE file
    import org.apache.spark.sql.functions.input_file_name
    assert(t.toDF.where("s.a = 5").select(input_file_name()).distinct().count() == 1)
    // rename the nested field: stats keys are PHYSICAL, so pruning keeps
    // working under the new logical name (and never misreads old keys)
    GraftTable.forPath(spark, t.path).renameColumn("s.a", "a2")
    val t2 = GraftTable.forPath(spark, t.path)
    assert(survivors(t2, "s.a2 = 5") == 1)
    assert(t2.toDF.where("s.a2 = 21").select(input_file_name()).distinct().count() == 1)
    // contradictory nested ranges select ZERO files without touching stats
    assert(survivors(t2, "s.a2 <= 10 AND s.a2 >= 12") == 0)
  }

  it("OPTIMIZE ZORDER clusters NESTED leaves; the curve skips on both dimensions") {
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "64")
    val t = try {
      GraftTable.create(spark, tmpTableDir("fs-znested"),
        spark.range(0, 1024).selectExpr("id",
          "named_struct('x', CAST(id % 32 AS INT), 'y', CAST(id DIV 32 AS INT)) AS p")
          .orderBy("id").coalesce(1))
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    assert(t.snapshot.numFiles == 16)
    // row-ordered by id, p.x cycles 0..31 per file → no pruning possible
    assert(survivors(t, "p.x = 3") == 16)
    graft.operators.TableOps.zorder(t, Seq("p.x", "p.y"), numFiles = Some(16))
    val z = GraftTable.forPath(spark, t.path)
    // the z-curve gives usable locality on BOTH nested dimensions
    assert(survivors(z, "p.x = 3") <= 8)
    assert(survivors(z, "p.y = 3") <= 8)
    // values survived the rewrite byte-exactly
    assert(z.toDF.selectExpr("sum(p.x)", "sum(p.y)").head.toSeq ==
      Seq(1024L / 32 * (0 until 32).sum, 32L * (0 until 32).sum))
  }

  it("bloom indexes probe NESTED leaves (dotted graft.bloom.columns paths)") {
    // even keys round-robin across 8 files: range stats keep all 8 for any
    // equality on the NESTED key — only the bloom prunes
    val t = GraftTable.create(spark, tmpTableDir("bloom-nested"),
      spark.range(0, 2048).selectExpr("id * 2 AS k", "concat('v', id) AS v")
        .selectExpr("named_struct('k', CAST(k AS INT), 'v', v) AS s").repartition(8),
      properties = Map(
        graft.tables.BloomIndex.ColumnsProperty -> "s.k",
        graft.tables.BloomIndex.BitsProperty -> (1 << 16).toString))
    assert(t.snapshot.files.size == 8)
    assert(t.snapshot.files.forall(f =>
      GraftLog.parseStats(f.stats).exists(_.bloomSidecar.nonEmpty)))
    // existing nested key: survives and reads; absent-but-in-range: pruned
    val kept = survivors(t, "s.k = 1000")
    assert(kept >= 1 && kept <= 3, s"s.k=1000 scanned $kept of 8")
    assert(t.toDF.where("s.k = 1000").count() == 1)
    assert(survivors(t, "s.k = 1001") <= 1) // odd = absent; fp may keep one
    assert(survivors(t, "s.k >= 0") == 8)   // ranges untouched by blooms
  }

  it("partition-value pruning works without row-group stats") {
    val df = Seq((1, "US"), (2, "DE"), (3, "FR")).toDF("id", "country")
    val t = GraftTable.create(spark, tmpTableDir("fs-part"), df, partitionColumns = Seq("country"))
    assert(survivors(t, "country = 'US'") == 1)
    assert(survivors(t, "country IN ('US', 'DE')") == 2)
    assert(survivors(t, "country = 'JP'") == 0)
  }

  it("nested stats leaves are capped; top-level primitives always indexed") {
    val wide = (0 until 40).map(i => s"'f$i', CAST(id AS INT)").mkString(", ")
    val t = GraftTable.create(spark, tmpTableDir("fs-statscap"),
      spark.range(8).selectExpr("id", s"named_struct($wide) AS s"))
    val st = GraftLog.parseStats(t.snapshot.files.head.stats).get
    val nested = st.minValues.keys.filter(_.contains('.'))
    assert(nested.size == graft.tables.ParquetStats.MaxNestedStatsLeaves,
      s"expected capped nested stats, got ${nested.size}")
    assert(st.minValues.contains("id")) // top-level always indexed
    // queries on un-indexed leaves stay correct (no stats = no prune)
    assert(t.toDF.where("s.f39 >= 0").count() == 8)
  }

  it("graft.dataSkippingStatsColumns aims the stats budget at chosen leaves") {
    // default walk order spends the 32-leaf nested budget on s.f0..s.f31 —
    // the property re-aims it: a configured DEEP leaf gets stats while the
    // unconfigured earlier leaves yield their slots
    val struct = (0 until 40).map(i => s"'f$i', CAST(id + $i AS INT)").mkString(", ")
    val t = GraftTable.create(spark, tmpTableDir("fs-statscols"),
      spark.range(1, 9).selectExpr("id", s"named_struct($struct) AS s").coalesce(1),
      properties = Map(ParquetStats.StatsColumnsProperty -> "s.f39, id"))
    val st = GraftLog.parseStats(t.snapshot.files.head.stats).get
    assert(st.minValues.contains("s.f39")) // the configured deep leaf IS indexed
    assert(st.minValues.contains("id"))
    assert(!st.minValues.contains("s.f0")) // early walk-order leaves yield
    assert(!st.minValues.contains("s.f1"))
    assert(st.minValues.keySet == Set("s.f39", "id"),
      s"exactly the configured columns, got ${st.minValues.keySet}")
    // numRecords is always harvested; un-indexed leaves stay correct-unpruned
    assert(st.numRecords == 8)
    assert(t.toDF.where("s.f0 >= 0").count() == 8)
    // a configured STRUCT prefix indexes its struct-only leaves (capped)
    val t2 = GraftTable.create(spark, tmpTableDir("fs-statscols2"),
      spark.range(1, 9).selectExpr("id", s"named_struct($struct) AS s").coalesce(1),
      properties = Map(ParquetStats.StatsColumnsProperty -> "s"))
    val st2 = GraftLog.parseStats(t2.snapshot.files.head.stats).get
    assert(st2.minValues.contains("s.f0") &&
      st2.minValues.count(_._1.startsWith("s.")) == ParquetStats.MaxNestedStatsLeaves)
    assert(!st2.minValues.contains("id")) // top-level not listed → not indexed
    // renaming/dropping a column the property references refuses loudly
    val e = intercept[Exception] { t.renameColumn("s.f39", "renamed") }
    assert(e.getMessage.contains(ParquetStats.StatsColumnsProperty), e.getMessage)
  }

  it("OR, != and LIKE-prefix predicates prune") {
    val t = rangedTable("fs-or") // ids 1..24 in 6 files of 4; names n1..n24
    // OR: each disjunct pins its own file
    assert(survivors(t, "id = 2 OR id = 23") == 2)
    assert(survivors(t, "(id >= 5 AND id <= 7) OR id = 21") == 2)
    assert(survivors(t, "id = 2 OR id = 200") == 1) // impossible side adds nothing
    // !=: prunes only a provably single-value file — partition dirs are
    // point ranges, so a partitioned table shows it exactly
    assert(survivors(t, "id != 3") == 6) // multi-value files all survive
    val u = GraftTable.create(spark, tmpTableDir("fs-ne"),
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "x"),
      partitionColumns = Seq("id"))
    assert(survivors(u, "id != 2") == 2)
    // LIKE 'p%': the match band is [p, next(p)) against string min/max
    assert(survivors(t, "name LIKE 'zz%'") == 0)
    assert(survivors(t, "name LIKE 'n1%'") == 4) // files holding n1/n1x strings
    assert(t.toDF.where("name LIKE 'n1%'").count() == 11) // n1, n10..n19
    // InSet — the optimizer's large-IN form, as the scan path pushes it
    val idAttr = t.toDF.queryExecution.analyzed.output.find(_.name == "id").get
    val inset = org.apache.spark.sql.catalyst.expressions.InSet(
      idAttr, (Seq(2, 23) ++ (100 to 150)).map(_.asInstanceOf[Any]).toSet)
    assert(FileSkipping.filesMatching(t.snapshot, Seq(inset), None).size == 2)
  }

  it("string stats compare in UTF-8 byte order, not UTF-16 (emoji vs U+E000)") {
    // U+E000 (private-use BMP, UTF-8 0xEE 80 80) vs U+1F600 (supplementary
    // plane, UTF-8 0xF0 9F 98 80 but UTF-16 surrogates 0xD83D 0xDE00):
    // UTF-16 sorts the emoji BELOW U+E000, UTF-8 (= Spark's and parquet's
    // string order) sorts it ABOVE. A UTF-16 comparator prunes files that
    // hold matches — silent lost rows on any emoji-bearing corpus.
    val priv = ""; val emoji = "😀"
    assert(Utf8Order.lt("doc-" + priv, "doc-" + emoji)) // byte order
    assert(("doc-" + priv).compareTo("doc-" + emoji) > 0) // the Java order we must NOT use
    val rows = (1 to 8).map(i =>
      (i, "doc-" + (if (i % 2 == 0) priv else emoji) + s"n$i", i % 2))
    val t = GraftTable.create(spark, tmpTableDir("fs-utf8"),
      rows.toDF("id", "name", "bucket").coalesce(1),
      partitionColumns = Seq("bucket"))
    assert(t.snapshot.numFiles == 2)
    // >= 'doc-' matches EVERY row in UTF-8 order; a UTF-16 comparator
    // would prune the emoji file (its max sorts below the literal there)
    assert(survivors(t, s"name >= 'doc-$priv'") == 2)
    assert(t.toDF.where(s"name >= 'doc-$priv'").count() == 8)
    // the private-use file IS prunable for an emoji lower bound
    assert(survivors(t, s"name >= 'doc-$emoji'") == 1)
    assert(t.toDF.where(s"name >= 'doc-$emoji'").count() == 4)
    // the LIKE band [p, next(p)) computed in UTF-8 byte space
    assert(survivors(t, s"name LIKE 'doc-$emoji%'") == 1)
    assert(t.toDF.where(s"name LIKE 'doc-$emoji%'").count() == 4)
    assert(survivors(t, s"name LIKE 'doc-$priv%'") == 1)
    // metadata-only max folds cross-file stats in byte order too: the real
    // max is an emoji string, and the answer comes from a LocalRelation
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.functions.{max, min}
    val agg = spark.read.format("graft").load(t.path)
      .agg(max(org.apache.spark.sql.functions.col("name")).as("mx"),
        min(org.apache.spark.sql.functions.col("name")).as("mn"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: LocalRelation => l }.nonEmpty,
      s"expected metadata-only fold:\n${agg.queryExecution.optimizedPlan}")
    val r = agg.first()
    assert(r.getString(0) == "doc-" + emoji + "n7") // byte-max, not UTF-16 max
    assert(r.getString(1) == "doc-" + priv + "n2")
    // Utf8Order's LIKE upper bound: valid-UTF-8 round trip on the emoji
    // prefix increments the final byte (0x80 -> 0x81 = U+1F601)
    val ub = Utf8Order.prefixUpperBound("doc-" + emoji).get
    assert(Utf8Order.ltBytes("doc-" + emoji + "zzz", ub))
    assert(!Utf8Order.ltBytes("doc-😁", ub)) // next emoji is outside the band
  }

  it("emoji partition VALUES round-trip through dirs and prune in UTF-8 order") {
    val priv = ""; val emoji = "😀"
    val t = GraftTable.create(spark, tmpTableDir("fs-emojipart"),
      Seq((1, emoji), (2, priv), (3, emoji), (4, priv)).toDF("id", "tag").coalesce(1),
      partitionColumns = Seq("tag"))
    assert(t.snapshot.numFiles == 2)
    // the dir-encoded partition value reads back exactly
    assert(t.toDF.where(s"tag = '$emoji'").count() == 2)
    assert(t.toDF.where(s"tag = '$priv'").count() == 2)
    // partition-range pruning compares in UTF-8: the emoji partition sorts
    // ABOVE U+E000 (a UTF-16 comparator would prune it here)
    assert(survivors(t, s"tag = '$emoji'") == 1)
    assert(survivors(t, s"tag >= '$priv'") == 2)
    assert(survivors(t, s"tag > '$emoji'") == 0)
  }

  it("IN, IsNull and IsNotNull are handled") {
    val t = rangedTable("fs-in")
    assert(survivors(t, "id IN (2, 3)") == 1)
    assert(survivors(t, "id IN (2, 23)") == 2)
    assert(survivors(t, "id IS NULL") == 0)     // nullCount = 0 everywhere
    assert(survivors(t, "id IS NOT NULL") == 6)
  }

  it("bloom indexes prune point lookups where min/max stats cannot") {
    // ids interleaved across 8 files (i % 8): every file's [min,max] spans
    // ~the whole key range, so range stats keep all 8 for any equality —
    // the bloom must prune to ~1 file (+ rare false positives)
    // EVEN ids only, round-robin across 8 files: every file's [min,max]
    // spans ~the whole range, and every ODD id is absent-but-in-range —
    // the case only a bloom can prune
    val rows = (0 until 4096 by 2).map(i => (i, s"name$i"))
    val t = GraftTable.create(spark, tmpTableDir("bloom"),
      rows.toDF("id", "name").repartition(8),
      properties = Map(
        graft.tables.BloomIndex.ColumnsProperty -> "id,name",
        graft.tables.BloomIndex.BitsProperty -> (1 << 16).toString))
    assert(t.snapshot.files.size == 8)
    // every file points at a bloom sidecar; the sidecar holds both columns
    assert(t.snapshot.files.forall(f =>
      GraftLog.parseStats(f.stats).exists(_.bloomSidecar.nonEmpty)))
    val sidecarId = GraftLog.parseStats(t.snapshot.files.head.stats).get.bloomSidecar.get
    val ctx = BloomIndex.ProbeContext(spark, t.path)
    Seq("id", "name").foreach { c =>
      val blooms = BloomIndex.sidecarBlooms(ctx, sidecarId, c)
      assert(blooms.size == 8, s"sidecar missing $c blooms: ${blooms.keySet}")
      assert(t.snapshot.files.forall(f => blooms.contains(f.path)))
    }

    // point lookups on an EXISTING key: the holding file survives, rows read correctly
    Seq(16, 1000, 4094).foreach { k =>
      val kept = survivors(t, s"id = $k")
      assert(kept >= 1 && kept <= 3, s"id=$k scanned $kept of 8 (bloom fp run?)")
      assert(t.toDF.filter($"id" === k).count() == 1)
    }
    // string column too
    assert(survivors(t, "name = 'name2046'") <= 3)
    // an ABSENT-but-IN-RANGE key: min/max keeps all 8, the bloom prunes
    assert(survivors(t, "id = 2047") <= 1) // fp may keep one
    assert(survivors(t, "name = 'nosuchname'") <= 1)
    // ranges are untouched by blooms (min/max semantics preserved)
    assert(survivors(t, "id >= 0 AND id <= 4095") == 8)
    // IN lists go through the same equality path
    assert(survivors(t, "id IN (16, 2047)") >= 1)

    // a table WITHOUT the property gets no blooms: the same in-range absent
    // key keeps all 8 files (nothing but a bloom can prune it)
    val plain = GraftTable.create(spark, tmpTableDir("bloom_off"),
      rows.toDF("id", "name").repartition(8))
    assert(plain.snapshot.files.forall(f =>
      GraftLog.parseStats(f.stats).forall(s => s.bloom.isEmpty && s.bloomSidecar.isEmpty)))
    assert(survivors(plain, "id = 2047") == 8)

    // a schema-merging append WITHOUT the indexed column must not fail the
    // commit: the new file just has no bloom for it (probes keep it).
    // The id column is branded NOT NULL by its bare-Int create frame —
    // relax it first, since the narrow append's rows read null there.
    t.setColumnNullability("id", nullable = true)
    t.append(Seq(("only-extra", 1)).toDF("name", "extra"))
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.toDF.filter($"name" === "only-extra").count() == 1)
    // the old key still prunes down to the fp bound plus the un-indexed file
    assert(survivors(t2, "id = 2047") <= 2)
  }

  it("bloom matching survives partitioned writes (one task, many partition dirs)") {
    // coalesce(1): ONE task writes a file under EVERY partition dir, so all
    // files share a base name — matching must key on the relative path or
    // every file gets another partition's bloom and point lookups lose rows
    val rows = (0 until 512).map(i => (i * 2, i % 4))
    val t = GraftTable.create(spark, tmpTableDir("bloom_part"),
      rows.toDF("id", "p").coalesce(1),
      partitionColumns = Seq("p"),
      properties = Map(graft.tables.BloomIndex.ColumnsProperty -> "id"))
    assert(t.snapshot.files.size == 4)
    // every present key is found; each lives in exactly one partition file
    Seq(0, 2, 510, 1022).foreach { k =>
      assert(t.toDF.filter($"id" === k).count() == 1, s"id=$k lost")
      val kept = survivors(t, s"id = $k")
      assert(kept >= 1 && kept <= 2, s"id=$k scanned $kept of 4")
    }
    // absent-but-in-range keys prune
    assert(survivors(t, "id = 3") <= 1)
  }

  it("bloom filters live in sidecars: commit log size is filter-width-independent") {
    import java.nio.file.{Files, Paths}
    def logBytes(t: GraftTable): Long = {
      val s = Files.list(Paths.get(t.path, GraftLog.LogDirName))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
          .map(Files.size).sum
      } finally s.close()
    }
    val rows = (0 until 2048).map(i => (i * 2, s"v$i"))
    // DELIBERATELY wide filters (2^20 bits = 128 KB each × 2 columns × 4
    // files = 1 MB of index): inline storage would put all of it — base64'd —
    // in the log; sidecars must keep the log within a marker's width of the
    // bloom-free twin
    val wide = GraftTable.create(spark, tmpTableDir("bloom_wide"),
      rows.toDF("id", "name").repartition(4),
      properties = Map(
        graft.tables.BloomIndex.ColumnsProperty -> "id,name",
        graft.tables.BloomIndex.BitsProperty -> (1 << 20).toString))
    val off = GraftTable.create(spark, tmpTableDir("bloom_free"),
      rows.toDF("id", "name").repartition(4))
    val (wideLog, offLog) = (logBytes(wide), logBytes(off))
    assert(wideLog - offLog < 4096,
      s"log grew by ${wideLog - offLog} bytes — filters leaked into the log")
    // the index itself landed in the sidecar and prunes
    assert(Files.isDirectory(Paths.get(wide.path, graft.tables.BloomIndex.SidecarDirName)))
    assert(survivors(wide, "id = 1001") <= 1)
    assert(survivors(wide, "id = 1000") >= 1 && wide.toDF.filter($"id" === 1000).count() == 1)
  }

  it("vacuum collects bloom sidecars orphaned with their data files") {
    import java.nio.file.{Files, Paths}
    val t = GraftTable.create(spark, tmpTableDir("bloom_gc"),
      (0 until 256).map(i => (i * 2, s"v$i")).toDF("id", "name").repartition(2),
      properties = Map(graft.tables.BloomIndex.ColumnsProperty -> "id"))
    t.overwrite((0 until 256).map(i => (i * 2, s"w$i")).toDF("id", "name")) // v1: v0 sidecar orphaned
    val bloomRoot = Paths.get(t.path, graft.tables.BloomIndex.SidecarDirName)
    def sidecarDirs: Set[String] = {
      val s = Files.list(bloomRoot)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSet
      } finally s.close()
    }
    assert(sidecarDirs.size == 2)
    val liveId = GraftLog.parseStats(t.snapshot.files.head.stats).get.bloomSidecar.get

    // a YOUNG orphan survives: it may belong to an in-flight commit whose
    // stats aren't visible yet (age guard)
    graft.operators.TableOps.vacuum(t, retainVersion = 1L)
    assert(sidecarDirs.size == 2, "young orphan must survive the age guard")

    // age both dirs past the guard: only the referenced one survives
    sidecarDirs.foreach { id =>
      Files.setLastModifiedTime(bloomRoot.resolve(id),
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() -
          graft.operators.TableOps.BloomSidecarMinAgeMillis - 1000))
    }
    graft.operators.TableOps.vacuum(t, retainVersion = 1L)
    assert(sidecarDirs == Set(liveId), "vacuum must drop exactly the aged orphaned sidecar")
    // probes against the survivor still work
    assert(survivors(t, "id = 9") <= 1)         // absent-but-in-range
    assert(t.toDF.filter($"id" === 8).count() == 1)
  }

  it("OPTIMIZE ZORDER clusters both dimensions for skipping at once") {
    // two INDEPENDENT dimensions (y is a bit-reversal permutation of x, so
    // sorting by either leaves the other scattered), written scattered:
    // every file's min/max spans ~the whole range on both — nothing skips
    def rev(x: Int): Int = Integer.reverse(x) >>> (32 - 12) // 12-bit reversal
    val rows = (0 until 4096).map(i => (i, rev(i)))
    val t = GraftTable.create(spark, tmpTableDir("zorder"),
      rows.toDF("x", "y").repartition(8))
    assert(survivors(t, "x >= 0 AND x <= 255") == 8, "expected no skipping before zorder")
    assert(survivors(t, "y >= 0 AND y <= 255") == 8)

    val v = graft.operators.TableOps.zorder(t, Seq("x", "y"), numFiles = Some(8))
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.version == v)
    assert(t2.snapshot.files.size == 8)
    // the rewrite is layout-only: same rows, OPTIMIZE commit
    assert(t2.toDF.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == rows.toSet)
    assert(t2.history().head._2.operation == "OPTIMIZE")
    // a narrow range on EITHER dimension now skips files. Exact counts from
    // the bit interleave (x bit i at z position 2i, y at 2i+1; 8 files ≈ the
    // top 3 z bits = y7 x7 y6): x ≤ 255 fixes x7=0 → 4 of 8 z-regions (+1
    // boundary straddle); y ≤ 255 fixes y7=y6=0 → 2 of 8 (+1). Without
    // clustering BOTH ranges scanned all 8.
    val xScan = survivors(t2, "x >= 0 AND x <= 255")
    val yScan = survivors(t2, "y >= 0 AND y <= 255")
    assert(xScan <= 5, s"x-range scanned $xScan of 8 files after zorder")
    assert(yScan <= 3, s"y-range scanned $yScan of 8 files after zorder")

    // STRING zorder: prefix ranking clusters lexicographically, so string
    // min/max stats prune a prefix range after the rewrite
    val words = (0 until 1024).map(i => (i, f"w${rev(i)}%04d"))
    val ts = GraftTable.create(spark, tmpTableDir("zorder_str"),
      words.toDF("id", "name").repartition(8))
    assert(survivors(ts, "name >= 'w0000' AND name <= 'w0512'") == 8)
    graft.operators.TableOps.zorder(ts, Seq("name"), numFiles = Some(8))
    val ts2 = GraftTable.forPath(spark, ts.path)
    assert(ts2.toDF.collect().map(r => (r.getInt(0), r.getString(1))).toSet == words.toSet)
    val sScan = survivors(ts2, "name >= 'w0000' AND name <= 'w0512'")
    assert(sScan <= 2, s"string-prefix range scanned $sScan of 8 files after zorder")

    // a truly unsupported column type still fails loudly
    val tb = GraftTable.create(spark, tmpTableDir("zorder_bool"),
      Seq((1, Array[Byte](1))).toDF("id", "payload"))
    intercept[IllegalArgumentException] {
      graft.operators.TableOps.zorder(tb, Seq("payload"))
    }
  }

  it("zorder on a hive-partitioned table keeps partition dirs and bounded file counts") {
    // range key leads with the partition column, so each output task holds
    // contiguous partition values — the writer's per-value split must not
    // shatter the clustering into (numFiles x partitions) tiny files
    def rev(x: Int): Int = Integer.reverse(x) >>> (32 - 10)
    val rows = (0 until 1024).map(i => (i, rev(i), i % 4))
    val t = GraftTable.create(spark, tmpTableDir("zorder_part"),
      rows.toDF("x", "y", "p").repartition(6), partitionColumns = Seq("p"))
    graft.operators.TableOps.zorder(t, Seq("x", "y"), numFiles = Some(8))
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.toDF.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      == rows.toSet)
    // each file still lives in exactly one partition dir, and the total file
    // count stays near numFiles (+ at most one straddle per task boundary)
    val files = t2.snapshot.files
    assert(files.forall(_.partitionValues.contains("p")))
    assert(files.size <= 8 + 4, s"partitioned zorder shattered into ${files.size} files")
  }
}
