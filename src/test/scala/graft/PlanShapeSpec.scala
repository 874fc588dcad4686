package graft

import org.scalatest.funspec.AnyFunSpec

/** Physical-plan regression guards for the headline queries: predicate
  * pushdown reaching the parquet scan, column pruning, broadcast of the
  * small join side, whole-stage codegen, and shuffle-free map-only
  * pipelines. These are the properties that hold the 100 TB story up — a
  * refactor that silently drops one (a filter that stops pushing, a
  * broadcast that becomes a shuffle join) should fail here, not in a
  * bench regression three rounds later.
  */
class PlanShapeSpec extends AnyFunSpec with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.001"

  /** Executed-plan string AFTER running the query, cut to the AQE FINAL
    * plan section (the initial-plan echo would double-count nodes).
    */
  private def planOf(name: String): String = {
    val df = SparkEntry.staged(name)(spark, sfDir)()
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
  }

  it("GraftSourcePin freezes graft sources at the call-time snapshot") {
    import graft.tables.GraftTable
    val dir = tmpTableDir("pin-src")
    val t = GraftTable.create(spark, dir, spark.range(10).toDF("id"))
    val live = spark.read.format("graft").load(dir)
    val pinnedPlan = graft.sources.GraftSourcePin
      .pinToCurrent(spark, live.queryExecution.analyzed)
    t.append(spark.range(100, 105).toDF("id"))
    // the pinned plan keeps reading the statement-start state (this is
    // what correlated DML subqueries evaluate: both the touched-file scan
    // and the rewrite frame must see ONE predicate state)...
    val pinnedDf = org.apache.spark.sql.graft.SparkBridge.ofPlan(spark, pinnedPlan)
    assert(pinnedDf.count() == 10)
    // ...while the live relation follows the concurrent commit
    assert(live.count() == 15)
    // idempotent: pinning a pinned plan changes nothing
    val again = graft.sources.GraftSourcePin.pinToCurrent(spark, pinnedPlan)
    assert(org.apache.spark.sql.graft.SparkBridge.ofPlan(spark, again).count() == 10)
  }

  it("q1: ship-date filter pushes into the parquet scan; unused columns pruned") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed ship-date filter in:\n$p")
    // codegen'd operators print with the `*(n)` stage prefix
    assert(p.contains("*(1)"), "aggregation left whole-stage codegen")
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  it("q2: the customer dimension broadcasts — no shuffle join") {
    val p = planOf("q2_top_customers")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
  }

  it("q3: both window functions share ONE user_id shuffle") {
    val p = planOf("q3_user_running_totals")
    // row_number and the running sum use the same (partitionBy, orderBy):
    // Catalyst must plan a single Exchange hashpartitioning(user_id)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 user_id exchange, saw $exchanges in:\n$p")
  }

  it("map-only pipelines stay shuffle-free") {
    for (q <- Seq("d19_weighted_mix", "t11_chunking")) {
      val p = planOf(q)
      assert(!p.contains("Exchange"), s"$q grew a shuffle:\n$p")
    }
  }

  it("t14: URL signal extraction is a pure map — no shuffle, no join") {
    val p = planOf("t14_url_signals")
    assert(!p.contains("Exchange"), s"t14 grew a shuffle:\n$p")
    assert(!p.contains("Join"), s"t14 grew a join:\n$p")
  }

  it("d31: line text never shuffles — only hashes and positions do") {
    // every Exchange's partitioning/output must be over ids, hashes and
    // positions; the raw line column (__raw) appearing in any Exchange
    // means the rewrite started shipping text through the ban shuffles
    val df = SparkEntry.staged("d31_line_dedup")(spark, sfDir)()
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec        => q +: flatten(q.plan)
      case other                    => other +: other.children.flatMap(flatten)
    }
    val exchanges = flatten(df.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val outCols = e.output.map(_.name)
      assert(!outCols.exists(_.contains("__raw")),
        s"line text rides a shuffle: ${outCols.mkString(", ")}")
    }
  }

  it("dynamic partition pruning fires on a partitioned graft scan joined to a filtered dim") {
    // the native relation must stay DPP-composable: at 100 TB a fact scan
    // joined to a filtered dimension reads only the dim's partitions, not
    // the table — a scan-rewrite refactor that breaks this shows up as a
    // silent full scan three rounds later
    import org.apache.spark.sql.functions._
    import graft.tables.GraftTable
    val dir = tmpTableDir("plan-dpp")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("bucket", (col("l_orderkey") % 10).cast("int"))
    val t = GraftTable.create(spark, dir, li, partitionColumns = Seq("bucket"))
    val dim = spark.read.parquet(s"$sfDir/nation.parquet")
      .select((col("n_nationkey") % 10).cast("int").as("bucket"), col("n_name").as("name"))
      .filter(col("name").isin("CHINA", "FRANCE"))
    val q = t.toDF.join(dim, Seq("bucket")).agg(sum("l_quantity"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"dynamic partition pruning did not reach the graft scan:\n$p")
  }

  it("t10: the LM model sides broadcast to the eval scan") {
    val p = planOf("t10_ngram_lm_score")
    assert(p.contains("BroadcastHashJoin"), s"model join not broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), "model join fell back to sort-merge")
  }
}
