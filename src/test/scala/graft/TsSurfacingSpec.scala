package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

/** Regression guard for the BENCH_r10 failure class: the driver's testdata
  * generator has historically surfaced `events.ts` three different ways
  * across generations — raw-ns BIGINT (legacy TIMESTAMP(NANOS) read with
  * `nanosAsLong`), TIMESTAMP (µs), and TIMESTAMP_NTZ (µs) — and the three
  * bench queries whose arithmetic starts from `ts` (sessionize, as-of join,
  * windowed stream) must produce IDENTICAL results under every surfacing.
  * Round 10's driver bench hit `DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES` on
  * exactly those three against one transient generation; this spec replays
  * all three surfacings through the real `SparkEntry.staged` pipelines so
  * the next generator drift fails `sbt test` locally instead of the
  * driver's bench.
  */
class TsSurfacingSpec extends AnyFunSpec with SparkSessionTestWrapper {

  private val sfDir = "/root/testdata/sf0.001"

  /** Rewrite sf0.001 events with `ts` surfaced per `variant`, returning a
    * dir laid out like a testdata SF dir (only `events.parquet` — the three
    * queries under test read nothing else).
    */
  private def variantDir(variant: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"tsvar_$variant").toString
    // the test session itself may surface the source ts as TIMESTAMP or
    // TIMESTAMP_NTZ depending on the generator's isAdjustedToUTC flag —
    // normalize to TIMESTAMP first (session tz is pinned UTC, so the cast
    // is µs-identity), which is itself the bug class under test: an
    // unguarded unix_micros(ts) here throws on an NTZ generation
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val recast = variant match {
      case "us" => ev // TIMESTAMP, µs — the current generation
      case "ntz" => ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case "longns" =>
        // raw-ns BIGINT, what nanosAsLong surfaces for TIMESTAMP(NANOS)
        ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    }
    recast.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def runStaged(name: String, dir: String): DataFrame =
    SparkEntry.staged(name)(spark, dir)()

  private lazy val dirs = Seq("us", "ntz", "longns").map(v => v -> variantDir(v)).toMap

  for (q <- Seq("q4_sessionize", "q5_asof_join", "q6_windowed_stream")) {
    it(s"$q is invariant to the events.ts parquet surfacing") {
      val expected = runStaged(q, dirs("us"))
      for (v <- Seq("ntz", "longns")) {
        val actual = runStaged(q, dirs(v))
        assertSmallDataFrameEquality(actual, expected)
      }
    }
  }
}
