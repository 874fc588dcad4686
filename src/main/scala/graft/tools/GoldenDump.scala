package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot generator for the golden-value oracle literals (t12/t13/t15):
  * runs the three golden queries and prints each result as a DuckDB
  * `VALUES` literal ready to paste into SparkEntry.oracleSql. Not part of
  * the library surface — a maintenance tool kept so the literals can be
  * regenerated if the fixture or an operator legitimately changes.
  */
object GoldenDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def lit(v: Any): String = v match {
      case null      => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      // Locale.ROOT: a comma-decimal default locale would render 2.0 as
      // '2,0' and corrupt the pasted VALUES literal
      case d: Double =>
        if (d == d.floor && math.abs(d) < 1e15)
          String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
        else d.toString
      case other     => other.toString
    }
    for (name <- Seq("t12_bpe_merges", "t13_bpe_tokenize", "t15_compression_signals")) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      val cols = df.columns
      val rows = df.collect().sortBy(_.toString)
      println(s"=== $name (${rows.length} rows, cols=${cols.mkString(",")})")
      rows.foreach { r =>
        println("  (" + cols.indices.map(i => lit(r.get(i))).mkString(", ") + "),")
      }
    }
    spark.stop()
  }
}
