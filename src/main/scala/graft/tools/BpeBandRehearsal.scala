package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.TextAnalysis

/** Scale rehearsal for [[TextAnalysis.distributedBpe]]'s banded pair
  * state: a synthetic dictionary whose pair vocabulary EXCEEDS the 8M
  * resident bound (the shape that used to fail loudly) — a Zipf-ish head
  * of mergeable pairs over a small alphabet plus a huge hapax tail
  * (millions of distinct count-1 pairs, the real-corpus signature).
  *
  * Three runs over the same dictionary must produce bit-identical merge
  * tables:
  *  - `full`: resident bound raised above the pair vocabulary (the old
  *    all-resident behavior, the ground truth);
  *  - `banded`: the default 8M bound — the tail stays off-driver;
  *  - `tight`: a 100k bound — the admission threshold lands INSIDE the
  *    mergeable head, so refills fire mid-training.
  *
  * Usage: `sbt "runMain graft.tools.BpeBandRehearsal [tailWords] [merges]"`.
  */
object BpeBandRehearsal {
  def main(args: Array[String]): Unit = {
    val tailWords = args.headOption.map(_.toLong).getOrElse(8500000L)
    val numMerges = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // driver heap comes from build.sbt's forked -Xmx (SPARK_DRIVER_MEM,
      // default 8g) — a builder conf cannot resize an already-forked JVM
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // head: ~200k distinct words over a 26-char alphabet, length 5-9,
    // counts 2..64 — the mergeable band real training digs through
    val head = spark.range(200000).map { i =>
      val rnd = new scala.util.Random(i)
      val len = 5 + (i % 5).toInt
      val w = new String(Array.fill(len)(('a' + rnd.nextInt(26)).toChar))
      (w, 2L + (i % 63))
    }
    // tail: `tailWords` distinct 2-char words over a ~3000-char alphabet,
    // each count 1 → one hapax pair apiece, distinct by construction
    val alpha = 3000
    val tail = spark.range(tailWords).map { i =>
      val c1 = (0x4E00 + (i % alpha)).toInt.toChar
      val c2 = (0x4E00 + ((i / alpha) % alpha)).toInt.toChar
      val c3 = (0x3041 + ((i / alpha / alpha) % 80)).toInt.toChar
      (new String(Array(c1, c2, c3)), 1L)
    }
    val words = head.union(tail)
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).map(kv => (kv._1, kv._2))

    val distinctPairs = words.flatMap { case (w, _) =>
      (0 until w.length - 1).map(j => (w.charAt(j).toLong << 32) | w.charAt(j + 1).toLong)
    }.distinct().count()
    println(s"[rehearsal] distinct adjacent pairs: $distinctPairs " +
      s"(bound ${TextAnalysis.MaxDriverPairState})")

    def run(label: String, bound: Int): (Seq[(Int, String, String, Long)], Double) = {
      val t0 = System.nanoTime()
      val m = TextAnalysis.distributedBpe(words, numMerges, minPairCount = 2L,
        maxResidentPairs = bound)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[rehearsal] $label%-8s bound=$bound%9d merges=${m.length}%5d  $sec%8.1f s")
      (m, sec)
    }

    val (full, _) = run("full", 32 * 1000 * 1000)
    val (banded, _) = run("banded", TextAnalysis.MaxDriverPairState)
    val (tight, _) = run("tight", 100 * 1000)
    require(banded == full, "banded merge table diverged from full-resident")
    require(tight == full, "tight-band merge table diverged from full-resident")
    println(s"[rehearsal] OK: three bounds, one merge table (${full.length} merges)")
    spark.stop()
  }
}
