package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec

import graft.tables.{TableWriter, Utf8Order}

/** Property pins for the UTF-8 string machinery the stats/skipping stack
  * rides on: [[Utf8Order]] must agree with Spark's `UTF8String` binary
  * order on EVERY string (the whole point of round 15's ordering fix),
  * the LIKE band `[p, next(p))` must contain exactly the strings that
  * start with `p`-as-prefix-region, and partition-path percent decoding
  * must round-trip arbitrary unicode — including supplementary-plane
  * characters, whose surrogate halves the old char-by-char decode tore.
  */
class Utf8OrderPropertySpec extends AnyFunSpec {

  private def forAll[T](g: Gen[T], n: Int = 400)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(24)
    (0 until n).foreach(i => g.apply(params, Seed(7L * i + 3)).foreach(body))
  }

  /** Strings biased toward the divergence zones: ASCII, U+E000–U+FFFF
    * (sorts HIGH in UTF-16), supplementary plane (sorts HIGH in UTF-8),
    * and '%' (the escape char percentDecode treats specially).
    */
  private val unicodeString: Gen[String] = Gen.listOf(Gen.frequency(
    4 -> Gen.choose(32, 126).map(_.toChar.toString),
    1 -> Gen.const("%"),
    2 -> Gen.choose(0xE000, 0xFFFD).map(cp => new String(Character.toChars(cp))),
    2 -> Gen.choose(0x10000, 0x10FFFF).map(cp => new String(Character.toChars(cp))),
    1 -> Gen.choose(0x80, 0x7FF).map(cp => new String(Character.toChars(cp)))
  )).map(_.mkString)

  it("Utf8Order.compare agrees with Spark's UTF8String binary order on every string") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.zip(unicodeString, unicodeString)) { case (a, b) =>
      val ours = Integer.signum(Utf8Order.compare(a, b))
      val sparks = Integer.signum(
        UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b)))
      assert(ours == sparks,
        s"order mismatch on ${a.codePoints.toArray.map(_.toHexString).mkString(" ")} vs " +
          s"${b.codePoints.toArray.map(_.toHexString).mkString(" ")}: ours=$ours spark=$sparks")
    }
  }

  it("the LIKE band [p, next(p)) contains exactly the prefix-matching strings") {
    forAll(Gen.zip(unicodeString, unicodeString)) { case (p, s) =>
      val inBand = Utf8Order.gteq(s, p) &&
        Utf8Order.prefixUpperBound(p).forall(ub => Utf8Order.ltBytes(s, ub))
      // byte-level prefix match is the ground truth the band must capture
      val aBytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val pBytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val isPrefix = aBytes.length >= pBytes.length &&
        java.util.Arrays.equals(aBytes.take(pBytes.length), pBytes)
      // soundness: every prefix match lies in the band (a file range
      // holding s must never be pruned for LIKE 'p%')
      if (isPrefix) assert(inBand,
        s"prefix match escaped the band: p=$p s=$s")
      // the band is the tightest byte interval: anything in it is >= p and
      // shares p's length-bytes as a lower bound — verify no string BELOW
      // p sneaks in
      if (inBand) assert(Utf8Order.gteq(s, p))
    }
  }

  it("percentDecode round-trips Spark-style escaped partition values, surrogates intact") {
    // encode like Spark's ExternalCatalogUtils.escapePathName: the chars
    // Spark protects become %XX (of their UTF-8 bytes); everything else
    // stays raw — exactly what lands in partition directory names
    def escape(s: String): String = {
      val needs = "%/:={[]^"
      s.flatMap { c =>
        if (needs.contains(c) || c < ' ')
          c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            .map(b => f"%%${b & 0xFF}%02X").mkString
        else c.toString
      }
    }
    forAll(unicodeString) { s =>
      assert(TableWriter.percentDecode(escape(s)) == s,
        s"round-trip broke on ${s.codePoints.toArray.map(_.toHexString).mkString(" ")}")
    }
    // and a fully %XX-encoded spelling (the streaming writer's POSIX-locale
    // form) decodes to the same string
    def escapeAll(s: String): String =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"%%${b & 0xFF}%02X").mkString
    forAll(unicodeString, n = 200) { s =>
      assert(TableWriter.percentDecode(escapeAll(s)) == s)
    }
  }
}
