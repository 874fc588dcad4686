package graft.tables

import java.nio.charset.StandardCharsets.UTF_8

/** String ordering for the stats / skipping / metadata-only stack: unsigned
  * UTF-8 byte order — the SAME order Spark evaluates string comparisons in
  * (`UTF8String.compareTo` is a byte-wise memcmp) and the same order parquet
  * computes UTF8 column statistics in.
  *
  * Java's `String.compareTo` orders by UTF-16 code UNIT instead, and the two
  * orders diverge for any string containing supplementary-plane characters
  * (code points ≥ U+10000 — emoji): UTF-8 sorts them ABOVE U+E000–U+FFFF,
  * UTF-16 sorts their surrogate pairs (0xD800–0xDFFF) below. Using
  * `compareTo` against parquet footer min/max therefore (a) lets a
  * metadata-only `min`/`max` fold pick the wrong extreme outright, and
  * (b) lets range/equality/LIKE skipping prune a file that holds matches.
  * Every string comparison that touches file stats MUST route through here.
  *
  * (Reference context: the reference library delegates stats handling to
  * Delta, which stores and compares stats through Spark's UTF8String —
  * byte order — see `DeltaHelpers.scala:109-194` for the introspection
  * surface this stack stands in for.)
  */
object Utf8Order {

  /** Unsigned byte-wise comparison of the two strings' UTF-8 encodings —
    * identical to `UTF8String.fromString(a).compareTo(UTF8String.fromString(b))`
    * and to parquet's UTF8 stats order. Driver-side metadata plane only
    * (O(files) comparisons), so the per-call encode is immaterial.
    */
  def compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(a.getBytes(UTF_8), b.getBytes(UTF_8))

  def lt(a: String, b: String): Boolean = compare(a, b) < 0
  def lteq(a: String, b: String): Boolean = compare(a, b) <= 0

  /** The exclusive upper bound of the `LIKE 'p%'` match band, in UTF-8 byte
    * space: the encoded prefix with its last incrementable byte incremented
    * and the tail dropped. Valid UTF-8 never contains 0xFF, so in practice
    * the last byte always increments — the incremented array may not be
    * valid UTF-8, which is fine: it is only ever compared byte-wise against
    * other strings' encodings via [[ltBytes]]. None = no upper prune.
    */
  def prefixUpperBound(prefix: String): Option[Array[Byte]] = {
    val p = prefix.getBytes(UTF_8)
    var i = p.length - 1
    while (i >= 0 && p(i) == 0xFF.toByte) i -= 1
    if (i < 0) None
    else {
      val ub = java.util.Arrays.copyOf(p, i + 1)
      ub(i) = (ub(i) + 1).toByte
      Some(ub)
    }
  }

  /** `s <utf8 bound` where `bound` is a raw byte-space bound (possibly not
    * valid UTF-8) from [[prefixUpperBound]].
    */
  def ltBytes(s: String, bound: Array[Byte]): Boolean =
    java.util.Arrays.compareUnsigned(s.getBytes(UTF_8), bound) < 0

  /** `s >=utf8 prefix` for the lower edge of the LIKE band. */
  def gteq(a: String, b: String): Boolean = compare(a, b) >= 0
}
