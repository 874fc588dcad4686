package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector math for the similarity/dedup pipeline.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`, `transform`)
  * are evaluated INTERPRETED — one boxed lambda invocation per element —
  * so a k-means assignment at k=64 over 64-dim vectors costs k × dim ≈
  * 4096 interpreted ops per row (~120 µs/row measured; the whole cluster
  * build was 20+ s on a 16k-row corpus). These expressions run the same
  * IEEE arithmetic as the HOF compositions — identical element order, so
  * results are BIT-IDENTICAL and the DuckDB oracles are unaffected
  * (equivalence pinned by spec) — inside whole-stage codegen as tight
  * primitive loops.
  *
  * Null semantics mirror the HOF compositions they replace: length
  * mismatch or a NULL element → NULL result (zip_with pads the shorter
  * side with nulls, which poisons the fold the same way). The one
  * divergence, shared with [[MinHashSignature]]: a NULL INPUT vector
  * yields NULL where the compositions yield a non-null container of
  * nulls — strictly safer, pinned by spec.
  */
object VectorExpressions

/** Hashed word n-gram shingles of a token array in ONE compiled pass:
  * `array_distinct(transform(grams, g => pmod(xxhash64(concat_ws(' ', g)),
  * 2^31-1)))` over the `arrays_zip`-of-shifted-slices gram construction —
  * byte-exact (hashes via `XxHash64Function.hash`, joins via
  * `UTF8String.concatWs`, same null-skipping and `<n`-token fallback to a
  * single whole-text gram, same first-occurrence distinct order; empty
  * token arrays yield empty output; equivalence pinned by spec). The
  * composed form pays an interpreted lambda dispatch per gram plus n
  * intermediate arrays per row — this is the map stage of every
  * MinHash/Jaccard dedup pass, so per-row constants govern the 100 TB
  * scan cost.
  */
case class HashedShingles(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "hashed_shingles"

  private val space = UTF8String.fromString(" ")
  private val MersennePrime = 2147483647L

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it (the loop body is compiled Scala
    * either way; doGenCode just keeps the surrounding stage fused).
    */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val g = math.max(m - n + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < g) {
      var k = 0
      while (k < n) {
        parts(k) = if (i + k < m && !arr.isNullAt(i + k)) arr.getUTF8String(i + k) else null
        k += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, org.apache.spark.sql.types.StringType, 42L)
      var v = h % MersennePrime
      if (v < 0) v += MersennePrime
      seen.add(v)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[HashedShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** POSITIONAL hashed word n-grams of a token array in one compiled pass:
  * element `i` (0-based) is the full 64-bit xxhash64 (seed 42) of tokens
  * `[i, i+n)` joined by a single space — order-preserving, duplicates
  * KEPT (unlike [[HashedShingles]], which is set-semantics for Jaccard /
  * MinHash). Fewer than `n` tokens → EMPTY array (no whole-text fallback:
  * a document too short to contain a length-n window has no windows).
  *
  * This is the map stage of exact substring deduplication: `posexplode`
  * of the result yields (window start, window hash) rows, and a global
  * group-by on the 64-bit hash finds corpus-wide duplicated windows.
  * Full 64 bits (not the 31-bit Mersenne residue the MinHash pipeline
  * uses) because these hashes are grouped GLOBALLY across the corpus —
  * at 100 TB (~10^12 windows) a 31-bit space would collide constantly,
  * while 64-bit birthday collisions stay ~1e-6-rare.
  */
case class HashedShinglesPositional(child: Expression, n: Int)
  extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_shingles_positional requires array<string> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def prettyName: String = "hashed_shingles_positional"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public so generated code can call it. */
  def compute(arr: ArrayData): ArrayData = {
    val m = arr.numElements()
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val g = m - n + 1
    val out = new Array[Long](g)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < g) {
      var k = 0
      while (k < n) {
        parts(k) = if (!arr.isNullAt(i + k)) arr.getUTF8String(i + k) else null
        k += 1
      }
      val s = UTF8String.concatWs(space, parts: _*)
      out(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this,
      classOf[HashedShinglesPositional].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedShinglesPositional =
    copy(child = newChild)
}

/** Count of boundaries ≤ value — the per-column bucket rank of the Z-ORDER
  * rewrite, as a binary search over a referenced sorted boundary array.
  * Replaces `aggregate(lit(boundaries), 0L, (acc,b) => acc + when(v >= b,
  * 1L).otherwise(0L))`, which (a) is an interpreted higher-order function
  * and (b) re-evaluates the VALUE expression per boundary (lambda bodies
  * escape CSE) and per interleave bit that references the fold.
  *
  * Fold-equivalent semantics, pinned by spec: NULL value → 0 (the fold's
  * when(...).otherwise(0) per element); a NaN value counts EVERY boundary
  * (Spark SQL's ordering puts NaN greatest, so `NaN >= b` is true for all
  * b — including NaN boundaries); a NaN boundary counts for no non-NaN
  * value (`v >= NaN` is false), so the search array drops them.
  */
case class BucketRank(child: Expression, boundaries: Array[Double])
  extends UnaryExpression {

  private val bs: Array[Double] = boundaries.filterNot(_.isNaN).sorted

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bucket_rank requires double input, got ${other.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_rank"

  /** Public so generated code can call it. */
  def rank(v: Double): Long = {
    if (v.isNaN) return boundaries.length.toLong // NaN sorts greatest in SQL
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else rank(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("ranker", this, classOf[BucketRank].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $ref.rank(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketRank =
    copy(child = newChild)
}

/** `Σ a(i)·b(i)` over two array<double> columns — the inner product behind
  * every cosine in the pipeline. Ascending-index accumulation, exactly the
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` fold it replaces.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |double $s = 0.0;
         |boolean $bad = $x.numElements() != $y.numElements();
         |if (!$bad) {
         |  for (int $i = 0; $i < $x.numElements(); $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of one array<double> column to EVERY row of a fixed
  * codebook matrix, as array<double> — the k-means / PQ assignment
  * primitive. Replaces `transform(codebookLit, cw => aggregate(zip_with(
  * vec, cw, (x,y) => (x-y)*(x-y)), 0.0, _+_))`: one generated double loop,
  * the codebook rides as a referenced object (never inlined into source).
  * A length-mismatched or null-element vector yields a NULL entry for that
  * codeword (the zip_with-padding semantics of the composition).
  */
case class SquaredDistances(child: Expression, codebook: Array[Array[Double]])
  extends UnaryExpression {

  require(codebook.nonEmpty, "codebook must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"squared_distances requires array<double> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "squared_distances"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Any](codebook.length)
    var j = 0
    while (j < codebook.length) {
      val cw = codebook(j)
      if (v.numElements() == cw.length) {
        var s = 0.0d
        var p = 0
        var ok = true
        while (ok && p < cw.length) {
          if (v.isNullAt(p)) ok = false
          else { val d = v.getDouble(p) - cw(p); s += d * d; p += 1 }
        }
        if (ok) out(j) = s
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val nulls = ctx.freshName("nulls")
      val any = ctx.freshName("anyNull")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val cw = ctx.freshName("cw")
      val ok = ctx.freshName("ok")
      s"""
         |double[] $out = new double[$cb.length];
         |boolean[] $nulls = new boolean[$cb.length];
         |boolean $any = false;
         |for (int $j = 0; $j < $cb.length; $j++) {
         |  double[] $cw = $cb[$j];
         |  if ($v.numElements() != $cw.length) { $nulls[$j] = true; $any = true; continue; }
         |  double $s = 0.0;
         |  boolean $ok = true;
         |  for (int $p = 0; $p < $cw.length; $p++) {
         |    if ($v.isNullAt($p)) { $ok = false; break; }
         |    double $d = $v.getDouble($p) - $cw[$p];
         |    $s += $d * $d;
         |  }
         |  if ($ok) { $out[$j] = $s; } else { $nulls[$j] = true; $any = true; }
         |}
         |if (!$any) {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |} else {
         |  Object[] boxed = new Object[$cb.length];
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    if (!$nulls[$j]) boxed[$j] = (Double) $out[$j];
         |  }
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(boxed);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SquaredDistances =
    copy(child = newChild)
}
