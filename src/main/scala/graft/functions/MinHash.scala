package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd single-pass MinHash signature.
  *
  * Semantically identical to the composed-functions formulation
  * `array(array_min(transform(sh, x => pmod(x*a_i + b_i, P))) for i < k)`
  * — same `(a,b)` permutation family, same Mersenne-prime modulus, same
  * null handling (null elements skipped; all-null/empty input yields a
  * signature of `k` nulls; the one divergence: NULL input propagates NULL
  * where the composed form yields an array of `k` nulls — strictly safer,
  * and unreachable in the pipeline, which filters empty shingle sets first)
  * — but evaluated in ONE traversal of the shingle
  * array with a `k`-slot running-minimum buffer. The composed form
  * materializes `k` intermediate arrays per row (one per hash) and scans
  * each; on 64-hash signatures that is 64 array allocations + 128 passes
  * per document, which profiling showed dominating the MinHash-LSH
  * pipeline's map stage. This expression allocates nothing per element and
  * stays inside whole-stage codegen.
  *
  * Scale note: signature computation is the narrow map stage of LSH dedup —
  * it runs once per document over the full corpus, so per-row constant
  * factors here are the difference between a scan-bound and a CPU-bound
  * pipeline at 100 TB.
  *
  * INPUT-RANGE CONTRACT: elements must lie in `[0, 2^31)` (the pipeline
  * guarantees this — shingle hashes are `pmod`-ed into `[0, MersennePrime)`).
  * Outside that range the Java multiply here silently wraps on overflow,
  * whereas the composed built-ins formulation under ANSI mode (Spark 4
  * default) throws ARITHMETIC_OVERFLOW — a divergence alongside the
  * documented NULL-input one.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  import MinHashSignature.MersennePrime

  // deterministic (a,b) permutation parameters — the SAME helper feeds
  // Dedup.minhashSignatureComposed, so the two formulations cannot drift
  private val (aParams, bParams) = MinHashSignature.permParams(numHashes, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint> input, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val x = arr.getLong(j)
        var i = 0
        while (i < numHashes) {
          var v = (x * aParams(i) + bParams(i)) % MersennePrime
          if (v < 0) v += MersennePrime
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (any) UnsafeArrayData.fromPrimitiveArray(mins)
    else new GenericArrayData(new Array[Any](numHashes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val as = ctx.addReferenceObj("minhashA", aParams, "long[]")
    val bs = ctx.addReferenceObj("minhashB", bParams, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $j = 0; $j < $arr.numElements(); $j++) {
         |  if ($arr.isNullAt($j)) continue;
         |  $any = true;
         |  long $x = $arr.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = ($x * $as[$i] + $bs[$i]) % ${MersennePrime}L;
         |    if ($v < 0) $v += ${MersennePrime}L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = $any
         |  ? (org.apache.spark.sql.catalyst.util.ArrayData)
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins)
         |  : (org.apache.spark.sql.catalyst.util.ArrayData)
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$numHashes]);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** 2^31-1: products of two 31-bit values stay within Long range. */
  val MersennePrime: Long = 2147483647L

  /** Deterministic (a,b) permutation parameters from a fixed seed — the
    * single source of truth for the permutation family, consumed by BOTH the
    * codegen'd expression and `Dedup.minhashSignatureComposed` (so signatures
    * stay stable across library versions and the two paths cannot diverge).
    */
  def permParams(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      as(i) = 1L + rnd.nextInt((MersennePrime - 1).toInt).toLong
      bs(i) = rnd.nextInt(MersennePrime.toInt).toLong
      i += 1
    }
    (as, bs)
  }
}
