package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for graft's custom Catalyst expressions, so
  * `spark.sql("SELECT minhash_signature(shingles, 64) ...")` works alongside
  * the Column API ([[graft.pipeline.Dedup.minhashSignature]]).
  */
object GraftFunctions {

  /** Register all graft SQL functions on `spark` (session-scoped).
    *
    * `minhash_signature(shingles array<bigint> [, numHashes int = 64
    * [, seed bigint = 42]])` — numHashes and seed must be literals (they
    * parameterize the generated code, like `round`'s scale argument).
    */
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.SparkBridge.registerFunction(
      spark, "minhash_signature", minhashBuilder)
  }

  private[functions] def minhashBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.nonEmpty && exprs.length <= 3,
      s"minhash_signature expects 1 to 3 arguments, got ${exprs.length}")
    val numHashes = exprs.lift(1).map(litInt("numHashes", _)).getOrElse(64)
    val seed = exprs.lift(2).map(litLong("seed", _)).getOrElse(42L)
    MinHashSignature(exprs.head, numHashes, seed)
  }

  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"minhash_signature: $name must be an integer literal, got ${other.sql}")
  }

  private def litLong(name: String, e: Expression): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, _)          => v
    case other => throw new IllegalArgumentException(
      s"minhash_signature: $name must be a long literal, got ${other.sql}")
  }
}
