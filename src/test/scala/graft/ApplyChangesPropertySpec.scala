package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec

import graft.operators.ApplyChanges
import graft.tables.GraftTable

/** Model-based check of APPLY CHANGES: random change feeds applied through
  * the engine must match a driver-side reference fold of the same rules
  * (latest sequence per key wins, delete beats upsert at an equal sequence,
  * stored-sequence guard with NULL = always-apply, physical deletes).
  */
class ApplyChangesPropertySpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private case class Change(id: Int, name: String, seq: Long, delete: Boolean)

  private val changeGen: Gen[Change] = for {
    id <- Gen.choose(0, 8) // small key space forces per-key collisions
    name <- Gen.oneOf("a", "b", "c", "d", "e")
    seq <- Gen.choose(1L, 6L)
    del <- Gen.prob(0.3)
  } yield Change(id, name, seq, del)

  private val batchGen: Gen[List[Change]] = Gen.nonEmptyListOf(changeGen)
  private val batchesGen: Gen[List[List[Change]]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, batchGen))

  /** Reference fold over a driver map: state(id) = (name, seq). */
  private def reference(
      init: Map[Int, (String, Long)],
      batches: List[List[Change]]): Map[Int, (String, Long)] = {
    var state = init
    batches.foreach { batch =>
      // net effect per key: max by (seq, delete) — mirrors the engine's
      // max_by(payload, struct(seq, del)); ties beyond that are avoided by
      // the dedupe below, matching the documented contract
      val net = batch.groupBy(_.id).map { case (id, cs) =>
        id -> cs.maxBy(c => (c.seq, c.delete))
      }
      net.foreach { case (id, c) =>
        state.get(id) match {
          case Some((_, stored)) if c.seq < stored => () // stale, guarded
          case _ =>
            state = if (c.delete) state - id
                    else state + (id -> ((c.name, c.seq)))
        }
      }
    }
    state
  }

  /** Remove the one ambiguity the contract leaves unspecified — two changes
    * of one key at one (seq, delete) with different payloads — by making
    * the payload a function of (id, seq, delete).
    */
  private def dedupe(batch: List[Change]): List[Change] =
    batch.map(c => c.copy(name = s"v${c.id}_${c.seq}_${c.delete}"))
      .groupBy(c => (c.id, c.seq, c.delete)).values.map(_.head).toList

  private def forAll[T](g: Gen[T], n: Int)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(25)
    (0 until n).foreach(i => g.apply(params, Seed(7L + i)).foreach(body))
  }

  it("random multi-batch feeds match the driver-side reference fold") {
    forAll(batchesGen, n = 6) { rawBatches =>
      val batches = rawBatches.map(dedupe)
      val init = Map(0 -> (("z0", 0L)), 1 -> (("z1", 0L)), 2 -> (("z2", 3L)))
      val dir = tmpTableDir("acprop")
      val t = GraftTable.create(spark, dir,
        init.toSeq.map { case (id, (n, s)) => (id, n, s) }
          .toDF("id", "name", "seq").repartition(1))
      batches.foreach { b =>
        ApplyChanges.applyChanges(GraftTable.forPath(spark, dir),
          b.map(c => (c.id, c.name, c.seq, c.delete)).toDF("id", "name", "seq", "del"),
          Seq("id"), "seq", Some("del"))
      }
      val got = GraftTable.forPath(spark, dir).toDF
        .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val want = reference(init, batches)
      assert(got == want,
        s"engine state $got != reference $want for batches $batches")
    }
  }
}
