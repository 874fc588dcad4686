package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funspec.AnyFunSpec

import graft.log.ChangeDataFeedHelper
import graft.operators.TableOps
import graft.tables._

/** Substrate integration guard (VERDICT r3 item 8): a 1000-version,
  * ~1000-file table exercising checkpoint replay, vacuum horizon and CDF
  * recovery together. Version volume is generated through the commit
  * protocol itself (`log.commit` with real on-disk files copied per version)
  * so the log/checkpoint machinery sees true thousand-version state without
  * a thousand Spark write jobs.
  */
class LifecycleSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  it("1k-version lifecycle: checkpoint replay, vacuum horizon, CDF recovery") {
    val dir = tmpTableDir("lifecycle")
    val t = GraftTable.create(spark, dir,
      Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name").repartition(1),
      properties = Map(GraftLog.CdfProperty -> "true"))
    t.append(Seq((4, "d")).toDF("id", "name").repartition(1)) // v1
    TableOps.delete(t, Some("id = 2"))                        // v2 (CDC file)
    val log = t.log
    val baseFiles = t.snapshot.files.map(_.path).toSet
    val baseCount = t.toDF.count() // 3

    // ---- synthetic churn to v1002: each version adds one real (copied)
    // file and removes the previous one, so the live set stays small while
    // the log grows to 1000 versions / ~1000 on-disk files
    val template = Paths.get(dir, baseFiles.head)
    def synth(v: Long) = f"synth-$v%04d.parquet"
    val templateSize = Files.size(template)
    val templateRows = spark.read.parquet(template.toString).count()
    (3L to 1002L).foreach { v =>
      Files.copy(template, Paths.get(dir, synth(v)))
      val adds = Seq(AddFile(synth(v), size = templateSize))
      val removes = if (v > 3) Seq(RemoveFile(synth(v - 1))) else Nil
      log.commit(v, adds ++ removes :+
        CommitInfo(System.currentTimeMillis(), "WRITE",
          operationMetrics = Map("numOutputRows" -> "3")))
    }
    assert(log.latestVersion() == 1002L)
    assert(log.checkpointVersions().size == 100) // every 10th of 10..1002

    // ---- checkpoint replay must equal a raw fold of the whole log
    val rawFold: Set[String] = {
      val files = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
      log.versions().foreach { v =>
        log.actionsAt(v).foreach {
          case a: AddFile    => files(a.path) = a
          case r: RemoveFile => files.remove(r.path)
          case _             => ()
        }
      }
      files.keySet.toSet
    }
    assert(t.snapshot.files.map(_.path).toSet == rawFold)
    assert(t.snapshot.files.map(_.path).toSet == baseFiles + synth(1002L))
    assert(t.toDF.count() == baseCount + templateRows) // base + one live synth copy

    // ---- time travel mid-log reads through a mid checkpoint
    assert(t.toDFAt(500L).count() == baseCount + templateRows)

    // ---- vacuum to horizon 1000: dead synth files and pre-horizon log go
    val deleted = TableOps.vacuum(t, 1000L)
    assert(deleted >= 997, s"expected ~997 dead synth files deleted, got $deleted")
    assert(!Files.exists(Paths.get(dir, synth(500L))))
    assert(Files.exists(Paths.get(dir, synth(1002L))))
    assert(log.versions().head == 1000L)
    assert(log.checkpointVersions().forall(_ >= 1000L))
    // horizon version is self-contained: snapshot + reads still correct
    assert(t.toDFAt(1000L).count() == baseCount + templateRows)
    assert(t.toDF.count() == baseCount + templateRows)
    assertThrows[IllegalArgumentException] { t.toDFAt(500L) }

    // ---- CDF: pre-horizon change data is gone, new changes flow again
    val helper = ChangeDataFeedHelper(spark, dir, 1000L, 1002L)
    assert(helper.getVersionsForAvailableDeltaLog.contains((1000L, 1002L)))
    t.append(Seq((9, "z")).toDF("id", "name").repartition(1)) // v1003
    val cdf = ChangeDataFeedHelper(spark, dir, 1003L, 1003L).readCDF
    assert(cdf.filter("_change_type = 'insert' AND _commit_version = 1003").count() == 1)
  }
}
