package graft

import org.scalatest.funspec.AnyFunSpec
import org.apache.spark.sql.functions._

import graft.tables._

class IdentityColumnSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def idProp(start: Long, step: Long) =
    Map(GraftTable.IdentityPropertyPrefix + "id" -> s"$start,$step")

  describe("identity columns") {
    it("assigns dense ids from start and continues across commits; high-water advances") {
      val t = GraftTable.create(spark, tmpTableDir("ident-basic"),
        Seq("a", "b", "c").toDF("name"), properties = idProp(1, 1))
      val ids0 = t.toDF.select("id").as[Long].collect().sorted
      assert(ids0.toSeq == Seq(1L, 2L, 3L))
      t.append(Seq("d", "e").toDF("name"))
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.toDF.select("id").as[Long].collect().sorted.toSeq == (1L to 5L))
      assert(t2.snapshot.metadata.properties(GraftTable.identityHighKey("id")) == "5")
    }

    it("respects custom start/step and negative steps") {
      val t = GraftTable.create(spark, tmpTableDir("ident-step"),
        Seq("a", "b", "c").toDF("name"), properties = idProp(1000, 10))
      assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1000L, 1010L, 1020L))
      val tn = GraftTable.create(spark, tmpTableDir("ident-neg"),
        Seq("a", "b").toDF("name"), properties = idProp(-1, -1))
      assert(tn.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(-2L, -1L))
      assert(tn.snapshot.metadata.properties(GraftTable.identityHighKey("id")) == "-2")
    }

    it("stays dense and unique across a multi-partition frame") {
      val df = (1 to 1000).map(i => s"row$i").toDF("name").repartition(7)
      val t = GraftTable.create(spark, tmpTableDir("ident-part"), df, properties = idProp(1, 1))
      val ids = t.toDF.select("id").as[Long].collect().sorted
      assert(ids.toSeq == (1L to 1000L))
      t.append((1 to 500).map(i => s"more$i").toDF("name").repartition(3))
      val all = GraftTable.forPath(spark, t.path).toDF.select("id").as[Long].collect().sorted
      assert(all.toSeq == (1L to 1500L))
    }

    it("a provided column passes through untouched (BY DEFAULT semantics)") {
      val t = GraftTable.create(spark, tmpTableDir("ident-provided"),
        Seq((100L, "a"), (200L, "b")).toDF("id", "name"), properties = idProp(1, 1))
      assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(100L, 200L))
      // high-water never moved, so a later generated append starts at 1
      t.append(Seq("c").toDF("name"))
      val ids = GraftTable.forPath(spark, t.path).toDF.select("id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 100L, 200L))
    }

    it("SYNC IDENTITY re-seats the mark on the actual extremum") {
      val t = GraftTable.create(spark, tmpTableDir("ident-sync"),
        Seq((100L, "a"), (200L, "b")).toDF("id", "name"), properties = idProp(1, 1))
      // explicit BY-DEFAULT values overtook the (unset) mark: sync realigns
      val v = t.syncIdentity()
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.version == v)
      assert(t2.snapshot.metadata.properties(GraftTable.identityHighKey("id")) == "200")
      assert(t2.history().head._2.operation == "SYNC IDENTITY")
      // generated values continue past the synced mark — no collision
      t2.append(Seq("c").toDF("name"))
      assert(GraftTable.forPath(spark, t.path).toDF.select("id").as[Long]
        .collect().sorted.toSeq == Seq(100L, 200L, 201L))
      // an extremum AT the mark moves nothing: no-op, no commit
      val t3 = GraftTable.forPath(spark, t.path)
      assert(t3.syncIdentity() == t3.version)
      // deletes never move the mark BACK (freed values are not reissued)
      graft.operators.TableOps.delete(t3, Some("id = 201"))
      val t4 = GraftTable.forPath(spark, t.path)
      assert(t4.syncIdentity() == t4.version)
      t4.append(Seq("d").toDF("name"))
      assert(GraftTable.forPath(spark, t.path).toDF.select("id").as[Long]
        .collect().sorted.toSeq == Seq(100L, 200L, 202L))
      // a non-identity column refuses loudly
      val e = intercept[IllegalArgumentException] {
        GraftTable.forPath(spark, t.path).syncIdentity(Seq("name"))
      }
      assert(e.getMessage.contains("not an identity column"), e.getMessage)
    }

    it("SYNC IDENTITY follows a negative step via min(); SQL surface works") {
      val t = GraftTable.create(spark, tmpTableDir("ident-sync-neg"),
        Seq((-50L, "a")).toDF("id", "name"), properties = idProp(-1, -1))
      spark.sql(s"ALTER TABLE '${t.path}' ALTER COLUMN id SYNC IDENTITY")
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.snapshot.metadata.properties(GraftTable.identityHighKey("id")) == "-50")
      t2.append(Seq("b").toDF("name"))
      assert(GraftTable.forPath(spark, t.path).toDF.select("id").as[Long]
        .collect().sorted.toSeq == Seq(-51L, -50L))
    }

    it("an empty append does not advance the high-water mark") {
      val t = GraftTable.create(spark, tmpTableDir("ident-empty"),
        Seq("a").toDF("name"), properties = idProp(1, 1))
      t.append(Seq.empty[String].toDF("name"))
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.snapshot.metadata.properties(GraftTable.identityHighKey("id")) == "1")
      t2.append(Seq("b").toDF("name"))
      assert(GraftTable.forPath(spark, t.path).toDF.select("id").as[Long].collect().sorted.toSeq
        == Seq(1L, 2L))
    }

    it("a column literally named `high` is a definition, not bookkeeping") {
      val defs = GraftTable.identityColumnsOf(Map(
        "graft.identity.high" -> "1,1",
        "graft.identity.id" -> "5,2",
        "graft.identity.id.high" -> "9"))
      assert(defs == Map("high" -> ((1L, 1L)), "id" -> ((5L, 2L))))
      val t = GraftTable.create(spark, tmpTableDir("ident-high"),
        Seq("a", "b").toDF("name"),
        properties = Map(GraftTable.IdentityPropertyPrefix + "high" -> "1,1"))
      assert(t.toDF.select("high").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    }

    it("unsetting an identity definition leaves an orphaned mark the parser ignores") {
      val t = GraftTable.create(spark, tmpTableDir("ident-unset"),
        Seq("a", "b").toDF("name"), properties = idProp(1, 1))
      // the first write recorded graft.identity.id.high; dropping only the
      // DEFINITION must not make the table unwritable
      t.unsetProperties(Set(GraftTable.IdentityPropertyPrefix + "id"))
      val t2 = GraftTable.forPath(spark, t.path)
      // generated values branded id NOT NULL; without the definition no
      // fill exists, so a narrower append needs the brand relaxed first
      // (the NOT NULL refusal names exactly this remedy)
      t2.setColumnNullability("id", nullable = true)
      t2.append(Seq("c").toDF("name"))
      val rows = GraftTable.forPath(spark, t.path).toDF
      assert(rows.count() == 3)
      // no identity generation anymore: the appended row's id is null
      assert(rows.filter(col("id").isNull).count() == 1)
    }

    it("rejects malformed identity property values") {
      intercept[IllegalArgumentException] {
        GraftTable.identityColumnsOf(Map("graft.identity.id" -> "nope"))
      }
      intercept[IllegalArgumentException] {
        GraftTable.identityColumnsOf(Map("graft.identity.id" -> "1,0"))
      }
    }

    it("identity composes with partitioned tables") {
      val df = Seq(("x", 1), ("y", 2), ("x", 3), ("y", 4)).toDF("grp", "v")
      val t = GraftTable.create(spark, tmpTableDir("ident-tablepart"), df,
        partitionColumns = Seq("grp"), properties = idProp(1, 1))
      val ids = t.toDF.select("id").as[Long].collect().sorted
      assert(ids.toSeq == (1L to 4L))
    }
  }
}
