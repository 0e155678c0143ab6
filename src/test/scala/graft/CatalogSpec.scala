package graft

import graft.api.Catalog
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Persistent artifact registry + views (VERDICT r1 item 2): the
  * restart-survival contract — a NEW session attached to the same catalog
  * root sees the artifact, its views, its tags, and its cached stats. */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft-catalog").toString

  test("onboard: external table + auto views + ready registry row") {
    val cat = new Catalog(spark, root)
    val ds = cat.onboard("Restart Test", Tables.load(spark, sf, "nation"),
      owner = "alice", input = "nation.parquet")
    assert(ds.name == "restart_test") // sanitized
    assert(spark.table("restart_test").count() == 25)
    // auto-created display/computation views, ___-named (view.py:260-290)
    assert(spark.table("restart_test___display").count() == 25)
    assert(spark.table("restart_test___computation").columns.nonEmpty)
    assert(cat.registry.getStatus("restart_test") == "ready")
    assert(cat.registry.getOwner("restart_test") == "alice")
    assert(cat.registry.getInput("restart_test") == "nation.parquet")
    assert(cat.registry.healthCheck("restart_test").isEmpty)
  }

  test("registry under two concurrent writers + live reader: no lost update, no torn read") {
    // the reference retries Athena DDL 5× on ConcurrentModification
    // (athena_source.py:253-288); the registry's lockfile + swap must give
    // the same guarantee under simultaneous onboarding and tagging
    // (VERDICT r4 item 8)
    val croot = java.nio.file.Files.createTempDirectory("graft-concur").toString
    val reg0 = new graft.stores.Registry(spark, croot)
    reg0.onboardRow("shared", "model", "seed", "owner0")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val onboarder = Future {
      val r = new graft.stores.Registry(spark, croot)
      (1 to 10).foreach { i =>
        r.onboardRow(s"art_$i", "data_source", s"in_$i", "alice",
          Map("k1" -> s"v$i", "k2" -> "x"))
      }
    }
    val tagger = Future {
      val r = new graft.stores.Registry(spark, croot)
      (1 to 10).foreach { i =>
        r.addTag("shared", s"tag_$i")
        r.appendMetaList("shared", "runs", s"run_$i")
      }
    }
    val reader = Future {
      val r = new graft.stores.Registry(spark, croot)
      var torn = List.empty[String]
      while (!stop.get()) {
        // every read must succeed (retry guard) and see a CONSISTENT row:
        // onboardRow is one swap, so a visible artifact is fully formed
        val row = r.get("shared")
        if (row.isEmpty) torn ::= "shared row vanished"
        row.foreach { a =>
          if (a.status != "ready") torn ::= s"half-initialized: $a"
          // tags are appended in order — a torn read would show gaps
          val idx = a.tags.filter(_.startsWith("tag_")).map(_.drop(4).toInt)
          if (idx != idx.sorted) torn ::= s"tag order broken: ${a.tags}"
        }
        r.listNames().foreach { n =>
          if (!n.matches("shared|art_\\d+")) torn ::= s"phantom name $n"
        }
      }
      torn
    }
    Await.result(Future.sequence(Seq(onboarder, tagger)), 180.seconds)
    stop.set(true)
    val torn = Await.result(reader, 30.seconds)
    assert(torn.isEmpty, s"reader observed: ${torn.take(5)}")
    val fin = new graft.stores.Registry(spark, croot)
    assert(fin.listNames() == ("shared" +: (1 to 10).map(i => s"art_$i")).sorted,
      "lost onboard")
    assert(fin.getTags("shared") == (1 to 10).map(i => s"tag_$i"), "lost tag")
    assert(fin.getMeta("shared")("runs") ==
      (1 to 10).map(i => s"run_$i").mkString(","), "lost meta append")
    (1 to 10).foreach { i =>
      assert(fin.getMeta(s"art_$i") == Map("k1" -> s"v$i", "k2" -> "x"))
      assert(fin.getStatus(s"art_$i") == "ready")
    }
  }

  test("registry: ordered duplicate-free tags, health tags, meta upsert") {
    val cat = new Catalog(spark, root)
    cat.registry.addTag("restart_test", "prod")
    cat.registry.addTag("restart_test", "v2")
    cat.registry.addTag("restart_test", "prod") // dup ignored, order kept
    assert(cat.registry.getTags("restart_test") == Seq("prod", "v2"))
    cat.registry.removeTag("restart_test", "v2")
    assert(cat.registry.getTags("restart_test") == Seq("prod"))
    cat.registry.addTag("restart_test", "v2")
    cat.registry.upsertMeta("restart_test", Map("note" -> "hello"))
    assert(cat.registry.summary("restart_test")("note") == "hello")
    assert(cat.registry.summary("restart_test")("owner") == "alice")
    // not-ready artifacts fail the health check (artifact.py:395-409)
    cat.registry.upsert("half_baked", "data_source")
    assert(cat.registry.healthCheck("half_baked") == Seq("needs_onboard"))
    assert(cat.registry.getHealthTags("half_baked") == Seq("needs_onboard"))
  }

  test("restart survival: new session + attach sees tables, views, tags, stats") {
    val cat = new Catalog(spark, root)
    val ds = cat.dataSource("restart_test")
    val statsBefore = ds.descriptiveStats().orderBy("column_name").collect()
    assert(cat.readStat("restart_test", "descriptive_stats").isDefined)

    // simulate restart: wipe the (shared, in-memory) session catalog so
    // the only surviving state is the catalog directory on disk
    spark.sql("DROP VIEW IF EXISTS restart_test___display")
    spark.sql("DROP VIEW IF EXISTS restart_test___computation")
    spark.sql("DROP TABLE IF EXISTS restart_test")

    val s2 = spark.newSession() // fresh session state, empty temp views
    val cat2 = new Catalog(s2, root)
    cat2.attach()
    assert(s2.table("restart_test").count() == 25)
    assert(s2.table("restart_test___display").count() == 25)
    assert(s2.sql("SELECT n_name FROM restart_test___computation").count() == 25)
    assert(cat2.registry.getTags("restart_test") == Seq("prod", "v2"))
    assert(cat2.registry.getOwner("restart_test") == "alice")
    assert(cat2.registry.getStatus("restart_test") == "ready")
    // cached stats round-trip: the new session reads the persisted stat,
    // not a recomputation (values must match exactly)
    val ds2 = cat2.dataSource("restart_test")
    val statsAfter = ds2.descriptiveStats().orderBy("column_name").collect()
    assert(statsAfter.toSeq == statsBefore.toSeq)
  }

  test("FeatureSet onboarding: id/event-time persisted, reopenable after restart") {
    val cat = new Catalog(spark, root)
    val raw = Seq((7, "a", "2024-01-01T00:00:00.000Z"),
      (7, "b", "2024-02-01T00:00:00.000Z"),
      (8, "c", "2024-01-15T00:00:00.000Z")).toDF("rec_id", "v", "event_time")
    val fs = cat.onboardFeatures("My Features", raw, idColumn = "rec_id")
    assert(fs.name == "my_features")
    assert(cat.registry.get("my_features").map(_.artifact_type).contains("feature_set"))
    assert(fs.snapshot().count() == 2) // latest per id
    // restart: fresh session, attach, reopen by name only
    val s2 = spark.newSession()
    val cat2 = new Catalog(s2, root)
    assert(cat2.attach().isEmpty)
    val fs2 = cat2.featureSet("my_features")
    assert(fs2.idColumn == "rec_id")
    val snap = fs2.snapshot().orderBy("rec_id").collect()
    assert(snap.length == 2 && snap(0).getAs[String]("v") == "b")
    assert(s2.table("my_features___display").count() == 3)
  }

  test("delete removes views, table, data, stats, and the registry row") {
    val cat = new Catalog(spark, root)
    val ds = cat.onboard("doomed", Tables.load(spark, sf, "region"))
    ds.descriptiveStats() // persist a stat so delete has one to remove
    assert(spark.catalog.tableExists("doomed"))
    cat.delete("doomed")
    assert(!spark.catalog.tableExists("doomed"))
    assert(!spark.catalog.tableExists("doomed___display"))
    assert(cat.registry.get("doomed").isEmpty)
    assert(cat.readStat("doomed", "descriptive_stats").isEmpty)
    val fs = new org.apache.hadoop.fs.Path(cat.tablePath("doomed"))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(cat.tablePath("doomed"))))
    // attach() in a new session no longer sees it
    val s2 = spark.newSession()
    val cat2 = new Catalog(s2, root)
    cat2.attach()
    assert(!s2.catalog.tableExists("doomed"))
  }

  test("catalog list + dropView") {
    val cat = new Catalog(spark, root)
    assert(cat.registry.listNames().contains("restart_test"))
    assert(cat.registry.list().filter(col("name") === "restart_test").count() == 1)
    cat.createView("restart_test", "tiny", "SELECT n_nationkey FROM `restart_test` LIMIT 5")
    assert(spark.table("restart_test___tiny").count() == 5)
    cat.dropView("restart_test", "tiny")
    assert(!cat.registry.getMeta("restart_test").contains("graft_view_sql/tiny"))
  }
}
