package graft

import graft.api.{ArtifactCache, Catalog}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Cached artifact handles (cached/cached_artifact_mixin.py,
  * cached_data_source.py, cached_model.py, cached_endpoint.py): repeat
  * calls within the TTL do no work at all, staleness follows the
  * registry modified stamp, and evicted frames release their
  * checkpointed blocks. */
class CachedArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def newCatalog() = new Catalog(spark,
    java.nio.file.Files.createTempDirectory("graft-cached").toString)

  /** Count Spark jobs started while running `f` (listener-bus async —
    * spin briefly for the tail). */
  private def jobsDuring[T](f: => T): (T, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = n.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      Thread.sleep(300) // let queued listener events drain
      (r, n.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("CachedDataSource: second stats/meta call within TTL runs zero jobs") {
    val cat = newCatalog()
    val df = (1 to 50).map(i => (i.toLong, i * 1.5)).toDF("id", "x")
    cat.onboard("cds_src", df)
    val cds = cat.cachedDataSource("cds_src")
    val stats1 = cds.descriptiveStats()
    stats1.collect() // materialize once
    cds.summary()
    val ((stats2, sum2), jobs) = jobsDuring {
      (cds.descriptiveStats(), cds.summary())
    }
    assert(jobs == 0, s"second calls within TTL ran $jobs Spark jobs")
    assert(sum2("name") == "cds_src")
    // the returned frame is the materialized checkpoint, not a re-plan
    // over parquet — collecting it scans the block manager, not files
    val plan = stats2.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"), plan)
  }

  test("CachedModel/CachedEndpoint: metadata memoized, inference passes through") {
    val cat = newCatalog()
    val df = (1 to 40).map(i => (i.toLong, i.toDouble, 2.0 * i + 1)).toDF("id", "x", "y")
    val m = cat.onboardFormulaModel("cm", 1.0, Seq("x" -> 2.0), target = "y")
    m.toEndpoint("cm-end").inference(df, Some("run1"), Some("id"))
    val cm = cat.cachedModel("cm")
    cm.getInferenceMetrics("run1").get.collect()
    cm.modelType; cm.listInferenceRuns() // warm every key under test
    val (_, jobs) = jobsDuring {
      assert(cm.modelType == "regressor")
      assert(cm.getInferenceMetrics("run1").isDefined)
      assert(cm.listInferenceRuns().contains("run1"))
    }
    // metadata answers come from the cache; the Option re-wrap itself
    // runs nothing
    assert(jobs == 0, s"cached metadata calls ran $jobs jobs")
    val ce = cat.cachedEndpoint("cm-end")
    assert(ce.modelName == "cm")
    assert(ce.inference(df).count() == 40) // passthrough, never cached
  }

  test("CachedFeatureSet: meta and stats memoized over the reopened handle") {
    val cat = newCatalog()
    val df = (1 to 30).map(i => (i.toLong, i * 0.5)).toDF("rid", "x")
    cat.onboardFeatures("cfs_src", df, idColumn = "rid")
    val cfs = cat.cachedFeatureSet("cfs_src")
    assert(cfs.idColumn == "rid")
    cfs.descriptiveStats().collect()
    cfs.columnNames
    val (_, jobs) = jobsDuring {
      cfs.descriptiveStats(); cfs.columnNames; cfs.idColumn
    }
    assert(jobs == 0, s"cached FeatureSet calls ran $jobs jobs")
    assert(cfs.featureSet.snapshot().count() == 30) // live passthrough
  }

  test("modified-stamp staleness: re-onboard invalidates past the TTL") {
    val cat = newCatalog()
    cat.onboard("stale_src", Seq((1L, 1.0)).toDF("id", "x"))
    val cache = new ArtifactCache(cat, ttlMs = 0) // every access re-checks the stamp
    var fetches = 0
    def get(): String = cache.cached("t/stale_src/cols", Some("stale_src")) {
      fetches += 1; cat.dataSource("stale_src").columnNames.mkString(",")
    }
    assert(get() == "id,x" && fetches == 1)
    assert(get() == "id,x" && fetches == 1) // stamp unchanged → cached
    Thread.sleep(5) // registry stamps are millisecond-resolution
    cat.onboard("stale_src", Seq((1L, 1.0, "a")).toDF("id", "x", "tag"))
    assert(get() == "id,x,tag", "re-onboard must invalidate")
    assert(fetches == 2)
  }

  test("review: re-onboard invalidates THROUGH the handle (no pinned stale memo)") {
    // a zero-TTL catalog makes every access take the modified-stamp path
    val cat = new Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-cached0").toString) {
      override protected def artifactCacheTtlMs: Long = 0L
    }
    cat.onboard("inv_src", (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "x"))
    val cds = cat.cachedDataSource("inv_src")
    assert(cds.columnNames == Seq("id", "x"))
    assert(cds.numRows() == 10)
    Thread.sleep(5)
    // re-onboard with a different shape: the SAME handle must refetch
    // fresh (a pinned lazy DataSource would re-serve its own stats memo)
    cat.onboard("inv_src", (1 to 7).map(i => (i.toLong, i * 1.0, "t")).toDF("id", "x", "tag"))
    assert(cds.columnNames == Seq("id", "x", "tag"), "stale columns after re-onboard")
    assert(cds.numRows() == 7, "stale count after re-onboard")
    assert(cds.descriptiveStats().count() == 2) // id + x numeric
  }

  test("review: Option-wrapped frames are materialized results, not lazy plans") {
    val cat = newCatalog()
    val df = (1 to 30).map(i => (i.toLong, i.toDouble, 2.0 * i)).toDF("id", "x", "y")
    val m = cat.onboardFormulaModel("om", 0.0, Seq("x" -> 2.0), target = "y")
    m.toEndpoint("om-end").inference(df, Some("run1"), Some("id"))
    val cm = cat.cachedModel("om")
    val metrics = cm.getInferenceMetrics("run1").get
    // the cached Option's frame must be the materialized checkpoint — a
    // lazy plan would re-read the metrics parquet on every collect
    val plan = metrics.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"), plan)
    val (_, jobs) = jobsDuring { cm.getInferenceMetrics("run1").get.collect() }
    assert(jobs <= 1, s"collect on cached frame ran $jobs jobs") // block-manager read
  }

  test("refresh() defers release; clear() frees; retire queue is bounded (ADVICE r4)") {
    val cat = newCatalog()
    cat.onboard("rel_src", (1 to 20).map(i => (i.toLong, i * 2.0)).toDF("id", "x"))
    val cds = cat.cachedDataSource("rel_src")
    val stats = cds.descriptiveStats()
    stats.collect()
    val rddId = stats.queryExecution.logical.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.get
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "checkpointed frame should be persisted while cached")
    cds.refresh()
    // DEFERRED release: a caller still holding `stats` must be able to
    // act on it after a refresh — localCheckpoint truncates lineage, so
    // an eager unpersist here would strand them (ADVICE r4)
    assert(spark.sparkContext.getPersistentRDDs.contains(rddId),
      "refresh must retire, not eagerly release, the displaced checkpoint")
    assert(stats.count() == 2, "displaced frame must stay consumable")
    // clear() is the eager release point: retired blocks go too
    cat.artifactCache.clear()
    assert(!spark.sparkContext.getPersistentRDDs.contains(rddId),
      "clear must free retired checkpoints (ADVICE r3: no accumulation)")

    // the retire queue is BOUNDED: past retireCap displacements the
    // oldest retired frame is freed, so a short-TTL long-lived session
    // cannot accumulate checkpointed RDDs without limit
    val ac = new graft.api.ArtifactCache(cat, ttlMs = 0L, retireCap = 2)
    val ids = (1 to 4).map { _ =>
      val df = ac.cached[org.apache.spark.sql.DataFrame]("k") {
        (1 to 5).map(i => (i, i)).toDF("a", "b")
      }
      df.count()
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.get
    }
    assert(ids.distinct.size == 4, "ttl=0 must recompute each access")
    assert(!spark.sparkContext.getPersistentRDDs.contains(ids(0)),
      "overflowed retiree must be released")
    assert(Seq(ids(1), ids(2), ids(3)).forall(
      spark.sparkContext.getPersistentRDDs.contains),
      "recent retirees and the live entry stay consumable")
  }
}
