package graft

import org.apache.spark.sql.functions._

/** Plan-quality regression checks (VERDICT r1 item 10): pushdown evidence
  * that used to live only in PLANS.md prose is now asserted, so a
  * refactor that silently breaks parquet pushdown fails the suite. */
class PlanQualitySpec extends SparkSpec {

  private def pushedFiltersNonEmpty(plan: String): Boolean =
    "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined

  test("q01: lineitem date filter reaches the parquet scan") {
    val plan = SparkEntry.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pushedFiltersNonEmpty(plan), plan)
  }

  test("q09: outlier bound filters reach the parquet scan") {
    val plan = SparkEntry.queries("q09_outliers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pushedFiltersNonEmpty(plan), plan)
  }

  test("q15: temporal-split timestamp filter reaches the scan via NanosPushdown") {
    val plan = SparkEntry.queries("q15_temporal_split")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(pushedFiltersNonEmpty(plan), plan)
  }

  test("q62: ranged quantile split has no window/single-partition stage") {
    val plan = SparkEntry.queries("q62_quantile_split_ranged")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("SinglePartition"), plan)
  }

  test("q74: rocAuc rank prefix runs in a PARTITIONED window (VERDICT r2 item 3)") {
    val windows = SparkEntry.queries("q74_roc_auc")(spark, sf)
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty, "expected the rank-prefix window")
    // the DATA-SIZED window (rank prefix, ordered by score) must be
    // partitioned by bucket; the bucket-OFFSET window runs over the
    // ≤`buckets`-row totals aggregate (metadata-sized by construction)
    // and is allowed to be global
    val rankWindows = windows.filter(_.orderSpec.exists(
      _.child.references.exists(_.name == "score")))
    assert(rankWindows.nonEmpty, "expected the score-ordered rank window")
    assert(rankWindows.forall(_.partitionSpec.nonEmpty),
      "global (single-partition) window found in rocAuc's rank prefix — " +
        "the distributed bucketed prefix must partition by bucket")
    val offsetWindows = windows.filterNot(rankWindows.contains)
    assert(offsetWindows.forall(w =>
      w.child.exists {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
          a.groupingExpressions.exists(_.references.exists(_.name == "bucket"))
        case _ => false
      }),
      "an unpartitioned window in rocAuc must consume only the bounded " +
        "per-bucket totals aggregate")
  }

  test("rocAuc on an empty/all-null score frame returns a null-AUC row") {
    import spark.implicits._
    val empty = Seq.empty[(Int, java.lang.Double)].toDF("pos", "score")
    val out = graft.ml.Metrics.rocAuc(empty, "pos", "score").collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("ensemble aggregation: shuffle count does not scale with model count M") {
    import spark.implicits._
    // the union+groupBy design claims ONE aggregation shuffle no matter
    // how many model branches feed it — a merge-per-model plan (the
    // pandas-merge shape) would add an Exchange per upstream
    def up(n: Int) = (1 to 20).map(i => (i.toLong, i * n * 1.0, 0.5))
      .toDF("id", "prediction", "confidence")
    def exchanges(m: Int): Int =
      "Exchange".r.findAllIn(
        graft.ml.Ensemble.Mean("m")((1 to m).map(up), "id")
          .queryExecution.executedPlan.toString).length
    assert(exchanges(3) == exchanges(6),
      "ensemble shuffle count must be M-invariant")
  }

  test("inference cache: keep-last dedup window is key-partitioned") {
    import spark.implicits._
    val cat = new graft.api.Catalog(spark,
      java.nio.file.Files.createTempDirectory("graft-plancache").toString)
    val ep = cat.onboardFormulaModel("pq_m", 0.0, Seq("x" -> 1.0),
      target = "__absent__").toEndpoint("pq-end")
    val cache = new graft.api.InferenceCache(ep, "k")
    cache.inference(Seq((1L, 1.0)).toDF("k", "x"))
    val out = cache.inference(Seq((1L, 1.0), (2L, 2.0)).toDF("k", "x"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage in the cached-inference plan:\n$plan")
  }
}
