package graft

import graft.core.Tables
import graft.eda.Quality
import graft.proximity.{Analytics, Proximity}
import org.apache.spark.sql.functions._

class AnalyticsQualitySpec extends SparkSpec {
  import spark.implicits._

  lazy val emb = Tables.load(spark, sf, "embeddings")
    .withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
    .filter(col("vec_id") < 60)
  lazy val nn = Proximity.knnJoin(emb, emb, "vec_id", "embedding", 4, Proximity.euclidean)

  test("residualFeatures: one row per query id, gap = pred - neighborhood mean") {
    val rows = emb.withColumn("pred", col("label") * lit(1.0))
    val rf = Analytics.residualFeatures(nn, rows, "vec_id", "label", "pred", 4)
    assert(rf.count() == emb.count())
    val r = rf.filter(col("knn_target_mean").isNotNull).head()
    val gap = r.getAs[Double]("prediction") - r.getAs[Double]("knn_target_mean")
    assert(math.abs(r.getAs[Double]("local_pred_gap") - gap) < 1e-9)
  }

  test("proximityGraph: every node keeps at least minEdges edges") {
    val edges = Analytics.proximityGraph(nn, minEdges = 2, extraThreshold = 0.99)
    val degrees = edges.groupBy("src").count().select("count").as[Long].collect()
    assert(degrees.forall(_ >= 2))
    assert(edges.select(min("weight")).head().getDouble(0) >= 0.0 - 1e-9)
  }

  test("laplacianSmoothness: constant signal has zero smoothness") {
    val edges = Analytics.proximityGraph(nn, 2, 0.8)
    val flat = emb.withColumn("label", lit(5))
    val sm = Analytics.laplacianSmoothness(edges, flat, "vec_id", "label")
    assert(sm.agg(max(abs(col("node_smoothness")))).head().getDouble(0) < 1e-12)
    assert(sm.head().getAs[Double]("global_smoothness") == 0.0)
  }

  test("targetGradients: gradient = |target_diff| / distance") {
    val tg = Analytics.targetGradients(nn, emb, "vec_id", "label")
      .filter(col("target_gradient").isNotNull).head()
    val expected = math.abs(tg.getAs[Double]("target_diff")) / tg.getAs[Double]("feature_diff")
    assert(math.abs(tg.getAs[Double]("target_gradient") - expected) < 1e-9)
  }

  test("rowTags: zero-target rows tagged") {
    val tags = Analytics.rowTags(nn, emb, "vec_id", "label", gradientCut = 1e18)
    val zeroIds = emb.filter(col("label") === 0).select("vec_id").as[Long].collect().toSet
    val tagged = tags.filter(array_contains(col("tags"), "zero_target"))
      .select("id").as[Long].collect().toSet
    assert(tagged == zeroIds)
  }

  test("landscapeIsolated returns ~10% of nodes above the 0.9 quantile") {
    val iso = Analytics.landscapeIsolated(nn, 0.9).count()
    assert(iso > 0 && iso <= emb.count() / 5)
  }

  test("targetHealth: pileup mass detected on censored data") {
    val df = (Seq.fill(50)(0.0) ++ (1 to 50).map(_.toDouble)).toDF("t")
    val h = Quality.targetHealth(df, "t").head()
    assert(h.getAs[Double]("min_mass") == 0.5)
    assert(h.getAs[Long]("n_rows") == 100)
  }

  test("detectDrift flags a shifted column and not a stable one") {
    val base = (1 to 1000).map(i => (i.toDouble % 100, 5.0)).toDF("a", "b")
    val cur = (1 to 1000).map(i => (i.toDouble % 100 + 50, 5.0)).toDF("a", "b")
    val d = Quality.detectDrift(cur, base, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("drifted")).toMap
    assert(d("a")); assert(!d("b"))
  }

  test("featureQuality reports null and zero fractions") {
    val df = Seq(Some(0.0), Some(1.0), None, Some(2.0)).toDF("x")
    val fq = Quality.featureQuality(df, Seq("x")).head()
    assert(fq.getAs[Double]("null_frac") == 0.25)
    assert(fq.getAs[Double]("zero_frac") == 0.25)
    assert(fq.getAs[Long]("n_distinct") == 3)
  }

  test("smartSample: union of sample and outliers, no duplicates") {
    val cust = Tables.load(spark, sf, "customer")
    val ss = Quality.smartSample(cust, Seq("c_acctbal"), targetRows = 20)
    assert(ss.count() == ss.dropDuplicates("c_custkey").count())
  }

  test("psiDrift: ~0 for identical distributions, large for a shift") {
    val cust = Tables.load(spark, sf, "customer")
    val base = cust.select("c_acctbal")
    val same = Quality.psiDrift(base, base, Seq("c_acctbal")).head()
    assert(math.abs(same.getAs[Double]("psi")) < 0.01, same.toString)
    val shifted = cust.select((col("c_acctbal") * 2 + 10000).as("c_acctbal"))
    val drift = Quality.psiDrift(shifted, base, Seq("c_acctbal")).head()
    assert(drift.getAs[Double]("psi") > 0.25, drift.toString)
    // multi-column in one call: one row per column
    val two = Quality.psiDrift(
      cust.select(col("c_acctbal"), col("c_nationkey")),
      cust.select(col("c_acctbal"), col("c_nationkey")),
      Seq("c_acctbal", "c_nationkey"))
    assert(two.count() == 2)
    // nulls are excluded, not folded into bucket 1: same non-null
    // distribution + 30% nulls must NOT read as value drift
    val withNulls = base.unionByName(
      spark.range(64).select(lit(null).cast("double").as("c_acctbal")))
    val nullSafe = Quality.psiDrift(withNulls, base, Seq("c_acctbal")).head()
    assert(math.abs(nullSafe.getAs[Double]("psi")) < 0.01, nullSafe.toString)
  }

  test("filterByTags: require/exclude/prefix semantics, null tags dropped") {
    import graft.proximity.Analytics
    val df = Seq(
      (1, Seq("physchem:ro5_compliant", "physchem:veber_compliant")),
      (2, Seq("physchem:ro5_compliant", "curation:exclude:salt")),
      (3, Seq("curation:caution:dye")),
      (4, Seq.empty[String])).toDF("id", "tags")
      .unionByName(Seq((5, null.asInstanceOf[Seq[String]])).toDF("id", "tags"))
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("id").collect().map(_.getInt(0)).toSet
    assert(ids(Analytics.filterByTags(df,
      require = Seq("physchem:ro5_compliant", "physchem:veber_compliant"))) == Set(1))
    assert(ids(Analytics.filterByTags(df,
      excludePrefix = Seq("curation:exclude:"))) == Set(1, 3, 4))
    assert(ids(Analytics.filterByTags(df,
      requirePrefix = Seq("curation:"))) == Set(2, 3))
    assert(ids(Analytics.filterByTags(df,
      require = Seq("physchem:ro5_compliant"),
      exclude = Seq("curation:exclude:salt"))) == Set(1))
    // no filters → everything (including null-tag rows) passes through
    assert(Analytics.filterByTags(df).count() == 5)
  }
}
