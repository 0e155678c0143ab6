package graft

import graft.ml.UQ
import org.apache.spark.sql.functions._

/** UQ model v0 (VERDICT r1 item 5): split-conformal coverage on held-out
  * heteroscedastic data, calibrator behavior, and save/load round-trip. */
class UQSpec extends SparkSpec {
  import spark.implicits._

  /** y = 2x + ε with ε ~ N(0, σ(x)), σ(x) = 0.5 + x/10 — heteroscedastic
    * so the conformal scale and isotonic calibrator both have signal. */
  private def synth(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val x = rnd.nextDouble() * 10
      val sigma = 0.5 + x / 10
      (x, 2 * x + rnd.nextGaussian() * sigma, 2 * x, sigma)
    }.toDF("x", "y", "pred", "std")
  }

  test("UQ v0: conformal intervals hit target coverage on held-out data") {
    val m = UQ.fit(synth(42, 3000), "y", "pred", "std")
    val out = m.predict(synth(7, 2000), "pred", "std").cache()
    val n = out.count().toDouble
    val cov95 = out.filter(col("y").between(col("q_025"), col("q_975"))).count() / n
    val cov80 = out.filter(col("y").between(col("q_10"), col("q_90"))).count() / n
    val cov50 = out.filter(col("y").between(col("q_25"), col("q_75"))).count() / n
    assert(cov95 >= 0.92 && cov95 <= 0.985, s"95% interval covered $cov95")
    assert(cov80 >= 0.75 && cov80 <= 0.86, s"80% interval covered $cov80")
    assert(cov50 >= 0.44 && cov50 <= 0.57, s"50% interval covered $cov50")
    // intervals nest: wider level ⊇ narrower level
    assert(out.filter(col("q_025") > col("q_05")).count() == 0)
    assert(out.filter(col("q_975") < col("q_95")).count() == 0)
    assert(out.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    out.unpersist()
  }

  test("UQ v0: higher ensemble std → larger expected residual, lower confidence") {
    val m = UQ.fit(synth(11, 2000), "y", "pred", "std")
    val lo = m.expectedResidual(10.0, 0.5)
    val hi = m.expectedResidual(10.0, 1.5)
    assert(hi >= lo, s"isotonic calibrator must be monotone: $lo vs $hi")
    assert(m.confidence(lo) >= m.confidence(hi))
  }

  test("UQ v0: save/load round-trips the model and its predictions") {
    val dir = java.nio.file.Files.createTempDirectory("uq-model").toString
    val m = UQ.fit(synth(3, 1500), "y", "pred", "std")
    m.save(spark, dir)
    val m2 = UQ.load(spark, dir)
    assert(m2.scaleFactors == m.scaleFactors)
    assert(m2.binEdges.toSeq == m.binEdges.toSeq)
    assert(m2.residualPercentiles.toSeq == m.residualPercentiles.toSeq)
    val probe = synth(5, 50)
    val a = m.predict(probe, "pred", "std").orderBy("x").collect()
    val b = m2.predict(probe, "pred", "std").orderBy("x").collect()
    assert(a.toSeq == b.toSeq)
  }

  /** v1 synthetic: difficulty tracked by knn_target_std — noise scale IS
    * the neighborhood std, so the RF error model has real signal. */
  private def synthV1(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val pred = rnd.nextDouble() * 10
      val kts = 0.2 + rnd.nextDouble() * 2           // neighborhood std
      val y = pred + rnd.nextGaussian() * kts
      (i.toLong, y, pred, 0.5, 0.1 + rnd.nextDouble(), kts, pred - y * 0.1)
    }.toDF("id", "target", "prediction", "prediction_std",
      "knn_distance", "knn_target_std", "local_pred_gap")
  }

  test("UQ v1: normalized conformal coverage; harder rows get wider intervals") {
    val m = graft.ml.UQ.fitV1(synthV1(21, 3000), "target", "prediction", "prediction_std")
    val out = m.predict(synthV1(8, 2000), "prediction", "prediction_std").cache()
    val n = out.count().toDouble
    val cov95 = out.filter(col("target").between(col("q_025"), col("q_975"))).count() / n
    val cov80 = out.filter(col("target").between(col("q_10"), col("q_90"))).count() / n
    assert(cov95 >= 0.91 && cov95 <= 0.99, s"95% interval covered $cov95")
    assert(cov80 >= 0.73 && cov80 <= 0.88, s"80% interval covered $cov80")
    // local adaptivity: high knn_target_std rows must get wider intervals
    val widths = out.withColumn("w", col("q_975") - col("q_025"))
    val hard = widths.filter(col("knn_target_std") > 1.5).agg(avg("w")).head().getDouble(0)
    val easy = widths.filter(col("knn_target_std") < 0.5).agg(avg("w")).head().getDouble(0)
    assert(hard > easy, s"expected adaptive widths: hard=$hard easy=$easy")
    out.unpersist()
  }

  test("UQ v1: unresolved-proximity rows keep q_50 but null confidence/intervals") {
    val m = graft.ml.UQ.fitV1(synthV1(31, 1000), "target", "prediction", "prediction_std")
    val probe = synthV1(9, 10)
      .withColumn("knn_distance",
        when(col("id") === 1, lit(null)).otherwise(col("knn_distance")))
    val out = m.predict(probe, "prediction", "prediction_std")
    val missing = out.filter(col("id") === 1).head()
    assert(missing.isNullAt(missing.fieldIndex("confidence")))
    assert(missing.isNullAt(missing.fieldIndex("q_025")))
    assert(!missing.isNullAt(missing.fieldIndex("q_50")), "q_50 passes through")
    assert(out.filter(col("id") =!= 1)
      .filter(col("confidence").isNull).count() == 0)
  }

  test("UQ v1: save/load round-trips predictions") {
    val dir = java.nio.file.Files.createTempDirectory("uq-v1").toString
    val m = graft.ml.UQ.fitV1(synthV1(5, 800), "target", "prediction", "prediction_std")
    m.save(spark, dir)
    val m2 = graft.ml.UQ.loadV1(spark, dir)
    assert(m2.scaleFactors == m.scaleFactors)
    val probe = synthV1(6, 40)
    val a = m.predict(probe, "prediction", "prediction_std").orderBy("id").collect()
    val b = m2.predict(probe, "prediction", "prediction_std").orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("UQ v2: AD confidence high inside the training cloud, low for outliers") {
    val rnd = new scala.util.Random(17)
    // 200 in-domain points (tight cluster, consistent targets) + the
    // queries: id 9001 sits in the cluster, id 9002 far outside
    val train = (1 to 200).map(i =>
      (i.toLong, Seq(rnd.nextGaussian() * 0.5, rnd.nextGaussian() * 0.5),
        5.0 + rnd.nextGaussian() * 0.1))
    val far = Seq((9001L, Seq(0.1, 0.1), 5.0), (9002L, Seq(50.0, 50.0), 5.0))
    val all = (train ++ far).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val nn = graft.proximity.Proximity.knnJoin(all, all, "vec_id", "embedding",
      10, graft.proximity.Proximity.euclidean)
    val trainIds = all.filter(col("vec_id") <= 200)
    val m = graft.ml.UQ.fitV2(
      nn.join(trainIds.select(col("vec_id").as("id")), Seq("id"), "left_semi"),
      all, "vec_id", "label", k = 10)
    val out = m.predict(all.filter(col("vec_id") > 9000), nn, all, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    val inDomain = out(9001L).getAs[Double]("confidence")
    val outOfDomain = out(9002L).getAs[Double]("confidence")
    assert(inDomain > outOfDomain,
      s"in-domain $inDomain must beat out-of-domain $outOfDomain")
    assert(outOfDomain <= 0.05, s"far outlier should rank ~worst: $outOfDomain")
    // intervals come from neighbor targets (≈5.0), not the prediction
    assert(math.abs(out(9001L).getAs[Double]("q_50") - 5.0) < 0.5)
  }

  test("UQ v2: save/load round-trip and missing-query null row") {
    val dir = java.nio.file.Files.createTempDirectory("uq-v2").toString
    val e = Seq.tabulate(60)(i =>
      (i.toLong, Seq(i / 10.0, i % 10 / 10.0), i.toDouble))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val nn = graft.proximity.Proximity.knnJoin(e, e, "vec_id", "embedding",
      5, graft.proximity.Proximity.euclidean)
    val m = graft.ml.UQ.fitV2(nn, e, "vec_id", "label", k = 5)
    m.save(spark, dir)
    val m2 = graft.ml.UQ.loadV2(spark, dir)
    assert(m2.k == m.k)
    assert(m2.distancePercentiles.toSeq == m.distancePercentiles.toSeq)
    // a query id with no neighbor rows stays present, scores null
    val ghost = Seq((999L, Seq(0.0, 0.0), 0.0))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val out = m2.predict(ghost, nn, e, "vec_id", "label")
    assert(out.count() == 1)
    assert(out.filter(col("confidence").isNull).count() == 1)
  }

  test("UQ v0: dirty input — nulls dropped, empty calibration rejected") {
    val dirty = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 1.1, 0.5), (null, 1.0, 0.5), (2.0, null, 0.5), (3.0, 3.2, 0.4),
      (4.0, 3.9, 0.3), (5.0, 5.1, 0.2)).toDF("y", "pred", "std")
    val m = UQ.fit(dirty, "y", "pred", "std") // 4 clean rows suffice
    assert(m.scaleFactors.nonEmpty)
    intercept[IllegalArgumentException] {
      UQ.fit(Seq.empty[(Double, Double, Double)].toDF("y", "pred", "std"),
        "y", "pred", "std")
    }
  }
}
