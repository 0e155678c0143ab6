package graft

import graft.api.{Catalog, ModelComparison}
import graft.eda.Quality
import graft.ml.Models
import org.apache.spark.sql.functions._

/** Distribution-shift statistics (utils/distribution_stats.py), the
  * champion/challenger comparison (utils/model_comparison.py) and
  * multi-task weights (utils/multi_task.py). */
class DistributionCompareSpec extends SparkSpec {
  import spark.implicits._

  test("ksTest: identical samples → statistic 0, no shift; disjoint → 1") {
    val a = (1 to 50).map(_.toDouble).toDF("v")
    val same = Quality.ksTest(a, a, "v").head()
    assert(same.getDouble(0) == 0.0)
    assert(!same.getBoolean(2))
    val b = (101 to 150).map(_.toDouble).toDF("v")
    val far = Quality.ksTest(a, b, "v").head()
    assert(far.getDouble(0) == 1.0) // disjoint supports: max ECDF gap = 1
    assert(far.getBoolean(2) && far.getDouble(1) < 0.05)
  }

  test("ksTest matches the hand-computed two-sample statistic with ties") {
    // a = {1,2,2,3}, b = {2,3,4}: ECDFs step at 1,2,3,4 →
    //   x=1: |1/4 - 0|    = .25
    //   x=2: |3/4 - 1/3|  = 5/12 ≈ .416667  ← max
    //   x=3: |1 - 2/3|    = 1/3
    //   x=4: |1 - 1|      = 0
    val a = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    assert(Quality.ksTest(a, b, "v").head().getDouble(0) == 0.416667)
  }

  test("jsDivergence: identical → ~0 jsd/psi; shifted → positive, jsd ≤ 1") {
    val a = (1 to 100).map(i => (i % 10) / 10.0).toDF("v")
    val same = Quality.jsDivergence(a, a, "v").head()
    assert(math.abs(same.getDouble(0)) < 1e-9)
    assert(math.abs(same.getDouble(1)) < 1e-9)
    val b = (1 to 100).map(i => ((i % 10) / 10.0 + 0.4) % 1.0).toDF("v")
    val diff = Quality.jsDivergence(a, b, "v").head()
    assert(diff.getDouble(0) > 0.0 && diff.getDouble(0) <= 1.0)
    assert(diff.getDouble(1) > 0.0)
  }

  test("ModelComparison: delta row is metrics-aware (lower-is-better flipped)") {
    val root = java.nio.file.Files.createTempDirectory("graft-mcomp").toString
    val cat = new Catalog(spark, root)
    val df = (1 to 40).map(i => (i.toLong, i.toDouble, 2.0 * i + 1))
      .toDF("id", "x", "y")
    // model A is exact (errors 0); model B is off by a constant 2
    val ma = cat.onboardFormulaModel("good", 1.0, Seq("x" -> 2.0), target = "y")
    val mb = cat.onboardFormulaModel("bad", 3.0, Seq("x" -> 2.0), target = "y")
    ma.toEndpoint("good-end").inference(df, Some("run1"), Some("id"))
    mb.toEndpoint("bad-end").inference(df, Some("run1"), Some("id"))
    val cmp = ModelComparison.compare(ma, mb, "run1").get.collect()
    assert(cmp.map(_.getString(0)).toSeq == Seq("good", "bad", "delta"))
    val cols = ModelComparison.compare(ma, mb, "run1").get.columns
    val rmseIdx = cols.indexOf("rmse"); val r2Idx = cols.indexOf("r2")
    val delta = cmp(2)
    // B is WORSE: rmse delta = a−b = 0−2 = −2; r2 delta = b−a < 0
    assert(delta.getDouble(rmseIdx) == -2.0)
    assert(delta.getDouble(r2Idx) < 0.0)
    // missing run → None
    assert(ModelComparison.compare(ma, mb, "ghost").isEmpty)
  }

  test("uqMetrics: Gaussian-bounds coverage, widths, CRPS, NaN guard") {
    import graft.ml.UQMetrics
    // pred=0, std=1: y∈{0, 0.5, 3} → 68% covers 2/3, 95% covers 2/3
    // (3 > 1.96); a NaN row must be dropped, not poison the medians
    val df = Seq((0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (3.0, 0.0, 1.0),
      (Double.NaN, 0.0, 1.0)).toDF("y", "prediction", "prediction_std")
    val m = UQMetrics.uqMetrics(df, "y").head()
    def g(n: String, r: org.apache.spark.sql.Row) =
      r.getDouble(r.schema.fieldNames.indexOf(n))
    assert(g("coverage_68", m) == 0.666667 && g("coverage_95", m) == 0.666667)
    assert(g("median_width_95", m) == 3.92) // 2·1.96·std
    assert(g("median_std", m) == 1.0)
    assert(g("crps", m) > 0.0 && !g("crps", m).isNaN)
    assert(g("interval_score_95", m) > 0.0)
    assert(m.getLong(m.schema.fieldNames.indexOf("n_samples")) == 3L)
    // no confidence column → null confidence-to-error correlation
    assert(m.isNullAt(m.schema.fieldNames.indexOf("confidence_to_error_corr")))
  }

  test("uqMetrics: quantile columns take precedence over Gaussian bounds") {
    import graft.ml.UQMetrics
    // q-bounds say y=0.9 is OUTSIDE the 95% interval even though the
    // (absent-std-free) Gaussian bounds would cover it
    val df = Seq((0.9, 0.0, 1.0, -0.8, 0.8, -0.6, 0.6, -0.5, 0.5, -0.2, 0.2))
      .toDF("y", "prediction", "prediction_std",
        "q_025", "q_975", "q_05", "q_95", "q_10", "q_90", "q_25", "q_75")
    val m = UQMetrics.uqMetrics(df, "y").head()
    def g(n: String) = m.getDouble(m.schema.fieldNames.indexOf(n))
    assert(g("coverage_95") == 0.0) // 0.9 > q_975=0.8
    assert(g("median_width_95") == 1.6) // q_975 − q_025
    assert(g("median_width_90") == 1.2) // q_95 − q_05
    assert(g("median_width_68") == 1.0) // q_16/q_84 fallback → q_10/q_90
  }

  test("inverseCountTaskWeights: inverse coverage, mean-normalized to 1") {
    val df = Seq(
      (Some(1.0), Some(1.0)), (Some(1.0), None),
      (Some(1.0), Some(Double.NaN)), (Some(1.0), None))
      .map { case (a, b) => (a.getOrElse(Double.NaN), b.map(Double.box).orNull) }
      .toDF("t1", "t2")
    // counts: t1=4, t2=1 → inv (0.25, 1) → mean .625 → weights (0.4, 1.6)
    val w = Models.inverseCountTaskWeights(df, Seq("t1", "t2"))
    assert(w.map(x => math.abs(x)).zip(Seq(0.4, 1.6))
      .forall { case (g, e) => math.abs(g - e) < 1e-9 })
    assert(math.abs(w.sum / w.size - 1.0) < 1e-9)
    // a task with zero non-NaN rows fails loudly, like the reference
    val bad = Seq((1.0, Double.NaN), (2.0, Double.NaN)).toDF("t1", "t2")
    intercept[IllegalArgumentException](
      Models.inverseCountTaskWeights(bad, Seq("t1", "t2")))
  }
}
