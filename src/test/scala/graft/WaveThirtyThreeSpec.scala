package graft

import graft.ml.EvalExtras

/** Wave-33 kernels: MCC summary, effect sizes, SRM, best thresholds,
  * average precision, equalized odds. */
class WaveThirtyThreeSpec extends SparkSpec {
  import spark.implicits._

  test("mccSummary: perfect and inverted classifiers") {
    val perfect = Seq((1, 1), (1, 1), (0, 0), (0, 0)).toDF("p", "l")
    val r = EvalExtras.mccSummary(perfect, "p", "l").head()
    assert(r.getAs[Double]("mcc") === 1.0)
    assert(r.getAs[Double]("youden_j") === 1.0)
    val inverted = Seq((0, 1), (0, 1), (1, 0), (1, 0)).toDF("p", "l")
    assert(EvalExtras.mccSummary(inverted, "p", "l")
      .head().getAs[Double]("mcc") === -1.0)
  }

  test("effectSizes: unit-SD groups one apart give d = 1") {
    val a = Seq(4.0, 5.0, 6.0).toDF("v") // mean 5, ss 2
    val b = Seq(3.0, 4.0, 5.0).toDF("v") // mean 4, ss 2
    val r = EvalExtras.effectSizes(a, b, "v").head()
    assert(r.getAs[Double]("mean_diff") === 1.0)
    assert(r.getAs[Double]("cohens_d") === 1.0)
    // J = 1 - 3/(4*4-1) = 0.8
    assert(r.getAs[Double]("hedges_g") === 0.8)
    assert(r.getAs[Double]("glass_delta") === 1.0)
  }

  test("srmCheck: 60/40 on n=100 gives chi2 = 4, z = 2") {
    val df = (Seq.fill(60)(1) ++ Seq.fill(40)(0)).toDF("arm")
    val r = EvalExtras.srmCheck(df, "arm").head()
    assert(r.getAs[Double]("observed_share") === 0.6)
    assert(r.getAs[Double]("chi2") === 4.0)
    assert(r.getAs[Double]("z_stat") === 2.0)
  }

  test("bestThresholds: separable scores pin the boundary") {
    // positives score 10/11, negatives 1/2 -> threshold 10 is perfect
    val df = Seq((10.0, 1), (11.0, 1), (1.0, 0), (2.0, 0))
      .toDF("s", "l")
    val r = EvalExtras.bestThresholds(df, "s", "l").collect()
      .map(x => x.getAs[String]("criterion") -> x).toMap
    assert(r("youden").getAs[Double]("threshold") === 10.0)
    assert(r("youden").getAs[Double]("tpr") === 1.0)
    assert(r("youden").getAs[Double]("fpr") === 0.0)
    assert(r("f1").getAs[Double]("score") === 1.0)
  }

  test("averagePrecision: perfect ranking = 1, ties handled") {
    val perfect = Seq((10.0, 1), (9.0, 1), (2.0, 0), (1.0, 0))
      .toDF("s", "l")
    assert(EvalExtras.averagePrecision(perfect, "s", "l")
      .head().getAs[Double]("ap") === 1.0)
    // all same score: AP = prevalence
    val flat = Seq((5.0, 1), (5.0, 0), (5.0, 0), (5.0, 1))
      .toDF("s", "l")
    assert(EvalExtras.averagePrecision(flat, "s", "l")
      .head().getAs[Double]("ap") === 0.5)
  }

  test("equalizedOdds: a biased decision shows a TPR gap") {
    // group a: perfect; group b: misses all positives
    val df = (Seq(("a", 1, 1), ("a", 0, 0), ("a", 1, 1), ("a", 0, 0),
      ("b", 0, 1), ("b", 0, 0), ("b", 0, 1), ("b", 0, 0)))
      .toDF("g", "p", "l")
    val rows = EvalExtras.equalizedOdds(df, "g", "p", "l").collect()
    val byG = rows.map(x => x.getAs[String]("group") -> x).toMap
    assert(byG("a").getAs[Double]("tpr") === 1.0)
    assert(byG("b").getAs[Double]("tpr") === 0.0)
    assert(byG("a").getAs[Double]("tpr_gap") === 1.0)
    assert(byG("a").getAs[Double]("fpr_gap") === 0.0)
  }
}
