package graft

import graft.eda.{ShapeTests, StatTests}
import graft.ml.{Preference, Stats}

/** Wave-37 kernels: weighted kappa, Somers' D, KM Greenwood bands,
  * win ratio, bimodality coefficient, Theil's U. */
class WaveThirtySevenSpec extends SparkSpec {
  import spark.implicits._

  test("weightedKappa: perfect = 1, perfect disagreement = -1") {
    val same = (1 to 20).map(i => (i % 3, i % 3)).toDF("a", "b")
    assert(Preference.weightedKappa(same, "a", "b")
      .head().getAs[Double]("kappa_w") === 1.0)
    val opp = (1 to 20).map(i => (i % 2, 1 - i % 2)).toDF("a", "b")
    assert(Preference.weightedKappa(opp, "a", "b")
      .head().getAs[Double]("kappa_w") === -1.0)
  }

  test("somersD: y a function of x = 1; ties on y discount it") {
    val perfect = (1 to 12).map(i => (i % 4, i % 4)).toDF("x", "y")
    assert(Stats.somersD(perfect, "x", "y")
      .head().getAs[Double]("somers_d") === 1.0)
    // y constant: all pairs tied on y -> D = 0
    val flat = (1 to 12).map(i => (i % 4, 1)).toDF("x", "y")
    assert(Stats.somersD(flat, "x", "y")
      .head().getAs[Double]("somers_d") === 0.0)
  }

  test("kaplanMeierBands: Greenwood se at the first death of 10") {
    val life = (1 to 10).map(t => (t.toDouble, 1)).toDF("dur", "event")
    val r = Stats.kaplanMeierBands(life, "dur", "event")
      .orderBy("t").head()
    assert(r.getAs[Double]("survival") === 0.9)
    val se = 0.9 * math.sqrt(1.0 / (10 * 9))
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-6)
    assert(r.getAs[Double]("lo") < 0.9 && r.getAs[Double]("hi") > 0.9)
    assert(r.getAs[Double]("hi") <= 1.0)
  }

  test("winRatio: balanced wins and losses give ratio 1") {
    val t = Seq(3.0, 1.0).toDF("v")
    val c = Seq(2.0, 2.0).toDF("v")
    val r = StatTests.winRatio(t, c, "v").head()
    assert(r.getAs[Long]("wins") === 2L)
    assert(r.getAs[Long]("losses") === 2L)
    assert(r.getAs[Double]("win_ratio") === 1.0)
    assert(math.abs(r.getAs[Double]("log_se") - 1.0) < 1e-6)
  }

  test("bimodalityCoefficient: two-point mass flags, uniform doesn't") {
    val rows = (1 to 40).map(i =>
      ("two", if (i % 2 == 0) 10.0 else 0.0)) ++
      (1 to 40).map(i => ("uni", (i % 10).toDouble))
    val r = ShapeTests.bimodalityCoefficient(rows.toDF("g", "v"),
      "g", "v").collect()
      .map(x => x.getAs[String]("group") -> x).toMap
    assert(r("two").getAs[Boolean]("is_bimodal"))
    assert(!r("uni").getAs[Boolean]("is_bimodal"))
    assert(r("two").getAs[Double]("bc") > r("uni").getAs[Double]("bc"))
  }

  test("uncertaintyCoefficient: determined = 1, independent = 0") {
    val det = (1 to 12).map(i => (i % 3, (i % 3) * 10)).toDF("x", "y")
    val r = StatTests.uncertaintyCoefficient(det, "x", "y").head()
    assert(r.getAs[Double]("u_y_given_x") === 1.0)
    val ind = (for (x <- 0 to 2; y <- 0 to 1) yield (x, y))
      .toDF("x", "y")
    val r2 = StatTests.uncertaintyCoefficient(ind, "x", "y").head()
    assert(math.abs(r2.getAs[Double]("mi")) < 1e-6)
    assert(math.abs(r2.getAs[Double]("u_y_given_x")) < 1e-6)
  }
}
