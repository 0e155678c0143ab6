package graft

import graft.eda.{ShapeTests, StatTests}
import graft.ml.InfoGain
import graft.operators.Forecast

/** Wave-46 kernels: grouped Wasserstein, grouped ACF, seasonal MK,
  * gini sweep, rank-biserial, variance ratio. */
class WaveFortySixSpec extends SparkSpec {
  import spark.implicits._

  test("wassersteinByGroup: unit shift costs exactly one unit") {
    val df = Seq(("g", 1, 0.0), ("g", 1, 1.0), ("g", 0, 1.0),
      ("g", 0, 2.0), ("h", 1, 5.0), ("h", 0, 5.0)).toDF("g", "a", "v")
    val r = StatTests.wassersteinByGroup(df, "g", "a", "v").collect()
    assert(r.find(_.getString(0) == "g").get
      .getAs[Double]("w1") === 1.0)
    assert(r.find(_.getString(0) == "h").get
      .getAs[Double]("w1") === 0.0)
  }

  test("acfByGroup: a linear ramp's exact correlogram") {
    val df = (1 to 4).map(i =>
      ("g", java.sql.Timestamp.valueOf(s"2024-01-0$i 12:00:00"),
        i.toDouble)).toDF("g", "ts", "value")
    val r = Forecast.acfByGroup(df, "g", "ts", "value").collect()
    val byLag = r.map(x => x.getAs[Int]("lag") ->
      x.getAs[Double]("acf")).toMap
    assert(byLag(1) === 0.25)
    assert(byLag(2) === -0.3)
    assert(byLag(3) === -0.45)
  }

  test("seasonalMannKendall: within-season trend, tied season inert") {
    val df = Seq(("2024-01-01", 1.0), ("2024-01-08", 2.0),
      ("2024-01-15", 3.0),                       // Mondays, rising
      ("2024-01-02", 5.0), ("2024-01-09", 5.0))  // Tuesdays, tied
      .map { case (d, v) =>
        (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")
    val r = Forecast.seasonalMannKendall(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_seasons") === 2L)
    assert(r.getAs[Long]("s_stat") === 3L)
    assert(r.getAs[Double]("z_stat") === 1.044466) // 2/sqrt(66/18)
  }

  test("giniSweep: a perfect splitter ranks above a null feature") {
    val df = Seq((0L, 0L, 0), (0L, 1L, 0), (1L, 0L, 1), (1L, 1L, 1))
      .toDF("f", "g", "y")
    val r = InfoGain.giniSweep(df, Seq("f", "g"), "y").collect()
    val f = r.find(_.getString(0) == "f").get
    assert(f.getAs[Double]("gini_parent") === 0.5)
    assert(f.getAs[Double]("gini_decrease") === 0.5)
    assert(f.getAs[Long]("best_bin") === 0L)
    assert(r.find(_.getString(0) == "g").get
      .getAs[Double]("gini_decrease") === 0.0)
  }

  test("rankBiserial: signed-rank mass with exact tie halves") {
    val df = Seq((2.0, 1.0), (3.0, 1.0), (4.0, 1.0), (1.0, 5.0))
      .toDF("x", "y") // diffs +1 +2 +3 -4
    val r = ShapeTests.rankBiserial(df, "x", "y").head()
    assert(r.getAs[Double]("w_plus") === 6.0)
    assert(r.getAs[Double]("w_minus") === 4.0)
    assert(r.getAs[Double]("rank_biserial") === 0.2)
    val tied = Seq((2.0, 1.0), (1.0, 2.0)).toDF("x", "y")
    val r2 = ShapeTests.rankBiserial(tied, "x", "y").head()
    assert(r2.getAs[Double]("w_plus") === 1.5)
    assert(r2.getAs[Double]("rank_biserial") === 0.0)
  }

  test("varianceRatio: 3x the spread means F = 1/9 the other way") {
    val df = (Seq(1.0, 2.0, 3.0).map(("R", _)) ++
      Seq(2.0, 5.0, 8.0).map(("N", _))).toDF("arm", "v")
    val r = StatTests.varianceRatio(df, "arm", "v", "R", "N").head()
    assert(r.getAs[Double]("var_a") === 1.0)
    assert(r.getAs[Double]("var_b") === 9.0)
    assert(r.getAs[Double]("f_stat") === 0.111111)
  }
}
