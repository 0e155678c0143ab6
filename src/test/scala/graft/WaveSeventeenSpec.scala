package graft

import graft.eda.{OutlierScores, StatTests}
import graft.ml.{Ridge, Stats}
import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** Wave-17 kernels: Durbin–Watson, CMH pooled 2×2, Cochran's Q, VIF,
  * HBOS, Welch ANOVA. */
class WaveSeventeenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("durbinWatson: hump series → positive rho1; python-checked values") {
    val vals = Seq(1.0, 2, 3, 4, 5, 6, 5, 4, 3, 2)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("ts", "value")
    val r = Forecast.durbinWatson(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Double]("slope") === 0.151515)
    assert(r.getAs[Double]("dw") === 0.432086)
    assert(r.getAs[Double]("rho1") === 0.588235)
    // white-noise-ish alternating residuals → dw near 2 side (> 1)
    val alt = (1 to 12).map(i =>
      (ts(f"2024-01-$i%02d 12:00:00"), if (i % 2 == 0) 1.0 else -1.0))
      .toDF("ts", "value")
    assert(Forecast.durbinWatson(alt, "ts", "value")
      .head().getAs[Double]("dw") > 2.0)
  }

  test("cmh: pooled OR and chi2 match the closed form") {
    // stratum 1: [[10,10],[10,70]], stratum 2: [[20,30],[10,40]]
    def stratum(s: Int, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
        Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))
    val df = (stratum(1, 10, 10, 10, 70) ++ stratum(2, 20, 30, 10, 40))
      .toDF("s", "r", "c")
    val out = Stats.cmh(df, "s", "r", "c").head()
    assert(out.getAs[Long]("k_strata") === 2L)
    assert(out.getAs[Long]("n") === 200L)
    assert(out.getAs[Double]("or_cmh") === 3.75)
    assert(out.getAs[Double]("chi2_cmh") === 15.338028)
  }

  test("cochranQ: textbook 3-rater table gives Q = 9; identical raters → 0") {
    val rows = Seq((1, 1, 1), (1, 1, 0), (1, 0, 0), (1, 1, 1), (0, 0, 0),
      (1, 1, 0), (1, 0, 0), (1, 1, 0), (0, 0, 0), (1, 0, 0))
      .toDF("f1", "f2", "f3")
    val r = Stats.cochranQ(rows, Seq("f1", "f2", "f3")).head()
    assert(r.getAs[Long]("n") === 10L && r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("q_stat") === 9.0)
    // equal column rates with discordant patterns → Q = 0 exactly
    val same = (1 to 8).map(i => (i % 2, 1 - i % 2)).toDF("f1", "f2")
    assert(Stats.cochranQ(same, Seq("f1", "f2")).head()
      .getAs[Double]("q_stat") === 0.0)
    // all-concordant raters → 0/0 → null by the den > 0 guard
    val conc = (1 to 8).map(i => (i % 2, i % 2)).toDF("f1", "f2")
    val rc = Stats.cochranQ(conc, Seq("f1", "f2")).head()
    assert(rc.isNullAt(rc.fieldIndex("q_stat")))
  }

  test("vif3: independent features → VIF 1; near-duplicate → VIF explodes") {
    // x3 orthogonal-ish to x1,x2; x2 = x1 + tiny noise
    val rows = (1 to 40).map { i =>
      val x1 = i.toDouble
      (x1, x1 + (if (i % 2 == 0) 0.01 else -0.01), if (i % 4 < 2) 1.0 else -1.0)
    }
    val r = Ridge.vif3(rows.toDF("x1", "x2", "x3"), "x1", "x2", "x3")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("vif")).toMap
    assert(r("x1") > 1000.0 && r("x2") > 1000.0) // collinear pair
    assert(r("x3") < 1.1) // independent feature
    // perfectly collinear pair → 1 - r23^2 = 0 on the partner → null
    val exact = (1 to 20).map(i => (i.toDouble, 2.0 * i, i.toDouble % 3))
    val rx = Ridge.vif3(exact.toDF("a", "b", "c"), "a", "b", "c").collect()
    assert(rx.filter(_.getString(0) == "c").head.isNullAt(2))
  }

  test("hbosTopK: the isolated point scores highest; constant col is inert") {
    // 30 points clustered at (1..3, 1..3), one far outlier at (100, 100)
    val pts = (1 to 30).map(i =>
      (i.toLong, (i % 3 + 1).toDouble, (i % 3 + 1).toDouble, 5.0)) :+
      (99L, 100.0, 100.0, 5.0)
    val df = pts.toDF("id", "x", "y", "z")
    val top = OutlierScores.hbosTopK(df, "id", Seq("x", "y", "z"),
      bins = 5, k = 3).collect()
    assert(top.head.getLong(0) === 99L)
    assert(top.head.getDouble(1) > top(1).getDouble(1))
    // constant z contributes ln(n/n) = 0: dropping it changes nothing
    val top2 = OutlierScores.hbosTopK(df, "id", Seq("x", "y"),
      bins = 5, k = 3).collect()
    assert(top.head.getDouble(1) === top2.head.getDouble(1))
  }

  test("welchAnova: python-checked F under unequal variances") {
    val df = (Seq(1.0, 2, 3, 4, 5).map(("a", _)) ++
      Seq(2.0, 4, 6, 8, 10).map(("b", _)) ++
      Seq(10.0, 10.5, 11, 11.5, 12).map(("c", _))).toDF("g", "v")
    val r = StatTests.welchAnova(df, "g", "v").head()
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 15L)
    assert(r.getAs[Double]("f_welch") === 48.994595)
    assert(r.getAs[Double]("df2") === 6.588235)
    // zero-variance group is dropped by the complete-variance rule
    val withConst = df.union(Seq(("d", 7.0), ("d", 7.0)).toDF("g", "v"))
    assert(StatTests.welchAnova(withConst, "g", "v").head()
      .getAs[Long]("k") === 3L)
  }
}
