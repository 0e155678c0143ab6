package graft

import graft.ml.RegressionDiagnostics
import org.apache.spark.sql.functions._

/** Wave-28 kernels: leverage/Cook's, Breusch-Pagan, 2-D PCA, AIC. */
class WaveTwentyEightSpec extends SparkSpec {
  import spark.implicits._

  test("leverageCooks: extreme-x point carries the leverage") {
    // line y = 2x with one off-line far-x point
    val df = (Seq((1, 1.0, 2.0), (2, 2.0, 4.0), (3, 3.0, 6.0),
      (4, 4.0, 8.0), (5, 10.0, 30.0))).toDF("id", "x", "y")
    val top = RegressionDiagnostics.leverageCooks(df, "id", "x", "y",
      k = 2).collect()
    assert(top(0).getAs[Int]("id") === 5)
    assert(top(0).getAs[Double]("leverage") > 0.8)
    assert(top(0).getAs[Double]("cooks_d") >
      top(1).getAs[Double]("cooks_d"))
  }

  test("breuschPagan: fanning residuals score a positive LM") {
    // variance grows with x: e = +-x/2 around y = 3x
    val rows = (1 to 40).map { i =>
      val x = i.toDouble
      (x, 3.0 * x + (if (i % 2 == 0) x / 2 else -x / 2))
    }
    val r = RegressionDiagnostics.breuschPagan(rows.toDF("x", "y"),
      "x", "y").head()
    assert(r.getAs[Long]("n") === 40L)
    assert(r.getAs[Double]("lm") > 5.0)
    // homoscedastic +-1 noise: LM near zero
    val flat = (1 to 40).map { i =>
      (i.toDouble, 3.0 * i + (if (i % 2 == 0) 1.0 else -1.0))
    }
    val r2 = RegressionDiagnostics.breuschPagan(flat.toDF("x", "y"),
      "x", "y").head()
    assert(r2.getAs[Double]("lm") < 1.0)
  }

  test("pca2d: a perfect line is 100% first-component, slope right") {
    val df = (1 to 20).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    val r = RegressionDiagnostics.pca2d(df, "x", "y").head()
    assert(r.getAs[Double]("evr") === 1.0)
    assert(r.getAs[Double]("lambda2") === 0.0)
    // principal axis of y = 2x has slope 2
    assert(math.abs(r.getAs[Double]("axis_slope") - 2.0) < 1e-6)
  }

  test("aicQuadratic: a true parabola strongly prefers the quadratic") {
    val df = (1 to 30).map { i =>
      val x = (i % 10 + 1).toDouble
      (x, x * x + (if (i % 2 == 0) 0.5 else -0.5))
    }.toDF("x", "y")
    val r = RegressionDiagnostics.aicQuadratic(df, "x", "y").head()
    assert(r.getAs[Double]("rss_quad") < r.getAs[Double]("rss_lin"))
    assert(r.getAs[Double]("delta_aic") < -10.0)
    // a true line: quadratic term buys ~nothing, delta_aic ~ +2
    val lin = (1 to 30).map { i =>
      val x = (i % 10 + 1).toDouble
      (x, 5.0 * x + (if (i % 3 == 0) 1.0 else -0.5))
    }.toDF("x", "y")
    val r2 = RegressionDiagnostics.aicQuadratic(lin, "x", "y").head()
    assert(r2.getAs[Double]("delta_aic") > -2.0)
  }
}
