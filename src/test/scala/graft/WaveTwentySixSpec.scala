package graft

import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** Wave-26 kernels: Ljung-Box, Pettitt, Granger, permutation entropy,
  * Dickey-Fuller, Engle-Granger — all over the daily() rollup. */
class WaveTwentySixSpec extends SparkSpec {
  import spark.implicits._

  /** One event per (day, value): daily total = value. */
  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-01-${i + 1}%02d 12:00:00", v)
    }.toDF("s", "value").select(to_timestamp(col("s")).as("ts"),
      col("value"))

  /** nPerDay(i) events on day i, each of value vals(i)/nPerDay(i). */
  private def seriesN(vals: Seq[Double], nPerDay: Seq[Int]) =
    vals.zip(nPerDay).zipWithIndex.flatMap { case ((v, k), i) =>
      Seq.fill(k)((f"2024-01-${i + 1}%02d 12:00:00", v / k))
    }.toDF("s", "value").select(to_timestamp(col("s")).as("ts"),
      col("value"))

  test("ljungBox: acf column matches Forecast.acf; Q accumulates") {
    val df = series(Seq(1, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13)
      .map(_.toDouble))
    val lb = Forecast.ljungBox(df, "ts", "value", maxLag = 3)
      .orderBy("lag").collect()
    val ac = Forecast.acf(df, "ts", "value", maxLag = 3)
      .orderBy("lag").collect()
    lb.zip(ac).foreach { case (l, a) =>
      assert(l.getAs[Double]("acf") === a.getAs[Double]("acf"))
    }
    // Q is a sum of squares scaled by positive factors: nondecreasing
    val qs = lb.map(_.getAs[Double]("q_stat"))
    assert(qs.sliding(2).forall(p => p(1) >= p(0)))
    // hand value at lag 1: n(n+2) * r1^2 / (n-1)
    val n = 12.0
    val r1 = ac(0).getAs[Double]("acf")
    assert(math.abs(qs(0) - n * (n + 2) * r1 * r1 / (n - 1)) < 2e-6)
  }

  test("pettitt: level shift pins K = 25 at day 5") {
    val df = series(Seq.fill(5)(1.0) ++ Seq.fill(5)(10.0))
    val r = Forecast.pettitt(df, "ts", "value").head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("k_stat") === 25.0)
    assert(r.getAs[java.sql.Timestamp]("change_day").toString
      .startsWith("2024-01-05"))
    val p = 2.0 * math.exp(-6.0 * 625 / (1000.0 + 100.0))
    assert(math.abs(r.getAs[Double]("p_value") -
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble) < 1e-9)
  }

  test("grangerLag1: totals driven by lagged count score a high F") {
    // counts cycle 1..4; today's TOTAL = 10 * yesterday's count
    // + a small wiggle so the unrestricted fit isn't exact
    val counts = (0 until 12).map(i => i % 4 + 1)
    val totals = (0 until 12).map { i =>
      if (i == 0) 10.0
      else 10.0 * counts(i - 1) + (if (i % 2 == 0) 0.5 else -0.5)
    }
    val df = seriesN(totals, counts)
    val r = Forecast.grangerLag1(df, "ts", "value").head()
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("beta_x") > 5.0)
    assert(r.getAs[Double]("f_stat") > 10.0)
  }

  test("permutationEntropy: monotone ramp has a single pattern, pe 0") {
    val ramp = series((1 to 10).map(_.toDouble))
    val r = Forecast.permutationEntropy(ramp, "ts", "value").head()
    assert(r.getAs[Long]("n_windows") === 8L)
    assert(r.getAs[Long]("n_patterns") === 1L)
    assert(r.getAs[Double]("pe") === 0.0)
    // alternation uses two patterns equally: pe = ln2/ln6
    val alt = series((1 to 10).map(i => if (i % 2 == 0) 5.0 else 1.0))
    val r2 = Forecast.permutationEntropy(alt, "ts", "value").head()
    assert(r2.getAs[Long]("n_patterns") === 2L)
    assert(math.abs(r2.getAs[Double]("pe") -
      math.log(2) / math.log(6)) < 1e-6)
  }

  test("dickeyFuller: alternation mean-reverts (gamma strongly < 0)") {
    val alt = series((1 to 12).map(i => if (i % 2 == 0) 5.0 else 1.0))
    val r = Forecast.dickeyFuller(alt, "ts", "value").head()
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("gamma") < -1.0)
    // random-walk-ish ramp: gamma near 0
    val ramp = series((1 to 12).map(_.toDouble))
    val r2 = Forecast.dickeyFuller(ramp, "ts", "value").head()
    assert(math.abs(r2.getAs[Double]("gamma")) < 0.3)
  }

  test("engleGranger: totals tied to counts cointegrate") {
    // total = 3 * count with a mean-reverting wiggle that breaks
    // perfect alternation (degenerate rss = 0 otherwise)
    val counts = (0 until 12).map(i => i % 5 + 2)
    val wiggle = Seq(1, -1, 1, 1, -1, -1, 1, -1, 1, 1, -1, -1)
    val totals = counts.zip(wiggle).map { case (c, w) => 3.0 * c + w }
    val df = seriesN(totals, counts)
    val r = Forecast.engleGranger(df, "ts", "value").head()
    assert(r.getAs[Long]("n") === 12L)
    assert(math.abs(r.getAs[Double]("beta") - 3.0) < 0.5)
    assert(r.getAs[Double]("gamma") < 0.0)
    assert(r.getAs[Double]("t_stat") < 0.0)
  }
}
