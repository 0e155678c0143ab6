package graft

import graft.ml.{Experiments, InfoGain}
import graft.operators.Forecast
import graft.text.Distinctive
import org.apache.spark.sql.functions._

/** Wave-19 kernels: exact Bayesian A/B, G² collocations, Hurst R/S,
  * decision stump, Croston, PACF. */
class WaveNineteenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bayesianAb: Cook's closed form; symmetric arms are a coin flip") {
    // A: 10/40, B: 20/40 → scipy-checked P(B>A) = 0.988981
    val units = (Seq.fill(10)(("A", 1)) ++ Seq.fill(30)(("A", 0)) ++
      Seq.fill(20)(("B", 1)) ++ Seq.fill(20)(("B", 0))).toDF("arm", "conv")
    val r = Experiments.bayesianAb(units, "arm", "conv", "A", "B").head()
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("s_b") === 20L)
    assert(r.getAs[Double]("mean_a") === 0.261905)
    assert(r.getAs[Double]("mean_b") === 0.5)
    assert(r.getAs[Double]("prob_b_beats_a") === 0.988981)
    // identical evidence → exactly 1/2 by symmetry
    val sym = (Seq.fill(10)(("A", 1)) ++ Seq.fill(30)(("A", 0)) ++
      Seq.fill(10)(("B", 1)) ++ Seq.fill(30)(("B", 0))).toDF("arm", "conv")
    assert(Experiments.bayesianAb(sym, "arm", "conv", "A", "B").head()
      .getAs[Double]("prob_b_beats_a") === 0.5)
  }

  test("collocations: a glued bigram tops G²; free pairs score ~0") {
    // "new york" is the ONLY repeated bigram; new/york also occur
    // apart, so the pair is glued but not trivially exclusive
    val docs = ((1 to 20).map(i => s"new york alpha$i beta$i") ++
      (1 to 20).map(i => s"gamma$i new delta$i york epsilon$i"))
      .toDF("text")
    val r = Distinctive.collocations(docs, "text", minCount = 5, topK = 5)
      .collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "new" && r.head.getString(1) === "york")
    assert(r.head.getAs[Long]("n_pair") === 20L)
    assert(r.head.getAs[Double]("g2") > 10.0)
  }

  test("hurstRs: a strongly trending series has H near 1") {
    val trend = (1 to 128).map(i =>
      (ts(f"2024-${(i - 1) / 28 + 1}%02d-${(i - 1) % 28 + 1}%02d 12:00:00"),
        i.toDouble))
      .toDF("ts", "value")
    val r = Forecast.hurstRs(trend, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 128L)
    assert(r.getAs[Long]("n_scales") === 4L)
    assert(r.getAs[Double]("hurst") > 0.9)
  }

  test("bestSplit: recovers a clean class boundary") {
    // label flips exactly at x = 50; candidate grid must find a
    // threshold in the gap and reach gini_split = 0
    val rows = (1 to 100).map(i => (i.toDouble, if (i <= 50) 0 else 1))
    val r = InfoGain.bestSplit(rows.toDF("x", "y"), "x", "y",
      candidates = 19).head()
    assert(r.getAs[Double]("gini_split") === 0.0)
    assert(r.getAs[Double]("gini_parent") === 0.5)
    assert(r.getAs[Double]("gain") === 0.5)
    assert(r.getAs[Long]("n_left") === 50L)
    val t = r.getAs[Double]("threshold")
    assert(t >= 50.0 && t < 51.0)
  }

  test("croston: python-checked size/interval smoothing") {
    val days = Seq(1, 2, 4, 8, 16)
    val sizes = Seq(10.0, 20, 10, 20, 10)
    val df = days.zip(sizes).map { case (d, v) =>
      (ts(f"2024-01-$d%02d 12:00:00"), v) }.toDF("ts", "value")
    val r = Forecast.croston(df, "ts", "value", alpha = 0.25).head()
    assert(r.getAs[Long]("n_demand_days") === 5L)
    assert(r.getAs[Double]("z_hat") === 13.841229)
    assert(r.getAs[Double]("p_hat") === 4.588571)
    assert(r.getAs[Double]("forecast") === 3.016457)
  }

  test("pacf: white-ish alternation gives pacf(1) = acf(1); AR cutoff") {
    // constructed series whose sample ACF is what it is — assert the
    // Durbin-Levinson identities: pacf(1) == acf(1), and pacf(2) ==
    // (r2 - r1^2)/(1 - r1^2) from the same unrounded kernel
    val vals = Seq(3.0, 5, 2, 8, 1, 9, 4, 7, 2, 6, 3, 8, 1, 5, 9, 2)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v) }.toDF("ts", "value")
    val p = Forecast.pacf(df, "ts", "value", maxLag = 3).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val a = Forecast.acf(df, "ts", "value", maxLag = 2).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(math.abs(p(1) - a(1)) < 2e-6) // same kernel, both 6dp-rounded
    val exp2 = (a(2) - a(1) * a(1)) / (1 - a(1) * a(1))
    assert(math.abs(p(2) - exp2) < 1e-4) // rounded-inputs tolerance
  }
}
