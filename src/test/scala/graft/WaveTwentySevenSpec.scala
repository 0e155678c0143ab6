package graft

import graft.eda.{ProcessControl, StatTests}
import org.apache.spark.sql.functions._

/** Wave-27 kernels: Shewhart I-MR, capability, Grubbs, Poisson rate,
  * Tukey HSD, Fleiss kappa. */
class WaveTwentySevenSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-01-${i + 1}%02d 12:00:00", v)
    }.toDF("s", "value").select(to_timestamp(col("s")).as("ts"),
      col("value"))

  test("shewhartI: alternating 1/3 pins center 2, sigma 2/1.128") {
    val df = series((1 to 10).map(i => if (i % 2 == 0) 3.0 else 1.0))
    val r = ProcessControl.shewhartI(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Double]("center") === 2.0)
    assert(math.abs(r.getAs[Double]("sigma_hat") - 2.0 / 1.128) < 1e-6)
    assert(r.getAs[Long]("n_rule1") === 0L)
    assert(r.getAs[Long]("n_rule2") === 0L)
    // a one-sided run of 9+ fires rule 2
    val shifted = series(Seq.fill(3)(0.0) ++ Seq.fill(12)(10.0))
    val r2 = ProcessControl.shewhartI(shifted, "ts", "value").head()
    assert(r2.getAs[Long]("n_rule2") > 0L)
  }

  test("capability: {1,2,3} against 0..4 gives cp = cpk = 2/3") {
    val df = Seq(1.0, 2.0, 3.0).map(("g", _)).toDF("grp", "v")
    val r = ProcessControl.capability(df, "grp", "v", 0.0, 4.0).head()
    assert(r.getAs[Double]("mean") === 2.0)
    assert(r.getAs[Double]("sigma") === 1.0)
    assert(r.getAs[Double]("cp") === 0.666667)
    assert(r.getAs[Double]("cpk") === 0.666667)
  }

  test("grubbs: {1,2,3,10} flags 10 with G = 6/4.0825") {
    val df = Seq(1.0, 2.0, 3.0, 10.0).map(("g", _)).toDF("grp", "v")
    val r = ProcessControl.grubbs(df, "grp", "v").head()
    assert(r.getAs[Double]("extreme_value") === 10.0)
    val sig = math.sqrt((114.0 - 4 * 16.0) / 3)
    assert(math.abs(r.getAs[Double]("g_stat") - 6.0 / sig) < 1e-6)
  }

  test("poissonRateTest: 8-vs-2 errors over equal exposure") {
    val df = Seq((true, 8L, 10L), (false, 2L, 10L))
      .toDF("arm", "ev", "expo")
    val r = StatTests.poissonRateTest(df, "arm", "ev", "expo").head()
    assert(r.getAs[Double]("rate_ratio") === 4.0)
    // z = (8 - 10*0.5) / sqrt(10*0.25)
    assert(math.abs(r.getAs[Double]("z_stat") - 3.0 / math.sqrt(2.5))
      < 1e-6)
  }

  test("tukeyHsd: {1,2,3} vs {4,5,6} gives q = 3/sqrt(1/3)") {
    val df = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _))).toDF("grp", "v")
    val r = StatTests.tukeyHsd(df, "grp", "v").collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("g1") === "a")
    assert(r(0).getAs[Double]("mean_diff") === -3.0)
    assert(math.abs(r(0).getAs[Double]("q_stat") -
      3.0 / math.sqrt(1.0 / 3)) < 1e-6)
  }

  test("fleissKappa: textbook 2x2 mini-panel lands at -1/3") {
    val df = Seq((1, "x"), (1, "x"), (2, "x"), (2, "y"))
      .toDF("item", "cat")
    val r = StatTests.fleissKappa(df, "item", "cat", nRaters = 2).head()
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.getAs[Double]("p_bar") === 0.5)
    assert(r.getAs[Double]("p_e") === 0.625)
    assert(r.getAs[Double]("kappa") === -0.333333)
    // unbalanced items are dropped
    val extra = df.union(Seq((3, "x")).toDF("item", "cat"))
    assert(StatTests.fleissKappa(extra, "item", "cat", 2)
      .head().getAs[Long]("n_items") === 2L)
  }
}
