package graft

import graft.ml.{Experiments, Stats}
import graft.operators.{Cohorts, Forecast}
import org.apache.spark.sql.functions._

/** Wave-21 kernels: retention half-life, seasonality strength, QTE,
  * proportion effect sizes, NB fit, 1-D 2-means. */
class WaveTwentyOneSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("retentionHalfLife: clean halving cohort has half-life 1 week") {
    // cohort of 8: all active week 0, 4 in week 1, 2 in week 2, 1 in week 3
    val ev = (1 to 8).flatMap { u =>
      val weeks = u match {
        case 1 => Seq(0, 1, 2, 3)
        case x if x <= 4 => Seq(0, 1)
        case _ => Seq(0)
      }
      // user 2 also active week 2 → counts 8, 4, 2, 1
      val w2 = if (u == 2) weeks :+ 2 else weeks
      w2.map(w => (u.toLong, ts(f"2024-01-${1 + 7 * w}%02d 12:00:00")))
    }.toDF("user_id", "ts")
    val r = Cohorts.retentionHalfLife(ev, "user_id", "ts").head()
    assert(r.getAs[Long]("n_weeks") === 3L)
    assert(r.getAs[Double]("slope") === -0.693147)
    assert(r.getAs[Double]("half_life_weeks") === 1.0)
  }

  test("seasonalityStrength: pure weekly pattern → seasonal ≈ 1, trend ≈ 0") {
    // CONSECUTIVE calendar days — month-boundary gaps would misalign
    // the i%7 pattern with the actual weekday the seasonal uses
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0))
    val df = (0 until 84).map(i => (day(i), 10.0 + (i % 7) * 3.0))
      .toDF("ts", "value")
    val r = Forecast.seasonalityStrength(df, "ts", "value").head()
    assert(r.getAs[Double]("seasonal_strength") > 0.99)
    // perfect cycle → MA trend is constant → trend variance 0 → null
    val ti = r.fieldIndex("trend_strength")
    assert(r.isNullAt(ti) || r.getDouble(ti) < 0.6)
    // pure linear trend → trend ≈ 1
    val df2 = (0 until 84).map(i => (day(i), 10.0 + i * 2.0))
      .toDF("ts", "value")
    val r2 = Forecast.seasonalityStrength(df2, "ts", "value").head()
    assert(r2.getAs[Double]("trend_strength") > 0.99)
  }

  test("quantileTreatmentEffects: constant shift shows at every decile") {
    val df = ((1 to 100).map(i => ("t", i.toDouble + 10)) ++
      (1 to 100).map(i => ("c", i.toDouble))).toDF("g", "v")
    val r = Experiments.quantileTreatmentEffects(df, "g", "v", "t", "c")
      .collect()
    assert(r.length === 9)
    assert(r.forall(_.getAs[Double]("qte") === 10.0))
    assert(r.head.getAs[Double]("p") === 0.1)
  }

  test("proportionEffects: python-checked h and RR CI") {
    val units = (Seq.fill(30)(("A", 1)) ++ Seq.fill(20)(("A", 0)) ++
      Seq.fill(15)(("B", 1)) ++ Seq.fill(35)(("B", 0))).toDF("g", "conv")
    val r = Stats.proportionEffects(units, "g", "conv", "A", "B").head()
    assert(r.getAs[Double]("p_a") === 0.6 && r.getAs[Double]("p_b") === 0.3)
    assert(r.getAs[Double]("cohens_h") === 0.612875)
    assert(r.getAs[Double]("rr") === 2.0)
    assert(r.getAs[Double]("rr_lo") === 1.237454)
    assert(r.getAs[Double]("rr_hi") === 3.232443)
  }

  test("nbFit: overdispersed counts get an NB size; Poisson-ish gets null") {
    val counts = (Seq.fill(50)(0) ++ Seq.fill(30)(1) ++ Seq.fill(20)(5))
      .toDF("c")
    val r = Stats.nbFit(counts, "c").head()
    assert(r.getAs[Double]("mean") === 1.3)
    assert(r.getAs[Double]("dispersion") === 2.804973)
    assert(r.getAs[Double]("r_mom") === 0.720232)
    assert(r.getAs[Double]("p0_nb") === 0.475759)
    assert(r.getAs[Double]("p0_obs") === 0.5)
    // underdispersed (constant) → NB terms null
    val const = Seq.fill(20)(3).toDF("c")
    val rc = Stats.nbFit(const, "c").head()
    assert(rc.isNullAt(rc.fieldIndex("r_mom")))
  }

  test("twoMeans1d: separates a clean two-cluster column") {
    val vals = (Seq.fill(40)(10.0) ++ Seq.fill(60)(50.0)).toDF("v")
    val r = Stats.twoMeans1d(vals, "v").head()
    assert(r.getAs[Double]("c_lo") === 10.0)
    assert(r.getAs[Double]("c_hi") === 50.0)
    assert(r.getAs[Double]("share_lo") === 0.4)
    assert(r.getAs[Double]("separation") > 1.9)
  }
}
