package graft

import graft.dedup.Dedup
import graft.eda.Robust
import graft.ml.Causal
import graft.operators.{Cohorts, Forecast}
import org.apache.spark.sql.functions._

/** Wave-41 kernels: Page–Hinkley, dup-cluster histogram, propensity
  * overlap, cold-start rate, pinball eval, winsorized correlation. */
class WaveFortyOneSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Double)*) =
    rows.map { case (d, v) => (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")

  test("pageHinkley: a level shift shows up as ph_inc with its day") {
    val df = ev("2024-01-01" -> 0.0, "2024-01-02" -> 0.0,
      "2024-01-03" -> 10.0, "2024-01-04" -> 10.0)
    val r = Forecast.pageHinkley(df, "ts", "value").head()
    // x̄ = 5, m = [-5,-10,-5,0]: inc peaks at 10 on the last day,
    // dec peaks at 5 mid-series
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Double]("ph_inc") === 10.0)
    assert(r.getAs[Double]("ph_dec") === 5.0)
    assert(r.getAs[String]("peak_day") === "2024-01-04")
  }

  test("dupClusterSizes: histogram of exact-hash family sizes") {
    val df = Seq("x", "x", "x", "y", "z").toDF("text")
    val r = Dedup.dupClusterSizes(df, "text").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      === Seq((1L, 2L, 2L), (3L, 1L, 3L)))
  }

  test("propensityOverlap: integer-lattice OVL and off-support share") {
    // bin 1: 2 treated / 2 control; bin 2: 2 treated / 0 control
    val df = Seq((1, 1), (1, 1), (1, 0), (1, 0), (2, 1), (2, 1))
      .toDF("b", "tr")
    val r = Causal.propensityOverlap(df, "b", "tr").head()
    assert(r.getAs[Long]("n_treat") === 4L)
    assert(r.getAs[Long]("n_ctrl") === 2L)
    assert(r.getAs[Double]("overlap") === 0.5)        // min(2/4, 2/2)
    assert(r.getAs[Double]("treat_off_support") === 0.5)
  }

  test("coldStartRate: post-split users never seen pre-split") {
    val df = Seq(
      ("2024-01-10 00:00:00", 1L, "a"), ("2024-01-10 00:00:00", 2L, "b"),
      ("2024-01-20 00:00:00", 1L, "a"), ("2024-01-20 00:00:00", 3L, "a"),
      ("2024-01-21 00:00:00", 2L, "b"))
      .map { case (d, u, t) => (java.sql.Timestamp.valueOf(d), u, t) }
      .toDF("ts", "user_id", "event_type")
    val r = Cohorts.coldStartRate(df, "user_id", "event_type", "ts",
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00")).collect()
    val a = r.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_active") === 2L)
    assert(a.getAs[Long]("n_new") === 1L) // user 3
    assert(a.getAs[Double]("cold_rate") === 0.5)
    assert(r.find(_.getString(0) == "b").get.getAs[Long]("n_new") === 0L)
  }

  test("pinballEval: rank-based forecasts, exact asymmetric loss") {
    val df = ev("2024-01-01" -> 10.0, "2024-01-02" -> 20.0,
      "2024-01-03" -> 30.0, "2024-01-04" -> 40.0,
      "2024-01-20" -> 25.0, "2024-01-21" -> 35.0)
    val r = Forecast.pinballEval(df, "ts", "value",
      java.sql.Date.valueOf("2024-01-15")).collect()
    // train {10,20,30,40}: q10 -> 10, q50 -> 20, q90 -> 40
    val byQ = r.map(x => x.getAs[Double]("q") -> x).toMap
    assert(byQ(0.1).getAs[Double]("forecast") === 10.0)
    assert(byQ(0.1).getAs[Double]("pinball") === 2.0)
    assert(byQ(0.5).getAs[Double]("forecast") === 20.0)
    assert(byQ(0.5).getAs[Double]("pinball") === 5.0)
    assert(byQ(0.9).getAs[Double]("forecast") === 40.0)
    assert(byQ(0.9).getAs[Double]("pinball") === 1.0)
  }

  test("winsorizedCorr: clamping the tail recovers the correlation") {
    val df = (1 to 21).map(i =>
      (i.toDouble, if (i == 21) -100.0 else i.toDouble)).toDF("x", "y")
    val r = Robust.winsorizedCorr(df, "x", "y").head()
    val (raw, win) = (r.getAs[Double]("r_raw"),
      r.getAs[Double]("r_winsorized"))
    assert(raw < 0.5)            // one planted tail point wrecks r
    assert(win > raw + 0.3)      // clamped at the 2nd/20th order stats
    // identical columns stay perfectly correlated through clamping
    val id = (1 to 21).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val r2 = Robust.winsorizedCorr(id, "x", "y").head()
    assert(r2.getAs[Double]("r_winsorized") === 1.0)
  }
}
