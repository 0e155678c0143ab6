package graft

import graft.eda.{DataAudit, Quality}
import graft.operators.{Events, Reporting}

/** Wave-48 kernels: missingness pattern, reorder gaps, latency
  * percentiles, hourly profile, weekend lift, PSI timeline. */
class WaveFortyEightSpec extends SparkSpec {
  import spark.implicits._

  test("missingnessPattern: co-missing phi 1, disjoint phi negative") {
    val rows = (1 to 10).map { i =>
      (if (i <= 2) None else Some(i.toDouble),
        if (i <= 2) None else Some(i.toDouble),
        if (i == 3 || i == 4) None else Some(i.toDouble))
    }
    val df = rows.toDF("va", "vb", "vc")
    val r = DataAudit.missingnessPattern(df, Seq("va", "vb", "vc"))
      .collect()
    val ab = r.find(x => x.getString(0) == "va" &&
      x.getString(1) == "vb").get
    assert(ab.getAs[Long]("n_both_null") === 2L)
    assert(ab.getAs[Double]("phi") === 1.0)
    val ac = r.find(x => x.getString(0) == "va" &&
      x.getString(1) == "vc").get
    assert(ac.getAs[Long]("n_both_null") === 0L)
    assert(ac.getAs[Double]("phi") === -0.25)
  }

  test("reorderGaps: type-1 percentiles of per-entity date gaps") {
    val df = Seq((1L, "2024-01-01"), (1L, "2024-01-03"),
      (1L, "2024-01-10"), (2L, "2024-02-01"), (2L, "2024-02-02"))
      .map { case (c, d) => (c, java.sql.Date.valueOf(d)) }
      .toDF("cust", "d")
    val r = Events.reorderGaps(df, "cust", "d").head()
    assert(r.getAs[Long]("n_entities") === 2L)
    assert(r.getAs[Long]("n_gaps") === 3L)      // gaps {2, 7, 1}
    assert(r.getAs[Long]("p25_days") === 1L)
    assert(r.getAs[Long]("p50_days") === 2L)
    assert(r.getAs[Long]("p75_days") === 7L)
    assert(r.getAs[Long]("p90_days") === 7L)
  }

  test("latencyPercentiles: per-type gap tail from entity lags") {
    val df = Seq((1L, "2024-01-01 00:00:00", "a"),
      (1L, "2024-01-01 00:00:10", "a"),
      (1L, "2024-01-01 00:00:30", "a"))
      .map { case (u, t, e) => (u, java.sql.Timestamp.valueOf(t), e) }
      .toDF("user_id", "ts", "event_type")
    val r = Events.latencyPercentiles(df, "user_id", "ts",
      "event_type").head()
    assert(r.getAs[Long]("n_gaps") === 2L)      // gaps {10, 20}
    assert(r.getAs[Long]("p50_s") === 10L)
    assert(r.getAs[Long]("p90_s") === 20L)
    assert(r.getAs[Long]("p99_s") === 20L)
  }

  test("hourlyProfile: dow x hour cells with shares") {
    val df = (Seq.fill(3)("2024-01-01 05:15:00") :+
      "2024-01-02 06:45:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val r = Reporting.hourlyProfile(df, "ts").collect()
    // 2024-01-01 is a Monday -> Spark dayofweek 2
    assert(r.map(x => (x.getInt(0), x.getInt(1), x.getLong(2),
      x.getDouble(3))).toSeq === Seq((2, 5, 3L, 0.75), (3, 6, 1L, 0.25)))
  }

  test("weekendLift: weekend daily totals vs weekday, Welch t") {
    val df = Seq("2024-01-06" -> 20.0, "2024-01-07" -> 40.0, // Sat Sun
      "2024-01-08" -> 10.0, "2024-01-09" -> 10.0)            // Mon Tue
      .map { case (d, v) =>
        (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")
    val r = Reporting.weekendLift(df, "ts", "value").head()
    assert(r.getAs[Long]("n_weekend") === 2L)
    assert(r.getAs[Double]("mean_weekend") === 30.0)
    assert(r.getAs[Double]("mean_weekday") === 10.0)
    assert(r.getAs[Double]("lift") === 3.0)
    assert(r.getAs[Double]("t_stat") === 2.0) // 20 / sqrt(200/2)
  }

  test("psiTimeline: a new bin after the baseline shows as drift") {
    val base = (1 to 7).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-0$i%d 12:00:00"), 5.0))
    val day8 = Seq(
      (java.sql.Timestamp.valueOf("2024-01-08 12:00:00"), 5.0),
      (java.sql.Timestamp.valueOf("2024-01-08 13:00:00"), 15.0))
    val df = (base ++ day8).toDF("ts", "value")
    val r = Quality.psiTimeline(df, "ts", "value", binWidth = 10.0)
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[String]("day") === "2024-01-08")
    assert(r(0).getAs[Long]("n") === 2L)
    // union bins {0,1}, k=2: p=(c+1)/(2+2), q=(c+1)/(7+2)
    val t0 = (0.5 - 8.0 / 9) * math.log(0.5 / (8.0 / 9))
    val t1 = (0.5 - 1.0 / 9) * math.log(0.5 / (1.0 / 9))
    val expected = BigDecimal(
      BigDecimal(t0).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble +
      BigDecimal(t1).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0).getAs[Double]("psi") === expected)
  }
}
