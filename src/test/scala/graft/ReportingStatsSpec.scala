package graft

import graft.ml.Stats
import graft.operators.Reporting
import org.apache.spark.sql.functions._

/** Wave-13 kernels: period-over-period report, transitions, Welch t,
  * Kaplan–Meier. */
class ReportingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("weeklyReport: pct change and 4-week MA over the week table") {
    // Mondays: weeks with totals 100, 150, 120
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 100.0),
      (ts("2024-01-08 10:00:00"), 150.0),
      (ts("2024-01-17 10:00:00"), 120.0)
    ).toDF("t", "value")
    val r = Reporting.weeklyReport(df, "t", "value").orderBy("week").collect()
    assert(r.length === 3)
    assert(r(0).isNullAt(3)) // no previous week
    assert(r(1).getDouble(3) === 0.5)      // 100 → 150
    assert(r(2).getDouble(3) === -0.2)     // 150 → 120
    assert(r(2).getDouble(4) === BigDecimal((100.0 + 150 + 120) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("transitions: row-normalized Markov matrix, ties broken by id") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 00:01:00"), "b"),
      (1L, 3L, ts("2024-01-01 00:02:00"), "a"),
      (2L, 4L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 00:01:00"), "c")
    ).toDF("user_id", "event_id", "t", "et")
    val m = Reporting.transitions(df, "user_id", "t", "et", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m(("a", "b")) === ((1L, 0.5)))
    assert(m(("a", "c")) === ((1L, 0.5)))
    assert(m(("b", "a")) === ((1L, 1.0)))
    assert(m.size === 3) // no cross-user transition (user1 "a" → user2 "a")
  }

  test("welchT: equal groups → t 0; planted shift detected") {
    val eq = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 100).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r0 = Stats.welchT(eq, "g", "v", "a", "b").head()
    assert(r0.getDouble(4) === 0.0 && r0.getDouble(6) === 0.0)
    val shifted = ((1 to 100).map(i => ("a", i.toDouble + 50)) ++
      (1 to 100).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r1 = Stats.welchT(shifted, "g", "v", "a", "b").head()
    assert(r1.getDouble(4) === 50.0)
    assert(r1.getDouble(6) > 10.0) // hugely significant
    assert(r1.getDouble(7) === 198.0) // equal variances → df = n_a+n_b−2
  }

  test("kaplanMeier: textbook small cohort with censoring") {
    // durations: 1(event) 2(censor) 3(event) 4(event) 5(censor)
    // S(1) = 4/5; S(3) = 4/5 · 2/3; S(4) = 4/5 · 2/3 · 1/2
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0))
      .toDF("d", "e")
    val km = Stats.kaplanMeier(df, "d", "e")
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(km(1.0) === r6(4.0 / 5))
    assert(km(3.0) === r6(4.0 / 5 * 2 / 3))
    assert(km(4.0) === r6(4.0 / 5 * 2 / 3 * 1 / 2))
    assert(km.size === 3) // censored times emit no row
  }

  test("kaplanMeier: everyone dies at the last time → survival hits exactly 0") {
    val df = Seq((1.0, 1), (2.0, 1)).toDF("d", "e")
    val km = Stats.kaplanMeier(df, "d", "e")
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(km(1.0) === 0.5)
    assert(km(2.0) === 0.0) // zero factor pins survival, no NULL leak
  }

  test("rollingOriginFolds: folds are temporally nested, never leak") {
    val df = (1 to 100).map(i =>
      new java.sql.Timestamp(1700000000000L + i * 60000L)).toDF("t")
    val folds = Stats.rollingOriginFolds(df, "t", k = 4)
      .orderBy("fold").collect()
    assert(folds.length === 4)
    folds.foreach { f =>
      assert(f.getLong(1) < f.getLong(2)) // train_end < valid_end
    }
    // train windows grow monotonically (expanding origin)
    assert(folds.map(_.getLong(3)).toSeq === folds.map(_.getLong(3)).sorted.toSeq)
    // distinct timestamps: each validation slice holds ~1/5 of the rows
    assert(folds.map(_.getLong(4)).forall(n => n >= 15 && n <= 25))
  }

  test("calibrationBins: perfect calibration has mean_pred == frac_pos") {
    // bin b: probability b/10+0.05, labels drawn to match exactly
    val rows = (0 until 10).flatMap { b =>
      val p = b / 10.0 + 0.05
      val pos = math.round(20 * p).toInt
      Seq.fill(pos)((p, 1)) ++ Seq.fill(20 - pos)((p, 0))
    }
    val out = Stats.calibrationBins(rows.toDF("p", "y"), "p", "y", 10)
      .collect().map(r => r.getInt(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.size === 10)
    out.foreach { case (b, (mp, fp)) =>
      assert(math.abs(mp - (b / 10.0 + 0.05)) < 1e-9)
      assert(math.abs(fp - math.round(20 * (b / 10.0 + 0.05)) / 20.0) < 1e-9)
    }
    // p = 1.0 lands in the last bin, p > 1 excluded
    val edge = Stats.calibrationBins(
      Seq((1.0, 1), (1.5, 1)).toDF("p", "y"), "p", "y", 10).collect()
    assert(edge.length === 1 && edge.head.getInt(0) === 9 &&
      edge.head.getLong(1) === 1L)
  }
}
