package graft

import graft.eda.{OutlierScores, Profile, StatTests}
import graft.ml.Lift
import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** Wave-14 kernels: hypothesis tests, time-series diagnostics, ECOD,
  * lift table, link prediction, profiling. */
class StatTestsWaveSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // ---- hypothesis tests -------------------------------------------------

  test("mannWhitneyU: identical groups → U = n²/2, z = 0") {
    val df = ((1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i.toDouble))).toDF("g", "v")
    val r = StatTests.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(r.getLong(0) === 50L && r.getLong(1) === 50L)
    assert(r.getDouble(2) === 50.0 * 50 / 2) // U at perfect overlap
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0) // rank-biserial
  }

  test("mannWhitneyU: fully separated groups → U = 0, rank_biserial = 1") {
    val df = ((1 to 30).map(i => ("a", i.toDouble)) ++
      (1 to 30).map(i => ("b", i.toDouble + 100))).toDF("g", "v")
    val r = StatTests.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(4) === 1.0)
    assert(r.getDouble(3) < -6) // strongly negative z
  }

  test("mannWhitneyU matches scipy on a tied fixture") {
    // scipy.stats.mannwhitneyu([1,2,2,3], [2,3,3,4]): U1 = 3.0
    val df = (Seq(1.0, 2, 2, 3).map(("a", _)) ++
      Seq(2.0, 3, 3, 4).map(("b", _))).toDF("g", "v")
    val r = StatTests.mannWhitneyU(df, "g", "v", "a", "b").head()
    assert(r.getDouble(2) === 3.0)
  }

  test("kruskalWallis: scipy parity on a 3-group fixture") {
    // scipy.stats.kruskal([1,2,3],[4,5,6],[7,8,9]) → H = 7.2
    val df = (Seq(1.0, 2, 3).map(("a", _)) ++ Seq(4.0, 5, 6).map(("b", _)) ++
      Seq(7.0, 8, 9).map(("c", _))).toDF("g", "v")
    val r = StatTests.kruskalWallis(df, "g", "v").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 9L)
    assert(r.getDouble(3) === 7.2) // no ties → h == h_corrected
    assert(r.getDouble(2) === 7.2)
  }

  test("anovaF: zero within-group variance → F null (try_divide), " +
    "identical groups → F = 0") {
    val const = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0))
      .toDF("g", "v")
    val r = StatTests.anovaF(const, "g", "v").head()
    assert(r.isNullAt(4)) // SSW = 0 → undefined F, not a crash
    val same = ((1 to 10).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(i => ("b", i.toDouble))).toDF("g", "v")
    assert(StatTests.anovaF(same, "g", "v").head().getDouble(4) === 0.0)
  }

  test("anovaF: textbook fixture") {
    // groups (1,2,3),(2,3,4): grand=2.5, SSB=1.5, SSW=4, F=(1.5/1)/(4/4)=1.5
    val df = (Seq(1.0, 2, 3).map(("a", _)) ++ Seq(2.0, 3, 4).map(("b", _)))
      .toDF("g", "v")
    val r = StatTests.anovaF(df, "g", "v").head()
    assert(r.getDouble(2) === 1.5 && r.getDouble(3) === 4.0)
    assert(r.getDouble(4) === 1.5)
  }

  test("kendallTauB: perfect concordance → 1; reversal → -1; scipy ties") {
    val up = (1 to 20).map(i => (i.toDouble, i.toDouble * 2)).toDF("x", "y")
    assert(StatTests.kendallTauB(up, "x", "y").head().getDouble(4) === 1.0)
    val down = (1 to 20).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(StatTests.kendallTauB(down, "x", "y").head().getDouble(4) === -1.0)
    // by hand: C=5, D=1, n0=10, tx=ty=2 → (5-1)/√(8·8) = 0.5
    val tied = Seq((1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0), (3.0, 3.0))
      .toDF("x", "y")
    val tr = StatTests.kendallTauB(tied, "x", "y").head()
    assert(tr.getLong(2) === 5L && tr.getLong(3) === 1L)
    assert(tr.getDouble(4) === 0.5)
  }

  // ---- time-series ------------------------------------------------------

  private def dailySeries(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("ts", "value")

  test("acf: lag-7 periodic series → acf(7) ≈ 1 ranking above other lags") {
    val vals = (0 until 28).map(i => Seq(10.0, 20, 30, 40, 30, 20, 10)(i % 7))
    val r = Forecast.acf(dailySeries(vals), "ts", "value", maxLag = 7)
      .collect().map(row => row.getInt(0) -> row.getDouble(2)).toMap
    assert(r.size === 7)
    // exact-period series: acf(7) = 3 matched weeks / 4 total = 0.75
    assert(r(7) === 0.75)
    assert(r(7) > r(1) && r(7) > r(3))
  }

  test("cusum: planted mean shift peaks at the change day") {
    val vals = Seq.fill(10)(10.0) ++ Seq.fill(10)(50.0)
    val rows = Forecast.cusumChangepoint(dailySeries(vals), "ts", "value")
      .orderBy("day").collect()
    assert(rows.length === 20)
    val peakDays = rows.filter(_.getBoolean(3)).map(_.getTimestamp(0).toString)
    // deepest trough of the cusum of (x - grand mean) is the last low day
    assert(peakDays === Array("2024-01-10 00:00:00.0"))
  }

  test("seasonalNaiveEval: perfectly weekly series → mase = 0") {
    val vals = (0 until 21).map(i => Seq(5.0, 8, 2, 9, 4, 7, 1)(i % 7))
    val r = Forecast.seasonalNaiveEval(dailySeries(vals), "ts", "value", 7)
      .head()
    assert(r.getLong(0) === 14L) // 21 days minus the 7-day warmup
    assert(r.getDouble(1) === 0.0)
    assert(r.getDouble(3) === 0.0)
  }

  test("theilSen: recovers a linear trend through one wild outlier") {
    val vals = (0 until 15).map(i => 3.0 * i + 10) .updated(7, 10000.0)
    val r = Forecast.theilSen(dailySeries(vals), "ts", "value").head()
    assert(r.getLong(0) === 15L && r.getLong(1) === 105L)
    assert(math.abs(r.getDouble(2) - 3.0) < 0.01) // OLS would be wrecked
  }

  // ---- ECOD + lift ------------------------------------------------------

  test("ecodTopK: a jointly-extreme planted row ranks first") {
    val base = (1 to 500).map(i =>
      (i.toLong, (i % 50).toDouble, ((i * 7) % 90).toDouble))
    val df = (base :+ (9999L, 500.0, 900.0)).toDF("id", "a", "b")
    val top = OutlierScores.ecodTopK(df, "id", Seq("a", "b"), k = 5).collect()
    assert(top.length === 5)
    assert(top.head.getLong(0) === 9999L)
    // scores are descending with the id tiebreak
    assert(top.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("liftTable: top band captures all positives when score = label") {
    val df = ((1 to 900).map(i => (i / 1000.0, 0)) ++
      (901 to 1000).map(i => (i / 1000.0 + 1.0, 1))).toDF("s", "y")
    val rows = Lift.liftTable(df, "s", "y", bands = 10)
      .orderBy(desc("band")).collect()
    assert(rows.length === 10)
    val top = rows.head
    assert(top.getLong(2) === 100L)         // all positives in the top band
    assert(top.getDouble(4) === 1.0)        // cum_capture complete at band 10
    assert(top.getDouble(5) === 10.0)       // 100% band rate vs 10% base
    // capture is monotone non-increasing going down the bands
    assert(rows.map(_.getDouble(4)).sliding(2).forall(p => p(0) >= p(1)))
  }

  // ---- link prediction --------------------------------------------------

  test("linkPrediction: path graph a-b-c scores (a,c); edges excluded") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = graft.proximity.Graph.linkPrediction(edges).collect()
    val byPair = r.map(x => (x.getLong(0), x.getLong(1)) ->
      ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    // candidates: (1,3) via 2, (2,4) via 3 — (1,2) etc are real edges
    assert(byPair.keySet === Set((1L, 3L), (2L, 4L)))
    val (cn, jac, aa) = byPair((1L, 3L))
    assert(cn === 1L)
    assert(jac === 0.5) // deg(1)=1, deg(3)=2 → 1/(1+2-1)
    assert(aa === BigDecimal(1.0 / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- profiling --------------------------------------------------------

  test("profileCompare: long shape, null-count drift surfaces") {
    val base = Seq((1.0, 2.0), (3.0, 4.0), (5.0, 6.0)).toDF("x", "y")
    val cur = Seq((Some(1.0), 2.0), (None, 4.0)).toDF("x", "y")
    val m = Profile.profileCompare(base, cur).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(m.size === 12) // 2 cols × 6 metrics
    val nullRow = m(("x", "n_null"))
    assert(nullRow.getDouble(2) === 0.0 && nullRow.getDouble(3) === 1.0)
    assert(nullRow.getDouble(4) === 1.0)
    assert(m(("y", "max")).getDouble(3) === 4.0)
  }

  test("keyCandidates + functionalDeps on a toy parent-child table") {
    val df = Seq((1L, 10L, "x"), (2L, 10L, "x"), (3L, 20L, "y"),
      (4L, 20L, "z")).toDF("id", "pid", "tag")
    val keys = Profile.keyCandidates(df, Seq("id", "pid", "tag")).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(keys === Map("id" -> true, "pid" -> false, "tag" -> false))
    val fds = Profile.functionalDeps(df,
      Seq("id" -> "pid", "pid" -> "tag")).collect()
      .map(r => (r.getString(0), r.getBoolean(4), r.getLong(3))).toList
    assert(fds.contains(("id", true, 0L)))   // id → pid holds
    assert(fds.contains(("pid", false, 1L))) // pid 20 → {y, z} violates
  }
}
