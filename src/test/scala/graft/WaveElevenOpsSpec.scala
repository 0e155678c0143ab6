package graft

import graft.eda.Robust
import graft.ml.{Experiments, Stats}
import graft.operators.Forecast
import graft.proximity.Graph
import graft.transforms.QuantileNorm
import org.apache.spark.sql.functions._

/** Log-rank test (q273), weighted quantiles (q274), HITS (q275),
  * quantile normalization (q276), stratified ATE (q277) and the
  * periodogram (q278): hand-computed fixtures + invariants. */
class WaveElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("logRank: identical survival curves give chi2 = 0") {
    // both groups: events at 1, 2; censor at 3 — O == E exactly
    val life = Seq(
      ("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 0),
      ("b", 1.0, 1), ("b", 2.0, 1), ("b", 3.0, 0))
      .toDF("grp", "duration", "event")
    val out = Stats.logRank(life, "duration", "event", "grp")
      .collect().map(r => r.getString(0) -> r).toMap
    Seq("a", "b").foreach { g =>
      val r = out(g)
      assert(r.getLong(1) == 3 && r.getLong(2) == 2)
      assert(math.abs(r.getDouble(3) - 2.0) < 1e-9) // expected == observed
      assert(r.getDouble(4) == 0.0)
    }
  }

  test("logRank: hand-computed two-time table") {
    // a: event at t=1 (n=2 at risk); b: event at t=2 (n=1 at risk by then)
    // t=1: d=1, n_a=2, n_b=2 -> E_a=0.5, v=0.25*(4-1)/3=0.25
    // t=2: d=1, n_a=1, n_b=2 -> E_a=1/3, v=(1/3)(2/3)(2/2)=2/9
    // O_a=1, E_a=5/6, V=0.25+2/9 => chi2=(1/6)^2/(17/36)=1/17
    val life = Seq(
      ("a", 1.0, 1), ("a", 9.0, 0),
      ("b", 2.0, 1), ("b", 9.0, 0))
      .toDF("grp", "duration", "event")
    val out = Stats.logRank(life, "duration", "event", "grp")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getDouble(3) - 5.0 / 6) < 1e-6)
    assert(math.abs(out("a").getDouble(4) - 1.0 / 17) < 1e-4)
    // the statistic is the same from either group's side
    assert(out("a").getDouble(4) == out("b").getDouble(4))
  }

  test("weightedQuantiles: mass moves the median, ties collapse") {
    // g: value 1 carries weight 6 of 8 -> all quantiles at 1
    // h: uniform weights over 1..4 -> p25=1, median=2, p75=3
    val df = Seq(
      ("g", 1.0, 3.0), ("g", 1.0, 3.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("h", 1.0, 1.0), ("h", 2.0, 1.0), ("h", 3.0, 1.0), ("h", 4.0, 1.0))
      .toDF("grp", "v", "w")
    val out = Robust.weightedQuantiles(df, "grp", "v", "w")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("g").getDouble(1) == 8.0)
    assert(out("g").getDouble(2) == 1.0 && out("g").getDouble(3) == 1.0 &&
      out("g").getDouble(4) == 1.0) // cw*4 = 24 >= tw*3 = 24 already at v=1
    assert(out("h").getDouble(2) == 1.0 && out("h").getDouble(3) == 2.0 &&
      out("h").getDouble(4) == 3.0)
  }

  test("weightedQuantiles: non-positive weights are excluded") {
    val df = Seq(("g", 100.0, 0.0), ("g", 100.0, -5.0), ("g", 1.0, 1.0))
      .toDF("grp", "v", "w")
    val r = Robust.weightedQuantiles(df, "grp", "v", "w").collect()(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(3) == 1.0)
  }

  test("hits: star graph puts all authority on the hub target") {
    // s1,s2,s3 -> c : c is the sole authority; s* are equal hubs
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(9L).getDouble(2) == 1.0) // all authority mass
    assert(out(9L).getDouble(1) == 0.0) // c points at nothing
    Seq(1L, 2L, 3L).foreach { s =>
      assert(math.abs(out(s).getDouble(1) - 1.0 / 3) < 1e-5)
      assert(out(s).getDouble(2) == 0.0)
    }
  }

  test("hits: symmetric cycle is uniform; self-loops dropped") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 4).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-6)
      assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-6)
    }
  }

  test("quantileNormalize: groups land on the shared target curve") {
    // two sources with shifted distributions; after normalization the
    // per-centile target is identical across groups and equals the
    // cross-group mean of the raw centile means
    val df = ((1 to 40).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 40).map(i => ("b", 100L + i, i * 10.0)))
      .toDF("grp", "id", "v")
    val out = QuantileNorm.quantileNormalize(df, "grp", "id", "v", nBins = 4)
    val rows = out.collect()
    assert(rows.length == 8) // 2 groups x 4 centiles
    val byC = rows.groupBy(_.getInt(1))
    byC.foreach { case (_, rs) =>
      assert(rs.length == 2)
      // same qnorm target for both groups at each centile
      assert(rs.map(_.getDouble(4)).distinct.length == 1)
      // target is the mean of the two raw means
      val exp = rs.map(_.getDouble(3)).sum / 2
      assert(math.abs(rs.head.getDouble(4) - exp) < 1e-6)
    }
    // bin populations are the floor-formula's equal split: 10 each
    rows.foreach(r => assert(r.getLong(2) == 10L))
  }

  test("stratifiedAte: planted per-stratum effect is recovered") {
    // covariate x in {1,2}: stratum effect +10 at x=1, +20 at x=2,
    // balanced arms -> ATE = ATT = 15
    val units = Seq(
      (1, 10.0, 1.0), (1, 10.0, 1.0), (0, 0.0, 1.0), (0, 0.0, 1.0),
      (1, 120.0, 2.0), (1, 120.0, 2.0), (0, 100.0, 2.0), (0, 100.0, 2.0))
      .toDF("treated", "y", "x")
    val out = Experiments.stratifiedAte(units, "treated", "y", "x",
        nStrata = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).getDouble(5) == 10.0 && out(2).getDouble(5) == 20.0)
    out.values.foreach { r =>
      assert(r.getDouble(6) == 15.0 && r.getDouble(7) == 15.0)
    }
  }

  test("stratifiedAte: no-overlap strata drop out of the estimate") {
    // x=1 has only treated units -> its diff is null and the overall
    // ATE renormalizes over the x=2 stratum alone
    val units = Seq(
      (1, 10.0, 1.0), (1, 12.0, 1.0),
      (1, 120.0, 2.0), (0, 100.0, 2.0))
      .toDF("treated", "y", "x")
    val out = Experiments.stratifiedAte(units, "treated", "y", "x",
        nStrata = 2)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(1).isNullAt(5))
    assert(out(1).getDouble(6) == 20.0 && out(2).getDouble(6) == 20.0)
  }

  test("periodogram: a pure sinusoid concentrates power at its harmonic") {
    // 28 days of a clean 7-day cycle (harmonic k = 4): P_4 ~ 1, rest ~ 0
    val base = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 28).map { t =>
      val v = 100.0 + 50.0 * math.cos(2 * math.Pi * 4 * t / 28.0)
      (java.sql.Timestamp.valueOf(base.plusDays(t).atStartOfDay),
        f"$v%.2f")
    }
    val ev = rows.toDF("ts", "value")
    val out = Forecast.periodogram(ev, "ts", "value", maxK = 6)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(4).getDouble(2) > 0.99)
    assert(math.abs(out(4).getDouble(1) - 7.0) < 1e-9) // period_days
    Seq(1, 2, 3, 5, 6).foreach(k => assert(out(k).getDouble(2) < 0.01))
  }
}
