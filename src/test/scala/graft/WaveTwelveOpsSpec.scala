package graft

import graft.eda.Concentration
import graft.ml.{Experiments, Stats}
import graft.operators.{Forecast, Intervals}
import org.apache.spark.sql.functions._

/** Cross-correlation (q279), EB rate shrinkage (q280), ratio-metric CI
  * (q281), caliper matching (q282), interval coalesce (q283) and Theil
  * decomposition (q284): hand-computed fixtures + invariants. */
class WaveTwelveOpsSpec extends SparkSpec {
  import spark.implicits._

  private def day(t: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      java.time.LocalDate.parse("2024-01-01").plusDays(t).atStartOfDay)

  test("crossCorrelation: a shifted copy peaks at its lag") {
    // y is x delayed by 2 days -> ccf peaks at lag +2 (x leads);
    // x is a hash-like (near-white) sequence so no other lag aliases
    def sig(t: Int): Double = ((t * 37) % 101).toDouble
    val rows = (0 until 40).flatMap { t =>
      Seq((day(t), "x", f"${sig(t + 2)}%.2f"), (day(t), "y", f"${sig(t)}%.2f"))
    }
    val ev = rows.toDF("ts", "kind", "value")
    val out = Forecast.crossCorrelation(ev, "ts",
      when(col("kind") === "x", col("value")),
      when(col("kind") === "y", col("value")), maxLag = 4)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.size == 8 && !out.contains(0))
    assert(out(2).getDouble(2) > 0.9)
    assert(out.filterKeys(_ != 2).values
      .forall(r => math.abs(r.getDouble(2)) < 0.6))
    // pair counts shrink with |lag| on the 40-day frame
    assert(out(2).getLong(1) == 38 && out(-4).getLong(1) == 36)
  }

  test("ebRates: low-n groups shrink hard, high-n barely move") {
    // corpus rate ~0.5; 'tiny' is 2/2 raw 1.0, 'big' is 500/1000
    val rows = Seq.tabulate(1000)(i => ("big", if (i < 500) 1 else 0)) ++
      Seq(("tiny", 1), ("tiny", 1)) ++
      Seq.tabulate(400)(i => ("mid_lo", if (i % 4 == 0) 1 else 0)) ++
      Seq.tabulate(400)(i => ("mid_hi", if (i % 4 != 0) 1 else 0))
    val out = Stats.ebRates(rows.toDF("grp", "s"), "grp", "s")
      .collect().map(r => r.getString(0) -> r).toMap
    val tiny = out("tiny"); val big = out("big")
    assert(tiny.getDouble(3) == 1.0) // raw
    // shrunk well below raw, toward the prior mean
    assert(tiny.getDouble(4) < 0.85)
    assert(math.abs(big.getDouble(4) - big.getDouble(3)) < 0.02)
    // prior is shared across rows and alpha, beta > 0
    assert(tiny.getDouble(5) == big.getDouble(5) && tiny.getDouble(5) > 0)
    assert(tiny.getDouble(6) > 0)
  }

  test("ebRates: degenerate prior falls back to raw rates") {
    // every group has the same raw rate -> v = 0 -> no shrink, null prior
    val rows = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0))
    val out = Stats.ebRates(rows.toDF("grp", "s"), "grp", "s").collect()
    out.foreach { r =>
      assert(r.getDouble(4) == r.getDouble(3))
      assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("ratioMetricCi: point estimate is the ratio of sums") {
    // arm a: units (y,x) = (10,1),(30,3) -> R = 40/4 = 10, and the
    // unit-level ratios are both exactly 10 -> se = 0
    val u = Seq(("a", 10.0, 1.0), ("a", 30.0, 3.0),
      ("b", 10.0, 1.0), ("b", 50.0, 1.0)).toDF("arm", "y", "x")
    val out = Experiments.ratioMetricCi(u, "arm", "y", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getDouble(4) == 10.0 && a.getDouble(5) == 0.0)
    assert(a.getDouble(6) == 10.0 && a.getDouble(7) == 10.0)
    val b = out("b")
    assert(b.getDouble(4) == 30.0 && b.getDouble(5) > 0)
    assert(b.getDouble(6) < 30.0 && b.getDouble(7) > 30.0)
  }

  test("caliperMatch: exact-covariate controls match at distance 0") {
    // treated at x=5 (y=20) has a control at x=5 (y=12) -> att 8
    // treated at x=9 (y=30): nearest control x=7 (y=14), d=2 <= caliper
    // treated at x=50: nothing within caliper -> unmatched
    val u = Seq((1, 20.0, 5.0), (0, 12.0, 5.0), (1, 30.0, 9.0),
      (0, 14.0, 7.0), (1, 99.0, 50.0)).toDF("t", "y", "x")
    val r = Experiments.caliperMatch(u, "t", "y", "x", caliper = 2.0)
      .collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    // att = mean((20-12), (30-14)) = 12
    assert(r.getDouble(2) == 12.0)
    assert(r.getDouble(3) == 25.0 && r.getDouble(4) == 13.0)
  }

  test("caliperMatch: equal gaps prefer the at-or-before control") {
    val u = Seq((0, 1.0, 2.0), (1, 10.0, 3.0), (0, 5.0, 4.0))
      .toDF("t", "y", "x")
    val r = Experiments.caliperMatch(u, "t", "y", "x", caliper = 5.0)
      .collect()(0)
    assert(r.getDouble(2) == 9.0) // matched backward to y=1
  }

  test("coalesceIntervals: overlaps merge, touching merges, gaps split") {
    val iv = Seq(
      ("k", 0.0, 10.0), ("k", 5.0, 12.0),  // overlap -> [0,12]
      ("k", 12.0, 15.0),                     // touches -> [0,15]
      ("k", 20.0, 22.0),                     // gap of 5 -> new island
      ("z", 1.0, 1.0))                       // degenerate point
      .toDF("key", "s", "e")
    val out = Intervals.coalesceIntervals(iv, "key", "s", "e")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 2)
    assert(k.getDouble(3) == 17.0)  // 15 + 2
    assert(k.getDouble(4) == 15.0 && k.getDouble(5) == 5.0)
    val z = out("z")
    assert(z.getLong(2) == 1 && z.getDouble(3) == 0.0 && z.isNullAt(5))
  }

  test("coalesceIntervals: invalid rows drop; islands within key only") {
    val iv = Seq(("a", 5.0, 3.0), ("a", 0.0, 1.0), ("b", 0.5, 2.0))
      .toDF("key", "s", "e")
    val out = Intervals.coalesceIntervals(iv, "key", "s", "e")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 1) // e < s row dropped
    assert(out("b").getLong(2) == 1) // b's interval doesn't see a's
  }

  test("theilDecomposition: within + between = total; equal groups -> 0 between") {
    val rows = Seq(("a", 1.0), ("a", 4.0), ("b", 2.0), ("b", 3.0),
      ("c", 2.5), ("c", 2.5))
    val out = Concentration.theilDecomposition(rows.toDF("g", "v"), "g", "v")
      .collect()
    val within = out.map(_.getDouble(4)).sum
    val between = out.map(_.getDouble(5)).sum
    val total = out.head.getDouble(7)
    assert(math.abs(within + between - total) < 1e-5)
    assert(math.abs(out.head.getDouble(8) - within) < 1e-6)
    assert(math.abs(out.head.getDouble(9) - between) < 1e-6)
    // all three groups share mean 2.5 -> between ~ 0; c is perfectly
    // equal inside -> its theil_group = 0
    assert(math.abs(between) < 1e-6)
    val c = out.find(_.getString(0) == "c").get
    assert(c.getDouble(6) == 0.0 && c.getDouble(4) == 0.0)
  }

  test("theilDecomposition: non-positive values are excluded") {
    val rows = Seq(("a", 1.0), ("a", 0.0), ("a", -3.0), ("b", 1.0))
    val out = Concentration.theilDecomposition(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(1) == 1)
    // one positive value per group, all equal -> zero inequality
    assert(out("a").getDouble(7) == 0.0)
  }
}
