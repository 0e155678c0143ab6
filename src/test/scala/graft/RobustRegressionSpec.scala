package graft

import graft.eda.{GroupRegression, Robust}
import graft.operators.Decay
import org.apache.spark.sql.functions._

/** Wave-11 kernels: MAD outliers, Benford audit, group regression,
  * decayed aggregates. */
class RobustRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: robust to the outlier itself; degenerate MAD flags nothing") {
    // 99 values at ~100 plus one at 10000: stddev is corrupted by the
    // spike, the MAD is not — the spike must flag
    val df = ((1 to 99).map(i => 100.0 + (i % 7)) :+ 10000.0).toDF("x")
    val out = Robust.madOutliers(df, "x")
    assert(out.filter(col("is_outlier")).select("x").as[Double].collect()
      .toSeq === Seq(10000.0))
    // all-equal column: MAD = 0 → NULL z, nothing flagged
    val flat = Seq.fill(20)(5.0).toDF("x")
    val fo = Robust.madOutliers(flat, "x")
    assert(fo.filter(col("is_outlier")).count() === 0)
    assert(fo.filter(col("mad_z").isNotNull).count() === 0)
  }

  test("benford: digit extraction and expected shares; ideal data fits") {
    // values 1..9 × powers of 10 in Benford proportions would fit, but
    // the cheap exact check: first digits extract correctly across scales
    val df = Seq(1.23, 0.00456, 78900.0, 2.0, 0.9).toDF("x")
    val d = Robust.benford(df, "x")
      .select("digit", "n").as[(Int, Long)].collect().toMap
    assert(d === Map(1 -> 1L, 4 -> 1L, 7 -> 1L, 2 -> 1L, 9 -> 1L))
    // benford_share for digit 1 is log10(2)
    val b1 = Robust.benford(df, "x").filter(col("digit") === 1)
      .select("benford_share").as[Double].head()
    assert(b1 === BigDecimal(math.log10(2)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("benford: non-positive and NULL values are excluded") {
    val df = Seq(Some(-5.0), Some(0.0), None, Some(3.0)).toDF("x")
    val rows = Robust.benford(df, "x").collect()
    assert(rows.length === 1 && rows.head.getInt(0) === 3)
  }

  test("groupRegression: recovers a planted line per group") {
    // group a: y = 3x + 2 exactly; group b: y = -x + 10 exactly
    val df = ((1 to 50).map(i => ("a", i.toDouble, 3.0 * i + 2)) ++
      (1 to 50).map(i => ("b", i.toDouble, -1.0 * i + 10))).toDF("g", "x", "y")
    val fits = GroupRegression.fit(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(fits("a") === ((3.0, 2.0, 1.0)))
    assert(fits("b") === ((-1.0, 10.0, 1.0)))
    // perfect fit → |corr| = 1 → t_stat must be NULL (diverges)
    assert(GroupRegression.fit(df, "g", "x", "y")
      .filter(col("t_stat").isNotNull).count() === 0)
  }

  test("decayedAggregate: half-life halves a one-half-life-old event") {
    val asOf = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), 10.0), // w=1
      (1L, java.sql.Timestamp.valueOf("2024-01-08 00:00:00"), 10.0), // w=0.5
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0), // w=0.25
      (1L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), 99.0)  // future: excluded
    ).toDF("user_id", "ts", "value")
    val r = Decay.decayedAggregate(df, "user_id", "ts", "value", asOf, 7.0).head()
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 17.5)  // 10·(1 + 0.5 + 0.25)
    assert(r.getDouble(3) === 1.75)
  }

  test("winsorizedStats: clipping tames the spike, bounds are percentiles") {
    val df = ((1 to 99).map(_.toDouble) :+ 100000.0).toDF("x")
    val r = Robust.winsorizedStats(df, "x", 0.01, 0.99).head()
    assert(r.getLong(0) === 100L)
    assert(r.getLong(3) >= 1L)         // the spike was clipped
    assert(r.getDouble(4) < 200.0)     // winsorized mean is sane
    assert(r.getDouble(1) < r.getDouble(2))
  }

  test("dowSeasonality: deltas average to ~0 over a balanced week") {
    val rows = (0 until 70).map { i =>
      (new java.sql.Timestamp(1700000000000L + i.toLong * 86400000L),
        (i % 7).toDouble)
    }
    val out = Robust.dowSeasonality(rows.toDF("t", "v"), "t", "v")
    assert(out.count() === 7)
    val deltaSum = out.agg(sum("delta_vs_global")).head().getDouble(0)
    assert(math.abs(deltaSum) < 1e-4) // balanced design: deltas cancel
  }
}
