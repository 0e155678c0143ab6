package graft

import graft.eda.{Concentration, ShapeTests, StatTests}
import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** Wave-31 kernels: Mann-Kendall, sign test, Cliff's delta,
  * Hodges-Lehmann, Atkinson, Lorenz deciles. */
class WaveThirtyOneSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      (f"2024-01-${i + 1}%02d 12:00:00", v)
    }.toDF("s", "value").select(to_timestamp(col("s")).as("ts"),
      col("value"))

  test("mannKendall: strictly rising series, S = 45, z = 44/sqrt(125)") {
    val df = series((1 to 10).map(_.toDouble))
    val r = Forecast.mannKendall(df, "ts", "value").head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("s_stat") === 45L)
    assert(math.abs(r.getAs[Double]("z_stat") -
      44.0 / math.sqrt(125.0)) < 1e-6)
  }

  test("signTest: 3 positives, 1 negative, z = 1") {
    val df = Seq((3.0, 1.0), (4.0, 1.0), (1.0, 2.0), (5.0, 1.0),
      (2.0, 2.0)).toDF("x", "y")
    val r = ShapeTests.signTest(df, "x", "y").head()
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Double]("z_stat") === 1.0)
  }

  test("cliffsDelta: full dominance = 1, identical samples = 0") {
    val a = Seq(3.0, 4.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val r = StatTests.cliffsDelta(a, b, "v").head()
    assert(r.getAs[Double]("cliffs_delta") === 1.0)
    assert(r.getAs[Double]("vd_a") === 1.0)
    val same = StatTests.cliffsDelta(b, b, "v").head()
    assert(same.getAs[Double]("cliffs_delta") === 0.0)
    assert(same.getAs[Double]("vd_a") === 0.5)
  }

  test("hodgesLehmann: median of {3,4,4,5} pairwise diffs is 4") {
    val a = Seq(5.0, 6.0).toDF("v")
    val b = Seq(1.0, 2.0).toDF("v")
    val r = StatTests.hodgesLehmann(a, b, "v").head()
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Double]("hl_shift") === 4.0)
  }

  test("atkinson: equal values 0, {1,4} lands at 0.2") {
    val df = Seq(("g1", 2.0), ("g1", 2.0), ("g2", 1.0), ("g2", 4.0))
      .toDF("grp", "v")
    val r = Concentration.atkinson(df, "grp", "v").collect()
      .map(x => x.getAs[String]("group") -> x.getAs[Double]("atkinson"))
      .toMap
    assert(r("g1") === 0.0)
    assert(math.abs(r("g2") - 0.2) < 1e-4)
  }

  test("lorenzDeciles: 1..10 per-element deciles accumulate to 1") {
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val rows = Concentration.lorenzDeciles(df, "grp", "v")
      .orderBy("decile").collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("n")).forall(_ === 1L))
    assert(rows.last.getAs[Double]("cum_share") === 1.0)
    assert(math.abs(rows.head.getAs[Double]("cum_share") - 1.0 / 55)
      < 1e-6)
    // shares are nondecreasing
    val cs = rows.map(_.getAs[Double]("cum_share"))
    assert(cs.sliding(2).forall(p => p(1) >= p(0)))
  }
}
