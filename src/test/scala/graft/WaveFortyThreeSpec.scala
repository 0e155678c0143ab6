package graft

import graft.dedup.Dedup
import graft.eda.StatTests
import graft.ml.Stats
import graft.operators.Forecast

/** Wave-43 kernels: similarity band sweep, Lilliefors, Bowker,
  * Jonckheere–Terpstra, interval coverage, operating points. */
class WaveFortyThreeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Double)*) =
    rows.map { case (d, v) =>
      (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")

  test("jaccardBandSweep: integer-lattice bands, cumulative from top") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y"),
      (4L, "x y")).toDF("id", "text")
    val r = Dedup.jaccardBandSweep(df, "id", "text").collect()
    // (1,2): inter 4 / union 6 -> band 6; (3,4): identical -> band 10
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      === Seq((6L, 1L, 2L), (10L, 1L, 1L)))
  }

  test("lilliefors: exact fitted moments, D against the A&S normal") {
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val r = StatTests.lilliefors(df, "v").head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("mean") === 2.0)
    assert(r.getAs[Double]("sigma") === 1.0)
    val d = r.getAs[Double]("d_stat")
    assert(d > 0.17 && d < 0.18) // max gap at z = ±1: |1/3 - Φ(-1)|
  }

  test("bowker: k x k paired shift statistic") {
    val df = (Seq.fill(3)((0L, 1L)) ++ Seq((1L, 0L)) ++
      Seq.fill(2)((1L, 1L))).toDF("a", "b")
    val r = Stats.bowker(df, "a", "b").head()
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_pairs_tested") === 1L)
    assert(r.getAs[Double]("chi2") === 1.0) // (3-1)^2 / (3+1)
    assert(r.getAs[Long]("df") === 1L)
  }

  test("jonckheereTerpstra: monotone groups hit the exact moments") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("g", "v")
    val r = StatTests.jonckheereTerpstra(df, "g", "v").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("jt") === 4.0)   // all cross pairs ascend
    assert(r.getAs[Double]("z_stat") === 1.549193) // (4-2)/sqrt(5/3)
  }

  test("intervalCoverage: test-half share inside fitted normal bands") {
    val df = ev("2024-01-01" -> 9.0, "2024-01-02" -> 10.0,
      "2024-01-03" -> 11.0, "2024-01-20" -> 10.0, "2024-01-21" -> 12.0)
    val r = Forecast.intervalCoverage(df, "ts", "value",
      java.sql.Date.valueOf("2024-01-15")).collect()
    val byK = r.map(x => x.getAs[Int]("k") -> x).toMap
    assert(byK(1).getAs[Double]("coverage") === 0.5) // [9,11]: 12 out
    assert(byK(2).getAs[Double]("coverage") === 1.0) // [8,12]
    assert(byK(3).getAs[Double]("coverage") === 1.0)
  }

  test("operatingPoints: highest threshold reaching each target") {
    val df = (Seq.fill(5)((0.9, 1)) ++ Seq.fill(5)((0.5, 1)) ++
      Seq.fill(5)((0.5, 0)) ++ Seq.fill(10)((0.1, 0))).toDF("s", "y")
    val r = StatTests.operatingPoints(df, "s", "y", Seq(50, 80))
      .collect()
    val t50 = r.find(_.getAs[Double]("target_sens") == 0.5).get
    assert(t50.getAs[Double]("threshold") === 0.9)
    assert(t50.getAs[Double]("sensitivity") === 0.5)
    assert(t50.getAs[Double]("specificity") === 1.0)
    assert(t50.getAs[Double]("precision") === 1.0)
    val t80 = r.find(_.getAs[Double]("target_sens") == 0.8).get
    assert(t80.getAs[Double]("threshold") === 0.5)
    assert(t80.getAs[Double]("sensitivity") === 1.0)
    assert(t80.getAs[Double]("specificity") === 0.666667)
    assert(t80.getAs[Double]("precision") === 0.666667)
  }
}
