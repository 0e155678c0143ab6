package graft

import graft.eda.{DataAudit, StatTests}
import graft.ml.EvalExtras
import graft.proximity.Truss

/** Wave-36 kernels: Neyman allocation, rich club, deterministic
  * sample, Gini stump, linear calibration, Kendall W. */
class WaveThirtySixSpec extends SparkSpec {
  import spark.implicits._

  test("neymanAllocation: the noisy stratum out-draws its size") {
    // s1: 100 tight values; s2: 100 spread values
    val rows = (1 to 100).map(i =>
      ("s1", 10.0 + (if (i % 2 == 0) 0.5 else -0.5))) ++
      (1 to 100).map(i => ("s2", 10.0 + (i % 21) - 10.0))
    val r = DataAudit.neymanAllocation(rows.toDF("s", "v"), "s", "v",
      budget = 100L).collect()
      .map(x => x.getAs[String]("stratum") -> x).toMap
    assert(r("s1").getAs[Double]("share_prop") === 0.5)
    assert(r("s2").getAs[Double]("share_neyman") > 0.8)
    assert(r("s2").getAs[Long]("n_neyman") > 80L)
  }

  test("richClub: a clique among hubs pins phi = 1") {
    // triangle 1-2-3 (degrees >= 2) plus pendants off each
    val edges = Seq((1, 2), (2, 3), (3, 1), (1, 4), (2, 5), (3, 6))
      .toDF("src", "dst")
    val rows = Truss.richClub(edges, ks = Seq(1, 2)).collect()
      .map(x => x.getAs[Int]("k") -> x).toMap
    // k=1: club = {1,2,3} (degree 3), all 3 mutual edges present
    assert(rows(1).getAs[Long]("n_nodes") === 3L)
    assert(rows(1).getAs[Double]("phi") === 1.0)
    // k=2: still the same club (degree 3 > 2)
    assert(rows(2).getAs[Long]("n_edges_within") === 3L)
  }

  test("deterministicSample: stable k-per-group md5 order") {
    val df = (1L to 20L).map(i => (if (i <= 10) "a" else "b", i))
      .toDF("g", "id")
    val r1 = DataAudit.deterministicSample(df, "g", "id", 3).collect()
    val r2 = DataAudit.deterministicSample(df, "g", "id", 3).collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    assert(r1.count(_.getAs[String]("group") == "a") === 3)
    assert(r1.map(_.getAs[Int]("sample_rank")).max === 3)
  }

  test("giniStump: a separable feature reaches gini 0 at the boundary") {
    val df = (Seq.fill(10)((1.0, 0)) ++ Seq.fill(10)((5.0, 1)))
      .toDF("f", "l")
    val r = EvalExtras.giniStump(df, "f", "l").head()
    assert(r.getAs[Double]("threshold") === 5.0)
    assert(r.getAs[Double]("gini") === 0.0)
    assert(r.getAs[Double]("p_left") === 0.0)
    assert(r.getAs[Double]("p_right") === 1.0)
  }

  test("linearCalibration: perfectly calibrated grid has slope 1") {
    // p in {0.1..0.9}, labels exactly matching each p's rate
    val rows = (1 to 9).flatMap { d =>
      val p = d / 10.0
      (1 to 10).map(i => (p, if (i <= d) 1 else 0))
    }
    val r = EvalExtras.linearCalibration(rows.toDF("p", "l"),
      "p", "l").head()
    assert(r.getAs[Double]("citl") === 0.0)
    assert(math.abs(r.getAs[Double]("cal_slope") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("cal_intercept")) < 1e-6)
  }

  test("kendallW: identical rankings give W = 1, reversed k=2 gives 0") {
    val agree = for (r <- Seq("r1", "r2", "r3"); i <- 1 to 5)
      yield (r, i, i * 10.0)
    val w1 = StatTests.kendallW(agree.toDF("r", "i", "v"),
      "r", "i", "v").head()
    assert(w1.getAs[Long]("k") === 3L)
    assert(w1.getAs[Long]("m") === 5L)
    assert(w1.getAs[Double]("w") === 1.0)
    val oppose = (1 to 5).map(i => ("r1", i, i * 10.0)) ++
      (1 to 5).map(i => ("r2", i, (6 - i) * 10.0))
    val w0 = StatTests.kendallW(oppose.toDF("r", "i", "v"),
      "r", "i", "v").head()
    assert(w0.getAs[Double]("w") === 0.0)
  }
}
