package graft

import graft.eda.{ShapeTests, StatTests}

/** Wave-25 kernels: Wasserstein-1, two-sample Anderson-Darling,
  * Jarque-Bera, Mood's median, Wilcoxon signed-rank, runs test. */
class WaveTwentyFiveSpec extends SparkSpec {
  import spark.implicits._

  test("wasserstein1: pure location shift = the shift size") {
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(3.0, 4.0).toDF("v")
    val r = StatTests.wasserstein1(a, b, "v").head()
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Double]("w1") === 2.0)
    // identical samples: zero distance
    val z = StatTests.wasserstein1(a, a, "v").head()
    assert(z.getAs[Double]("w1") === 0.0)
  }

  test("andersonDarling2: zero on identical samples, grows with shift") {
    val a = (1 to 40).map(_.toDouble).toDF("v")
    val same = StatTests.andersonDarling2(a, a, "v").head()
    assert(math.abs(same.getAs[Double]("ad")) < 1e-9)
    val b = (1 to 40).map(i => i + 20.0).toDF("v")
    val far = StatTests.andersonDarling2(a, b, "v").head()
    assert(far.getAs[Double]("ad") > 5.0)
  }

  test("jarqueBera: symmetric uniform lattice has skew 0, kurt -1.3") {
    val df = Seq(1, 2, 3, 4, 5).map(v => ("g", v)).toDF("grp", "v")
    val r = ShapeTests.jarqueBera(df, "grp", "v").head()
    assert(r.getAs[Double]("skew") === 0.0)
    assert(r.getAs[Double]("ex_kurtosis") === -1.3)
    assert(math.abs(r.getAs[Double]("jb") - 5.0 / 6 * (1.69 / 4)) < 1e-6)
  }

  test("moodMedian: fully separated groups give chi2 = n") {
    val df = (Seq(1.0, 2.0, 3.0).map(("g1", _)) ++
      Seq(10.0, 11.0, 12.0).map(("g2", _))).toDF("grp", "v")
    val r = ShapeTests.moodMedian(df, "grp", "v").head()
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n_above") === 3L)
    assert(r.getAs[Double]("chi2") === 6.0)
  }

  test("wilcoxonSignedRank: hand-ranked four pairs") {
    // d = x - y: 2, 3, -1, 4 -> |d| ranks 2,3,1,4; W+ = 9
    val df = Seq((3.0, 1.0), (4.0, 1.0), (1.0, 2.0), (5.0, 1.0))
      .toDF("x", "y")
    val r = ShapeTests.wilcoxonSignedRank(df, "x", "y").head()
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Double]("w_plus") === 9.0)
    // z = (9 - 5) / sqrt(7.5)
    assert(math.abs(r.getAs[Double]("z_stat") - 4.0 / math.sqrt(7.5)) < 1e-6)
    // zero differences drop out
    val withZero = df.union(Seq((2.0, 2.0)).toDF("x", "y"))
    assert(ShapeTests.wilcoxonSignedRank(withZero, "x", "y")
      .head().getAs[Long]("n_pairs") === 4L)
  }

  test("runsTest: perfect alternation maximizes the run count") {
    val df = (1 to 6).map(i => (i, if (i % 2 == 0) 2.0 else 1.0))
      .toDF("o", "v")
    val r = ShapeTests.runsTest(df, "o", "v").head()
    assert(r.getAs[Long]("runs") === 6L)
    assert(r.getAs[Long]("n_above") === 3L)
    // z = (6 - 4) / sqrt(1.2)
    assert(math.abs(r.getAs[Double]("z_stat") - 2.0 / math.sqrt(1.2)) < 1e-6)
    // one long block run: low R, negative z
    val blocks = (1 to 6).map(i => (i, if (i <= 3) 1.0 else 2.0))
      .toDF("o", "v")
    assert(ShapeTests.runsTest(blocks, "o", "v")
      .head().getAs[Long]("runs") === 2L)
  }
}
