package graft

/** Round-12 wave 57: Brunner–Munzel and Cucconi rank tests
  * (q514–q515). Reference values computed independently from the
  * published formulas (BM statistic cross-checked against
  * scipy.stats.brunnermunzel's documented example). */
class WaveFiftySevenSpec extends SparkSpec {
  import spark.implicits._

  private def twoArm(xs: Seq[Double], ys: Seq[Double]) =
    (xs.map(("x", _)) ++ ys.map(("y", _))).toDF("g", "v")

  test("brunnerMunzel: scipy's documented example reproduces exactly") {
    val x = Seq(1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1).map(_.toDouble)
    val y = Seq(3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4).map(_.toDouble)
    val r = graft.eda.RankTests
      .brunnerMunzel(twoArm(x, y), "g", "v", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_x") == 14)
    assert(r.getAs[Long]("n_y") == 11)
    assert(r.getAs[Double]("p_hat") == 0.788961)
    assert(r.getAs[Double]("w_stat") == 3.137467) // scipy: 3.1374674823
    assert(r.getAs[Double]("df_sat") == 17.6828)
    assert(r.getAs[Double]("p_value") > 0.0 &&
      r.getAs[Double]("p_value") < 0.01)
  }

  test("brunnerMunzel: identical samples sit at the null") {
    val r = graft.eda.RankTests
      .brunnerMunzel(twoArm(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4)),
        "g", "v", "x", "y")
      .collect().head
    assert(r.getAs[Double]("p_hat") == 0.5)
    assert(r.getAs[Double]("w_stat") == 0.0)
  }

  test("cucconi: shifted sample matches the hand-computed reference") {
    val r = graft.eda.RankTests
      .cucconi(twoArm(Seq(1, 2, 3, 4, 5),
          Seq(2.5, 3.5, 4.5, 5.5, 6.5)),
        "g", "v", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_x") == 5)
    assert(r.getAs[Long]("n_y") == 5)
    assert(r.getAs[Double]("u_stat") == 1.323261)
    assert(r.getAs[Double]("v_stat") == -1.323261)
    assert(r.getAs[Double]("c_stat") == 0.921818)
    assert(r.getAs[Double]("p_value") == 0.397795)
  }
}
