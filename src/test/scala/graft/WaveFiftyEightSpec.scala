package graft

/** Round-12 wave 58: exact isotonic calibration (minimax PAV) and the
  * empirical copula grid (q516–q517). */
class WaveFiftyEightSpec extends SparkSpec {
  import spark.implicits._

  test("isotonic: adjacent violators pool to the interval mean") {
    // buckets (w=2 each): frac_pos (0.5, 0.0, 1.0) -> PAV pools the
    // first two to 1/4; third stays 1.0
    val df = Seq(
      (0.0, true), (0.0, false),
      (1.0, false), (1.0, false),
      (2.5, true), (2.5, true)
    ).toDF("score", "label")
    val r = graft.ml.Isotonic.calibrate(df, "score", "label", buckets = 3)
      .collect().map(x => x.getAs[Int]("bucket") -> x).toMap
    assert(r(0).getAs[Double]("frac_pos") == 0.5)
    assert(r(1).getAs[Double]("frac_pos") == 0.0)
    assert(r(2).getAs[Double]("frac_pos") == 1.0)
    assert(r(0).getAs[Double]("iso_prob") == 0.25)
    assert(r(1).getAs[Double]("iso_prob") == 0.25)
    assert(r(2).getAs[Double]("iso_prob") == 1.0)
    // the fit is non-decreasing by construction
    val iso = (0 to 2).map(i => r(i).getAs[Double]("iso_prob"))
    assert(iso == iso.sorted)
  }

  test("isotonic: already-monotone buckets are untouched") {
    val df = Seq(
      (0.0, false), (0.0, false),
      (1.0, true), (1.0, false),
      (2.5, true), (2.5, true)
    ).toDF("score", "label")
    val r = graft.ml.Isotonic.calibrate(df, "score", "label", buckets = 3)
      .collect().map(x => x.getAs[Int]("bucket") -> x).toMap
    assert(r(0).getAs[Double]("iso_prob") == 0.0)
    assert(r(1).getAs[Double]("iso_prob") == 0.5)
    assert(r(2).getAs[Double]("iso_prob") == 1.0)
  }

  test("copulaGrid: perfect dependence concentrates on the diagonal") {
    val df = (1 to 100).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val r = graft.eda.Copula.copulaGrid(df, "x", "y").collect()
    assert(r.length == 10)
    r.foreach { row =>
      assert(row.getAs[Long]("u_decile") == row.getAs[Long]("v_decile"))
      assert(row.getAs[Long]("n") == 10)
      assert(row.getAs[Double]("density_ratio") == 10.0)
    }
  }
}
