package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 56: OLS learning curve, winnow threshold spectrum,
  * MinHash reliability table (q511–q513). */
class WaveFiftySixSpec extends SparkSpec {
  import spark.implicits._

  test("learningCurve: exact linear data fits exactly at every fraction") {
    val df = (0L until 200L).map(k => (k, k.toDouble, 2.0 * k + 1.0))
      .toDF("k", "x", "y")
    val r = graft.ml.LearningCurve
      .simpleOlsCurve(df, "x", "y", col("k"))
      .collect().map(row => row.getAs[Int]("frac") -> row).toMap
    assert(r.keySet == Set(10, 20, 40, 80))
    val f80 = r(80)
    assert(f80.getAs[Double]("slope") == 2.0)
    assert(f80.getAs[Double]("intercept") == 1.0)
    assert(f80.getAs[Double]("r2_test") == 1.0)
    // train prefix grows monotonically with the fraction
    assert(r(10).getAs[Long]("n_train") < r(80).getAs[Long]("n_train"))
    // the holdout is the same fixed slice for every fraction
    assert(r(10).getAs[Long]("n_test") == r(80).getAs[Long]("n_test"))
  }

  test("winnowSpectrum: one dup pair yields one spectrum row") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq(
      (1L, shared), (2L, shared),
      (3L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val r = graft.dedup.Winnowing
      .sharedSpectrum(docs, "doc_id", "text", k = 3, w = 4, maxDf = 10)
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_shared") >= 1)
    assert(r.head.getAs[Long]("n_pairs") == 1)
    assert(r.head.getAs[Long]("n_pairs_at_least") == 1)
  }

  test("minhashReliability: identical and disjoint pairs land on the rails") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")
    ).toDF("doc_id", "text")
    val r = graft.dedup.SketchCalibration
      .minhashReliability(docs, "doc_id", "text", numHashes = 16,
        idCap = 200)
      .collect().map(row => row.getAs[Long]("decile") -> row).toMap
    val dup = r(10L) // (1,2): every salted minimum matches
    assert(dup.getAs[Long]("n_pairs") == 1)
    assert(dup.getAs[Double]("mean_est") == 1.0)
    assert(dup.getAs[Double]("mean_exact") == 1.0)
    assert(dup.getAs[Double]("mean_abs_err") == 0.0)
    val dis = r(0L) // (1,3), (2,3): no token overlap
    assert(dis.getAs[Long]("n_pairs") == 2)
    assert(dis.getAs[Double]("mean_exact") == 0.0)
    assert(dis.getAs[Double]("mean_est") == 0.0)
  }
}
