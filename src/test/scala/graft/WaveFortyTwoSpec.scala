package graft

import graft.eda.{MultipleTesting, SkewReport, StatTests}
import graft.ml.Experiments
import graft.operators.Forecast

/** Wave-42 kernels: shard-skew audit, Holm step-down, TOST
  * equivalence, proportion power, variance changepoint, grouped
  * Theil–Sen. */
class WaveFortyTwoSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Double)*) =
    rows.map { case (d, v) =>
      (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")

  test("shardSkewAudit: one key is one shard; many keys spread") {
    val one = Seq.fill(50)("k").toDF("k")
    val r1 = SkewReport.shardSkewAudit(one, "k", hexChars = 1).head()
    assert(r1.getAs[Long]("n_shards") === 1L)
    assert(r1.getAs[Double]("skew_ratio") === 1.0)
    assert(r1.getAs[Double]("top_share") === 1.0)
    val many = (1 to 1600).map(_.toString).toDF("k")
    val r2 = SkewReport.shardSkewAudit(many, "k", hexChars = 1).head()
    assert(r2.getAs[Long]("n_shards") === 16L)
    assert(r2.getAs[Long]("n_rows") === 1600L)
    assert(r2.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("pairwiseTestsHolm: step-down monotone, separated arms flagged") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0, 14.0).map(("b", _)) ++
      Seq(6.0, 7.0, 8.0, 9.0).map(("c", _))).toDF("g", "v")
    val r = MultipleTesting.pairwiseTestsHolm(df, "g", "v").collect()
    assert(r.length === 3)
    assert(r.map(_.getAs[Int]("holm_rank")).toSeq === Seq(1, 2, 3))
    val adj = r.map(_.getAs[Double]("p_holm"))
    assert(adj.zip(adj.tail).forall { case (x, y) => x <= y })
    r.foreach { row =>
      assert(row.getAs[Double]("p_holm")
        >= row.getAs[Double]("p_value"))
      assert(row.getAs[Boolean]("significant"))
    }
  }

  test("tostEquivalence: same mean is equivalent only at a real margin") {
    val df = (Seq(9.0, 10.0, 11.0).map(("A", _)) ++
      Seq(10.0, 10.0, 10.0).map(("N", _))).toDF("arm", "v")
    val wide = Experiments.tostEquivalence(df, "arm", "v", "A", "N",
      margin = 2.0).head()
    assert(wide.getAs[Double]("diff") === 0.0)
    assert(wide.getAs[Boolean]("equivalent"))
    val tight = Experiments.tostEquivalence(df, "arm", "v", "A", "N",
      margin = 0.5).head()
    assert(!tight.getAs[Boolean]("equivalent"))
  }

  test("powerProportions: closed form matches the scalar math") {
    val df = (Seq.fill(50)(1) ++ Seq.fill(150)(0)).toDF("conv")
    val r = StatTests.powerProportions(df, "conv", delta = 0.05).head()
    assert(r.getAs[Double]("p_base") === 0.25)
    assert(r.getAs[Double]("p_target") === 0.3)
    val (p1, p2, za, zb) = (0.25, 0.30, 1.959964, 0.841621)
    val pbar = (p1 + p2) / 2
    val expected = math.ceil(math.pow(
      za * math.sqrt(2 * pbar * (1 - pbar)) +
        zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2) /
      (0.05 * 0.05)).toLong
    assert(r.getAs[Long]("n_per_arm") === expected)
    assert(r.getAs[Long]("total_n") === 2 * expected)
  }

  test("varianceChangepoint: a clean step explains all the variance") {
    val df = ev("2024-01-01" -> 10.0, "2024-01-02" -> 10.0,
      "2024-01-03" -> 20.0, "2024-01-04" -> 20.0)
    val r = Forecast.varianceChangepoint(df, "ts", "value").head()
    assert(r.getAs[String]("split_day") === "2024-01-02")
    assert(r.getAs[Double]("mean_left") === 10.0)
    assert(r.getAs[Double]("mean_right") === 20.0)
    assert(r.getAs[Double]("var_explained") === 1.0)
  }

  test("senSlopeByGroup: per-group median pairwise slope") {
    val df = Seq(
      ("up", "2024-01-01", 10.0), ("up", "2024-01-02", 20.0),
      ("up", "2024-01-03", 30.0),
      ("flat", "2024-01-01", 5.0), ("flat", "2024-01-02", 5.0),
      ("flat", "2024-01-03", 5.0))
      .map { case (g, d, v) =>
        (g, java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("g", "ts", "value")
    val r = Forecast.senSlopeByGroup(df, "g", "ts", "value").collect()
    val up = r.find(_.getString(0) == "up").get
    assert(up.getAs[Long]("n_days") === 3L)
    assert(up.getAs[Long]("n_pairs") === 3L)
    assert(up.getAs[Double]("sen_slope") === 10.0)
    assert(r.find(_.getString(0) == "flat").get
      .getAs[Double]("sen_slope") === 0.0)
  }
}
