package graft

import graft.dedup.Contamination
import graft.eda.StatTests
import graft.operators.Forecast
import graft.text.Scrub
import org.apache.spark.sql.functions._

/** Wave-45 kernels: grouped KS, turning points, von Neumann ratio,
  * cost curve, contamination sweep, defect scan. */
class WaveFortyFiveSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (String, Double)*) =
    rows.map { case (d, v) =>
      (java.sql.Timestamp.valueOf(d + " 12:00:00"), v) }
      .toDF("ts", "value")

  test("ksByGroup: disjoint sides hit D = 1, identical sides D = 0") {
    val df = Seq(("g", 1, 1.0), ("g", 1, 2.0), ("g", 0, 3.0),
      ("g", 0, 4.0), ("h", 1, 1.0), ("h", 1, 2.0), ("h", 0, 1.0),
      ("h", 0, 2.0)).toDF("g", "a", "v")
    val r = StatTests.ksByGroup(df, "g", "a", "v").collect()
    assert(r.find(_.getString(0) == "g").get
      .getAs[Double]("d_stat") === 1.0)
    assert(r.find(_.getString(0) == "h").get
      .getAs[Double]("d_stat") === 0.0)
  }

  test("turningPoints: a zig-zag turns at every interior day") {
    val df = ev("2024-01-01" -> 10.0, "2024-01-02" -> 20.0,
      "2024-01-03" -> 10.0, "2024-01-04" -> 20.0,
      "2024-01-05" -> 10.0)
    val r = Forecast.turningPoints(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_turning") === 3L)
    assert(r.getAs[Double]("expected") === 2.0)
    val z = r.getAs[Double]("z_stat")
    assert(z > 1.32 && z < 1.33)
  }

  test("vonNeumann: pure alternation doubles the iid ratio") {
    val df = ev("2024-01-01" -> 10.0, "2024-01-02" -> 20.0,
      "2024-01-03" -> 10.0, "2024-01-04" -> 20.0)
    val r = Forecast.vonNeumann(df, "ts", "value").head()
    assert(r.getAs[Long]("n_days") === 4L)
    assert(r.getAs[Double]("vn_ratio") === 3.0)
    assert(r.getAs[Double]("z_stat") === 1.369306) // 1/sqrt(8/15)
  }

  test("costCurve: asymmetric costs pick the recall-heavy threshold") {
    val df = (Seq.fill(2)((0.9, 1)) ++ Seq((0.5, 1), (0.5, 0)) ++
      Seq.fill(8)((0.1, 0))).toDF("s", "y")
    val r = StatTests.costCurve(df, "s", "y", costFp = 1L,
      costFn = 5L).head()
    assert(r.getAs[Double]("best_threshold") === 0.5)
    assert(r.getAs[Long]("n_fp") === 1L)
    assert(r.getAs[Long]("n_fn") === 0L)
    assert(r.getAs[Long]("min_cost") === 1L)
    assert(r.getAs[Long]("baseline_cost") === 9L)
  }

  test("contaminationSweep: per-benchmark leak summary, one pass") {
    val df = Seq((2L, "a b c"), (4L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val r = Contamination.contaminationSweep(df, "doc_id", "text",
      Seq("even" -> (col("doc_id") % 2 === 0),
        "two" -> (col("doc_id") === 2)), n = 3).collect()
    val even = r.find(_.getString(0) == "even").get
    assert(even.getAs[Long]("n_eval") === 2L)
    assert(even.getAs[Double]("mean_overlap") === 0.0)
    val two = r.find(_.getString(0) == "two").get
    assert(two.getAs[Double]("mean_overlap") === 1.0) // doc 4 leaks it
    assert(two.getAs[Long]("n_contaminated") === 1L)
  }

  test("defectScan: each planted defect lands in its own counter") {
    val df = Seq(("s", "ok text here"),
      ("s", "num 1234567890 1234567890"),
      ("s", "glued" + "x" * 120),
      ("s", "bad � char"),
      ("s", "  ")).toDF("src", "text")
    val r = Scrub.defectScan(df, "src", "text").head()
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_replacement") === 1L)
    assert(r.getAs[Long]("n_long_word") === 1L)
    assert(r.getAs[Long]("n_digit_heavy") === 1L)
    assert(r.getAs[Long]("n_blank") === 1L)
    assert(r.getAs[Double]("defect_rate") === 0.8)
  }
}
