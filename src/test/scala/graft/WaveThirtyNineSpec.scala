package graft

import graft.eda.{DataAudit, Robust, StatTests}
import org.apache.spark.sql.functions._

/** Wave-39 kernels: robust spread, 1-sample KS-uniform, top-k churn. */
class WaveThirtyNineSpec extends SparkSpec {
  import spark.implicits._

  test("robustSpread: median/MAD shrug off a planted outlier") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0, 5.0, 1000.0).map(("g", _)))
      .toDF("grp", "v")
    val r = Robust.robustSpread(df, "grp", "v").head()
    assert(r.getAs[Double]("median") === 3.5)
    // |v - 3.5| = {2.5, 1.5, 0.5, 0.5, 1.5, 996.5} -> median 1.5
    assert(r.getAs[Double]("mad") === 1.5)
  }

  test("ksUniform: an exact uniform grid has D = 1/n") {
    // values at i/10 for i=1..10 on [0,1]: F-hat steps hit F0 exactly
    // from above at each point; the max gap is the step size 0.1
    val df = (1 to 10).map(_ / 10.0).toDF("v")
    val r = StatTests.ksUniform(df, "v", 0.0, 1.0).head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("d_stat") === 0.1)
    // a point mass is maximally non-uniform
    val mass = Seq.fill(20)(0.5).toDF("v")
    assert(StatTests.ksUniform(mass, "v", 0.0, 1.0)
      .head().getAs[Double]("d_stat") === 0.5)
  }

  test("topkChurn: identical periods overlap fully, disjoint not at all") {
    val df = (1L to 30L).flatMap(e => Seq((e, 100.0 - e, true),
      (e, 100.0 - e, false))).toDF("e", "v", "pa")
    val r = DataAudit.topkChurn(df, "e", "v", col("pa"), k = 5).head()
    assert(r.getAs[Long]("n_overlap") === 5L)
    assert(r.getAs[Double]("jaccard") === 1.0)
    // disjoint winners: period A tops 1..5, period B tops 26..30
    val dj = (1L to 30L).flatMap(e => Seq(
      (e, if (e <= 5) 100.0 else 1.0, true),
      (e, if (e > 25) 100.0 else 1.0, false))).toDF("e", "v", "pa")
    val r2 = DataAudit.topkChurn(dj, "e", "v", col("pa"), k = 5).head()
    assert(r2.getAs[Long]("n_overlap") === 0L)
    assert(r2.getAs[Double]("jaccard") === 0.0)
  }
}
