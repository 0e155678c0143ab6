package graft

import graft.eda.Robust
import graft.ml.{Causal, Stats}
import org.apache.spark.sql.functions._

/** Wave-35 kernels: Sobel mediation, EB shrinkage, stratified ATE,
  * cumulative incidence, MCF, quantile map. */
class WaveThirtyFiveSpec extends SparkSpec {
  import spark.implicits._

  test("sobelMediation: a planted x->m->y chain is recovered") {
    val rows = (1 to 60).map { i =>
      val x = (i % 10 + 1).toDouble
      val e1 = if (i % 2 == 0) 0.5 else -0.5
      val e2 = if (i % 3 == 0) 1.0 else -0.5
      val m = 2.0 * x + e1
      (x, m, 3.0 * m + e2)
    }
    val r = Causal.sobelMediation(rows.toDF("x", "m", "y"),
      "x", "m", "y").head()
    assert(math.abs(r.getAs[Double]("a") - 2.0) < 0.1)
    assert(math.abs(r.getAs[Double]("b") - 3.0) < 0.2)
    assert(math.abs(r.getAs[Double]("indirect") - 6.0) < 0.5)
    assert(r.getAs[Double]("sobel_z") > 10.0)
  }

  test("ebShrinkMeans: the small noisy group shrinks harder") {
    val big = (1 to 200).map(i =>
      ("big", 10.0 + (if (i % 2 == 0) 1.0 else -1.0)))
    val small = (1 to 5).map(i =>
      ("small", 50.0 + (i % 3) * 10.0))
    val r = Causal.ebShrinkMeans((big ++ small).toDF("g", "v"),
      "g", "v").collect().map(x => x.getAs[String]("group") -> x).toMap
    assert(r("big").getAs[Double]("weight") >
      r("small").getAs[Double]("weight"))
    // shrunk means sit between raw mean and the grand mean of means
    val rawS = r("small").getAs[Double]("raw_mean")
    val shrS = r("small").getAs[Double]("shrunk_mean")
    assert(shrS < rawS && shrS > 10.0)
  }

  test("stratifiedAte: constant within-stratum effect is recovered") {
    // diff = 2 in both strata; assignment heavily confounded
    val rows =
      (1 to 40).map(i => ("s1", if (i <= 36) 1 else 0,
        (if (i <= 36) 10.0 else 8.0) + 0.0)) ++
      (1 to 40).map(i => ("s2", if (i <= 4) 1 else 0,
        (if (i <= 4) 20.0 else 18.0) + 0.0))
    val r = Causal.stratifiedAte(rows.toDF("s", "tr", "y"),
      "s", "tr", "y").head()
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Double]("adjusted_ate") === 2.0)
    // naive is biased away from 2 by the confounding
    assert(math.abs(r.getAs[Double]("naive_diff") - 2.0) > 1.0)
  }

  test("cumulativeIncidence: three-subject life table by hand") {
    val life = Seq((1.0, 1), (2.0, 2), (3.0, 0)).toDF("dur", "cause")
    val rows = Stats.cumulativeIncidence(life, "dur", "cause")
      .orderBy("t").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("cif1") === 0.333333)
    assert(rows(0).getAs[Double]("cif2") === 0.0)
    // t=2: S(1-) = 2/3 (6dp), cif2 = 2/3 * 1/2
    assert(math.abs(rows(1).getAs[Double]("cif2") - 1.0 / 3) < 1e-5)
    assert(rows(1).getAs[Double]("cif1") === 0.333333)
  }

  test("meanCumulativeFunction: hand-counted recurrent errors") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "error"),
      (1L, "2024-01-02 10:00:00", "error"),
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-02 09:00:00", "error"))
      .toDF("user_id", "s", "event_type")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"),
        col("event_type"))
    val rows = Stats.meanCumulativeFunction(df, "user_id", "ts",
      isEvent = col("event_type") === "error")
      .orderBy("day_offset").collect()
    assert(rows(0).getAs[Int]("day_offset") === 0)
    assert(rows(0).getAs[Double]("mcf") === 0.5)
    assert(rows(1).getAs[Double]("mcf") === 1.5)
  }

  test("quantileMap: a constant location shift maps as the shift") {
    val a = (1 to 10).map(_.toDouble).toDF("v")
    val b = (1 to 10).map(_ + 10.0).toDF("v")
    val rows = Robust.quantileMap(a, b, "v").collect()
    assert(rows.length === 9)
    assert(rows.forall(_.getAs[Double]("shift") === 10.0))
  }
}
