package graft

import graft.dedup.Dedup
import graft.eda.{Concentration, StatTests}
import graft.ml.{Experiments, Stats}
import graft.text.Distinctive

/** Wave-40 kernels: ESS/design effect, first-seen dup share, energy
  * distance, Gini mean difference, Harrell's C, per-source KL. */
class WaveFortySpec extends SparkSpec {
  import spark.implicits._

  test("essProfile: equal weights cost nothing, skewed weights halve") {
    val df = Seq(("eq", 2.0), ("eq", 2.0), ("eq", 2.0), ("eq", 2.0),
      ("sk", 3.0), ("sk", 1.0)).toDF("g", "w")
    val r = Experiments.essProfile(df, "g", "w").collect()
    val eq = r.find(_.getString(0) == "eq").get
    assert(eq.getAs[Double]("ess") === 4.0)   // (8)^2 / 16
    assert(eq.getAs[Double]("deff") === 1.0)
    val sk = r.find(_.getString(0) == "sk").get
    assert(sk.getAs[Double]("ess") === 1.6)   // 16 / 10
    assert(sk.getAs[Double]("deff") === 1.25) // 2*10 / 16
  }

  test("firstSeenDupShare: later same-hash docs count as dups") {
    val df = Seq((1L, "a", "x"), (2L, "a", "x"), (3L, "b", "x"),
      (4L, "b", "y")).toDF("id", "src", "text")
    val r = Dedup.firstSeenDupShare(df, "id", "text", "src").collect()
    val a = r.find(_.getString(0) == "a").get
    assert(a.getAs[Long]("n_dups") === 1L) // doc 2 repeats doc 1
    assert(a.getAs[Double]("dup_share") === 0.5)
    val b = r.find(_.getString(0) == "b").get
    assert(b.getAs[Long]("n_dups") === 1L) // doc 3 repeats doc 1's text
  }

  test("energyDistance: zero iff same distribution, 2 for split masses") {
    val x = Seq(0.0, 1.0).toDF("v")
    val same = StatTests.energyDistance(x, x, "v").head()
    assert(same.getAs[Double]("e_between") === 0.5)
    assert(same.getAs[Double]("energy") === 0.0)
    val a = Seq(0.0, 0.0).toDF("v")
    val b = Seq(1.0, 1.0).toDF("v")
    val far = StatTests.energyDistance(a, b, "v").head()
    assert(far.getAs[Double]("e_between") === 1.0)
    assert(far.getAs[Double]("energy") === 2.0)
  }

  test("giniMeanDifference: {1,2,3} has GMD 4/3 and Gini 1/3") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0)).toDF("f", "v")
    val r = Concentration.giniMeanDifference(df, "f", "v").head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("mean") === 2.0)
    assert(r.getAs[Double]("gmd") === 1.333333)  // 2*(1+2+1)/(3*2)
    assert(r.getAs[Double]("gini") === 0.333333) // gmd / (2*mean)
  }

  test("concordanceIndex: risk score ordering and tie credit") {
    // A event@1 score 10, B censored@2 score 5, C event@3 score 7,
    // D censored@4 score 9: pairs (A,B)+ (A,C)+ (A,D)+ (C,D)-
    val df = Seq((1L, 1, 10L), (2L, 0, 5L), (3L, 1, 7L), (4L, 0, 9L))
      .toDF("t", "e", "p")
    val r = Stats.concordanceIndex(df, "t", "e", "p").head()
    assert(r.getAs[Long]("n_comparable") === 4L)
    assert(r.getAs[Long]("n_concordant") === 3L)
    assert(r.getAs[Long]("n_discordant") === 1L)
    assert(r.getAs[Double]("c_index") === 0.75)
    // a tied score contributes half credit
    val tied = Seq((1L, 1, 5L), (2L, 0, 5L)).toDF("t", "e", "p")
    assert(Stats.concordanceIndex(tied, "t", "e", "p")
      .head().getAs[Double]("c_index") === 0.5)
  }

  test("sourceKl: identical sources diverge by exactly zero") {
    val df = Seq(("a", "x y"), ("b", "x y")).toDF("src", "text")
    val r = Distinctive.sourceKl(df, "src", "text").collect()
    assert(r.length === 2)
    r.foreach { row =>
      assert(row.getAs[Long]("n_tokens") === 2L)
      assert(row.getAs[Double]("kl") === 0.0)
    }
    // a skewed source scores strictly positive
    val sk = Seq(("a", "x x x x"), ("b", "x y y y")).toDF("src", "text")
    val ka = Distinctive.sourceKl(sk, "src", "text").collect()
      .find(_.getString(0) == "a").get.getAs[Double]("kl")
    assert(ka > 0.0)
  }
}
