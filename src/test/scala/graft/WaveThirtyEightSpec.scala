package graft

import graft.eda.StatTests

/** Wave-38 kernels: CMH, dispersion index, CV CI, Friedman + Page. */
class WaveThirtyEightSpec extends SparkSpec {
  import spark.implicits._

  test("cmhTest: a constant within-stratum OR is pooled near it") {
    // both strata: exposed 3x the odds of outcome
    val rows =
      (1 to 40).map { i =>
        val e = i % 2
        val o = if (e == 1) (if (i % 8 < 6) 1 else 0)
                else (if (i % 8 < 3) 1 else 0)
        ("s1", e, o)
      } ++ (1 to 40).map { i =>
        val e = i % 2
        val o = if (e == 1) (if (i % 8 < 6) 1 else 0)
                else (if (i % 8 < 3) 1 else 0)
        ("s2", e, o)
      }
    val r = StatTests.cmhTest(rows.toDF("s", "e", "o"),
      "s", "e", "o").head()
    assert(r.getAs[Long]("k_strata") === 2L)
    assert(r.getAs[Double]("or_mh") > 2.0)
    assert(r.getAs[Double]("cmh_chi2") > 3.0)
  }

  test("dispersionIndex: constant counts give VMR 0, spread > 1") {
    val df = (Seq.fill(10)(("flat", 5L)) ++
      (1 to 10).map(i => ("burst", if (i % 2 == 0) 20L else 0L)))
      .toDF("g", "c")
    val r = StatTests.dispersionIndex(df, "g", "c").collect()
      .map(x => x.getAs[String]("group") -> x).toMap
    assert(r("flat").getAs[Double]("vmr") === 0.0)
    assert(r("burst").getAs[Double]("vmr") > 5.0)
  }

  test("cvWithCi: bounds bracket the point estimate") {
    val df = (1 to 50).map(i => ("g", 100.0 + (i % 11) - 5))
      .toDF("grp", "v")
    val r = StatTests.cvWithCi(df, "grp", "v").head()
    val cv = r.getAs[Double]("cv")
    assert(cv > 0 && cv < 0.1)
    assert(r.getAs[Double]("lo") < cv && cv < r.getAs[Double]("hi"))
  }

  test("friedmanPage: a monotone treatment effect fires both tests") {
    // 10 blocks, 3 ordered treatments, value strictly rises with t
    val rows = for (b <- 1 to 10; tr <- 0 to 2)
      yield (b, tr, tr * 10.0 + b)
    val r = StatTests.friedmanPage(rows.toDF("b", "t", "v"),
      "b", "t", "v").head()
    assert(r.getAs[Long]("b") === 10L)
    assert(r.getAs[Long]("k") === 3L)
    // perfect ordering: Friedman chi2 = 2b = 20, Page z = sqrt(2b)
    assert(r.getAs[Double]("friedman_chi2") === 20.0)
    assert(math.abs(r.getAs[Double]("page_z") - math.sqrt(20.0)) < 1e-6)
    // reversed order for one treatment kills Page but not Friedman
    val mixed = for (b <- 1 to 10; tr <- 0 to 2)
      yield (b, tr, (if (tr == 1) 30.0 else tr * 10.0) + b)
    val r2 = StatTests.friedmanPage(mixed.toDF("b", "t", "v"),
      "b", "t", "v").head()
    assert(r2.getAs[Double]("friedman_chi2") === 20.0)
    assert(r2.getAs[Double]("page_z") < r.getAs[Double]("page_z"))
  }
}
