package graft

import graft.eda.StatTests
import graft.ml.Ridge
import graft.operators.{Forecast, Reporting}
import graft.text.Distinctive
import org.apache.spark.sql.functions._

/** Wave-20 kernels: price indices, ridge CV, motif discovery, Gumbel
  * return levels, entropy rate, Cramér–von Mises. */
class WaveTwentySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("priceIndex: hand-solved two-item basket") {
    // m0: item1 (p=2, q=10), item2 (p=5, q=4)
    // m1: item1 (p=4, q=5),  item2 (p=5, q=4)
    // L = 60/40 = 1.5, P = 40/30 = 1.333333, F = sqrt(L·P)
    val rows = Seq(
      (d("2024-01-05"), 1L, 20.0, 10.0), (d("2024-01-20"), 2L, 20.0, 4.0),
      (d("2024-02-05"), 1L, 20.0, 5.0), (d("2024-02-20"), 2L, 20.0, 4.0))
      .toDF("dt", "item", "rev", "qty")
    val r = Reporting.priceIndex(rows, "dt", "item", "rev", "qty")
      .collect()
    assert(r.length === 2)
    val m1 = r(1)
    assert(m1.getAs[Long]("n_matched") === 2L)
    assert(m1.getAs[Double]("laspeyres") === 1.5)
    assert(m1.getAs[Double]("paasche") === 1.333333)
    assert(m1.getAs[Double]("fisher") === 1.414214)
    // base month indexes to exactly 1
    assert(r(0).getAs[Double]("fisher") === 1.0)
  }

  test("ridgeCv: lambda=0 wins on clean linear data; r2 ≈ 1") {
    val rows = (1 to 500).map { i =>
      val x1 = (i % 23).toDouble
      val x2 = (i % 7).toDouble
      (i.toLong, x1, x2, 3.0 + 2.0 * x1 - 1.5 * x2)
    }
    val r = Ridge.ridgeCv(rows.toDF("id", "x1", "x2", "y"),
      "id", "x1", "x2", "y").collect()
    assert(r.length === 6)
    val byLambda = r.map(x => x.getDouble(0) -> x.getDouble(1)).toMap
    assert(byLambda(0.0) > 0.999999) // exact fit at lambda = 0
    // heavier shrinkage on exact data can only hurt
    assert(byLambda(0.0) >= byLambda(8.0))
  }

  test("motifs: planted repeated weekly shape is the top motif") {
    // same 7-day shape at days 1-7 and 29-35 (scaled 2x — z-norm
    // matches shape, not level); noise elsewhere
    val shape = Seq(1.0, 5, 2, 8, 3, 9, 4)
    val noise = Seq(6.0, 1, 7, 2, 9, 3, 5, 8, 2, 6, 1, 9, 4, 7, 3, 8, 1, 5, 2, 7, 9)
    val vals = shape ++ noise ++ shape.map(_ * 2) ++ Seq(4.0, 6, 2)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-${i / 28 + 1}%02d-${i % 28 + 1}%02d 12:00:00"), v)
    }.toDF("ts", "value")
    val top = Forecast.motifs(df, "ts", "value", w = 7, topK = 1).head()
    assert(top.getAs[Double]("dist") === 0.0) // identical z-shape
  }

  test("gumbelReturnLevels: python-checked method-of-moments fit") {
    // 4 complete 7-day blocks whose maxima are 10, 12, 14, 16
    val vals = (0 until 28).map { i =>
      val blockMax = 10.0 + 2 * (i / 7)
      if (i % 7 == 3) blockMax else 1.0
    }
    val df = vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-${i + 1}%02d 12:00:00"), v) }.toDF("ts", "value")
    val r = Forecast.gumbelReturnLevels(df, "ts", "value")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(4L).getAs[Double]("mu") === 11.837968)
    assert(r(4L).getAs[Double]("beta") === 2.013168)
    assert(r(4L).getAs[Double]("return_level") === 14.346173)
    assert(r(52L).getAs[Double]("return_level") === 19.772973)
  }

  test("entropyRate: deterministic chain is fully redundant") {
    // every token determines the next → H(w2|w1) = 0, redundancy = 1
    val docs = (1 to 10).map(_ => "a b c d a b c d a b c d").toDF("text")
    val r = Distinctive.entropyRate(docs, "text").head()
    assert(r.getAs[Double]("h_cond") === 0.0)
    assert(r.getAs[Double]("redundancy") === 1.0)
    assert(r.getAs[Double]("h_unigram") > 1.3) // ~ln 4
    // iid-ish text has positive conditional entropy
    val free = Seq("a b a c a d b c b d c d",
      "b a c a d a c b d b d c").toDF("text")
    assert(Distinctive.entropyRate(free, "text").head()
      .getAs[Double]("h_cond") > 0.5)
  }

  test("cramerVonMises: hand-solved pooled-ECDF sum; identical → 0") {
    val a = Seq(1.0, 2, 3).toDF("v")
    val b = Seq(2.0, 3, 4).toDF("v")
    val r = StatTests.cramerVonMises(a, b, "v").head()
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("cvm") === 0.138889)
    val same = StatTests.cramerVonMises(a, a, "v").head()
    assert(same.getAs[Double]("cvm") === 0.0)
  }
}
