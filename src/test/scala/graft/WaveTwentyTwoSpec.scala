package graft

import graft.dedup.Dedup
import graft.eda.Concentration
import graft.ml.Stats
import graft.operators.Forecast
import graft.text.Distinctive
import org.apache.spark.sql.functions._

/** Wave-22 kernels: Heaps' law, Weibull fit, Newey–West, Hill tail,
  * Chapman dedup completeness, ECE/Brier. */
class WaveTwentyTwoSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0))

  test("heapsLaw: closed vocabulary → beta near 0; id-noise → beta near 1") {
    val closed = (1 to 400).map(i =>
      (i.toLong, "same small set of words every time")).toDF("id", "text")
    val rc = Distinctive.heapsLaw(closed, "id", "text").head()
    assert(rc.getAs[Double]("beta") < 0.15)
    val noise = (1 to 400).map(i =>
      (i.toLong, s"tok${i}a tok${i}b tok${i}c tok${i}d")).toDF("id", "text")
    val rn = Distinctive.heapsLaw(noise, "id", "text").head()
    assert(rn.getAs[Double]("beta") > 0.95)
    assert(rn.getAs[Double]("r2") > 0.99)
  }

  test("weibullFit: python-checked MRR over a clean KM ladder") {
    // 10 subjects, events at t = 1..10 → KM steps 0.9, 0.8, … 0.1
    val life = (1 to 10).map(t => (t.toDouble, 1)).toDF("dur", "event")
    val r = Stats.weibullFit(life, "dur", "event").head()
    assert(r.getAs[Long]("n_points") === 9L)
    assert(r.getAs[Double]("shape") === 1.355054)
    assert(r.getAs[Double]("ln_scale") === 1.784146)
    assert(r.getAs[Double]("r2") === 0.978759)
  }

  test("neweyWestSe: trending series inflates the SE; iid-ish does not") {
    val trend = (0 until 64).map(i => (day(i), i.toDouble))
      .toDF("ts", "value")
    val rt = Forecast.neweyWestSe(trend, "ts", "value").head()
    assert(rt.getAs[Double]("inflation") > 1.5)
    // alternating series: negative lag-1 autocorr → DEFLATED SE
    val alt = (0 until 64).map(i =>
      (day(i), if (i % 2 == 0) 1.0 else -1.0)).toDF("ts", "value")
    val ra = Forecast.neweyWestSe(alt, "ts", "value").head()
    assert(ra.getAs[Double]("inflation") < 1.0)
  }

  test("hillTailIndex: recovers alpha = 2 on an exact Pareto grid") {
    // x_i = (i/n)^(-1/2), i = 1..1000 — a Pareto(α=2) quantile grid
    val xs = (1 to 1000).map(i => math.pow(i / 1000.0, -0.5)).toDF("v")
    val r = Concentration.hillTailIndex(xs, "v", k = 100).head()
    assert(r.getAs[Long]("n") === 1000L)
    assert(r.getAs[Double]("x_k1") === 3.146584)
    assert(r.getAs[Double]("hill_alpha") === 2.045561)
  }

  test("dedupCompleteness: both detectors see the planted dups; Chapman sane") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = (Seq(
      (1L, s"$shared one two"), (2L, s"$shared three four")) ++
      (3 to 30).map(i => (i.toLong,
        s"unique$i words$i only$i here$i filler$i more$i stuff$i " +
          s"pad$i tail$i end$i"))).toDF("doc_id", "text")
    val r = Dedup.dedupCompleteness(docs, "doc_id", "text").head()
    // the 9-token shared prefix yields 5-gram AND 8-gram anchors for
    // pair (1,2) → both detectors catch it, overlap = 1
    assert(r.getAs[Long]("n_a") >= 1L && r.getAs[Long]("n_b") >= 1L)
    assert(r.getAs[Long]("n_both") >= 1L)
    assert(r.getAs[Long]("est_total_pairs") >= r.getAs[Long]("n_both"))
  }

  test("eceBrier: perfect calibration → ece 0; Murphy identity holds") {
    // p equals the within-bin rate exactly: p=0.25 with 1/4 positive
    val rows = (1 to 80).map { i =>
      if (i <= 40) (0.25, if (i % 4 == 0) 1 else 0)
      else (0.75, if (i % 4 != 0) 1 else 0)
    }
    val r = Stats.eceBrier(rows.toDF("p", "y"), "p", "y").head()
    assert(r.getAs[Double]("ece") === 0.0)
    assert(r.getAs[Double]("reliability") === 0.0)
    // constant-p-per-bin → Brier = REL − RES + UNC exactly
    val brier = r.getAs[Double]("brier")
    val m = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(brier - m) < 1e-5)
  }
}
