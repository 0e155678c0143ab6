package graft

import graft.eda.{Quality, Robust}
import graft.ml.Stats
import graft.text.Bursts
import org.apache.spark.sql.functions._

/** Wave-24 kernels: RMST, Simpson detector, slice scan, agreement,
  * term burstiness, median CI. */
class WaveTwentyFourSpec extends SparkSpec {
  import spark.implicits._

  test("rmst: hand-integrated KM ladder; tau caps the area") {
    val life = (1 to 10).map(t => (t.toDouble, 1)).toDF("dur", "event")
    val r = Stats.rmst(life, "dur", "event", tau = 5.0).head()
    assert(r.getAs[Double]("rmst") === 4.0)
    assert(r.getAs[Double]("rmst_frac") === 0.8)
    assert(r.getAs[Double]("median_t") === 5.0)
    // tau beyond the last event: the tail survivor share extends flat
    val r2 = Stats.rmst(life, "dur", "event", tau = 20.0).head()
    assert(r2.getAs[Double]("rmst") < 20.0)
    assert(r2.getAs[Double]("median_t") === 5.0)
  }

  test("simpsonDetector: offset groups reverse the pooled slope") {
    // within each group y falls with x; across groups the offsets
    // make the pooled slope rise — the textbook paradox
    val rows = (0 until 10).flatMap(i => Seq(
      ("g1", i.toDouble, 10.0 - i),
      ("g2", 10.0 + i, 30.0 - (10.0 + i)))) ++
      (0 until 20).flatMap(i => Seq( // pad to minN
        ("g1", (i % 10).toDouble, 10.0 - i % 10),
        ("g2", 10.0 + i % 10, 30.0 - (10.0 + i % 10))))
    val r = Stats.simpsonDetector(rows.toDF("g", "x", "y"), "g", "x", "y",
      minN = 30).head()
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Double]("overall_slope") > 0)
    assert(r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Boolean]("strict_paradox"))
    assert(r.getAs[Double]("reversal_share") === 1.0)
  }

  test("sliceScan: the planted hot slice tops the scan") {
    val rows = (1 to 200).map { i =>
      val a = if (i % 2 == 0) "x" else "y"
      val b = if (i % 3 == 0) "p" else "q"
      val v = if (a == "x" && b == "p") 100.0 else 10.0 + (i % 5)
      (a, b, v)
    }
    val top = Quality.sliceScan(rows.toDF("a", "b", "v"), "a", "b", "v",
      minN = 10, topK = 2).head()
    assert(top.getString(0) === "x" && top.getString(1) === "p")
    assert(top.getAs[Double]("z") > 5.0)
  }

  test("agreement: constant shift → CCC < r = 1; python-checked CCC") {
    val rows = (1 to 10).map(i => (i.toDouble, i + 1.0))
    val r = Stats.agreement(rows.toDF("x", "y"), "x", "y").head()
    assert(r.getAs[Double]("bias") === -1.0)
    assert(r.getAs[Double]("loa_lo") === -1.0) // zero-variance diffs
    assert(r.getAs[Double]("pearson_r") === 1.0)
    assert(r.getAs[Double]("ccc") === 0.942857)
  }

  test("termBurstiness: a clumped term outranks an even one") {
    // "burst" occurs 30x but only in 2 docs; "even" once per doc
    val docs = (Seq((1L, ("burst " * 15).trim), (2L, ("burst " * 15).trim)) ++
      (3 to 32).map(i => (i.toLong, s"even filler$i words$i here$i")))
      .toDF("doc_id", "text")
    val r = Bursts.termBurstiness(docs, "doc_id", "text", minCf = 20,
      topK = 5).collect()
    assert(r.head.getString(0) === "burst")
    assert(r.head.getAs[Long]("cf") === 30L && r.head.getAs[Long]("df") === 2L)
    assert(r.head.getAs[Double]("burstiness") === 15.0)
    assert(r.head.getAs[Double]("clumping") > 5.0)
  }

  test("medianCi: rank construction on 1..100") {
    val vals = (1 to 100).map(_.toDouble).toDF("v")
    val r = Robust.medianCi(vals, "v").head()
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Double]("median") === 50.5)
    assert(r.getAs[Double]("ci_lo") === 40.0) // x_(40)
    assert(r.getAs[Double]("ci_hi") === 61.0) // x_(61)
  }
}
