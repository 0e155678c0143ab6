package graft

import graft.dedup.Contamination
import graft.ml.Causal
import graft.operators.Events
import graft.text.CharStats
import org.apache.spark.sql.functions._

/** Wave-32 kernels: burstiness, IV Wald, sharp RD, ICC/DEFF,
  * char entropy, containment. */
class WaveThirtyTwoSpec extends SparkSpec {
  import spark.implicits._

  test("interEventBurstiness: metronome gaps give B = -1") {
    // user 1: perfectly regular 10s gaps -> sigma 0 -> B = -1
    val rows = (0 until 6).map(i =>
      (1L, f"2024-01-01 00:00:${i * 10}%02d"))
    val df = rows.toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val r = Events.interEventBurstiness(df, "user_id", "ts").head()
    assert(r.getAs[Long]("n_entities") === 1L)
    assert(r.getAs[Double]("mean_b") === -1.0)
    assert(r.getAs[Double]("share_bursty") === 0.0)
  }

  test("ivWald: noisy-compliance construction recovers the effect") {
    // Z shifts D take-up; Y = 10*D + 2*Z-independent noise
    val rows = (0 until 400).map { i =>
      val z = i % 2
      val d = if (z == 1) (if (i % 8 == 0) 0 else 1)
              else (if (i % 8 == 0) 1 else 0)
      val noise = (i % 5).toDouble - 2.0
      (z, d, 10.0 * d + noise)
    }
    val r = Causal.ivWald(rows.toDF("z", "d", "y"), "z", "d", "y")
      .head()
    assert(r.getAs[Double]("first_stage") > 0.5)
    assert(r.getAs[Double]("first_stage_f") > 50.0)
    assert(math.abs(r.getAs[Double]("beta_iv") - 10.0) < 1.0)
  }

  test("rddSharp: a planted jump at the cutoff is recovered") {
    // y = x below 10, x + 50 at/above 10; lattice x in 0..19
    val rows = (0 until 200).map { i =>
      val x = (i % 20).toDouble
      (x, if (x >= 10) x + 50.0 else x)
    }
    val r = Causal.rddSharp(rows.toDF("x", "y"), "x", "y",
      cutoff = 10.0, bandwidth = 10.0).head()
    assert(math.abs(r.getAs[Double]("effect") - 50.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("left_at_cutoff") - 10.0) < 1e-6)
  }

  test("iccDesignEffect: identical-within clusters give ICC 1") {
    // 3 clusters x 4 obs, zero within-variance
    val rows = (0 until 12).map(i => (i % 3, (i % 3) * 10.0 + 5))
    val r = Causal.iccDesignEffect(rows.toDF("c", "y"), "c", "y")
      .head()
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Double]("icc") === 1.0)
    assert(r.getAs[Double]("deff") === 4.0)
    // pure noise across clusters with identical means: ICC <= 0
    val flat = (0 until 12).map(i => (i % 3, (i % 4).toDouble))
    val r2 = Causal.iccDesignEffect(flat.toDF("c", "y"), "c", "y")
      .head()
    assert(r2.getAs[Double]("icc") <= 0.0)
  }

  test("charEntropyProfile: aaaa is junk, varied text is not") {
    val docs = Seq(("s1", 1L, "aaaa aaaa aaaa aaaa"),
      ("s1", 2L, "the quick brown fox jumps over a lazy dog now"))
      .toDF("source", "doc_id", "text")
    val r = CharStats.charEntropyProfile(docs, "source", "doc_id",
      "text", junkBelow = 1.0).head()
    assert(r.getAs[Long]("n_docs") === 2L)
    assert(r.getAs[Double]("min_h") < 1.0)
    assert(r.getAs[Double]("share_junk") === 0.5)
  }

  test("containmentPairs: a quoted fragment is contained, not similar") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " zeta eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega one two"
    val docs = Seq((1L, short), (2L, long), (3L, "totally other words"))
      .toDF("doc_id", "text")
    val r = Contamination.containmentPairs(docs, "doc_id", "text",
      n = 3, minC = 0.8).collect()
    // doc 1 fully contained in doc 2; reverse direction filtered by minC
    assert(r.length === 1)
    assert(r(0).getAs[Long]("doc_a") === 1L)
    assert(r(0).getAs[Double]("containment") === 1.0)
    assert(r(0).getAs[Double]("jaccard") < 0.5)
  }
}
