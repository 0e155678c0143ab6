package graft

import graft.dedup.Dedup
import graft.eda.StatTests
import graft.ml.{Ridge, Stats}
import graft.proximity.Graph
import graft.text.Bursts
import org.apache.spark.sql.functions._

/** Wave-16 kernels: LSH tuning harness, degree assortativity, Fisher
  * exact, term bursts, Chow break test, Brown–Forsythe. */
class WaveSixteenSpec extends SparkSpec {
  import spark.implicits._

  test("minhashLshStats: exact duplicates are always recalled; found ⊆ true") {
    // 3 identical docs (pairwise jaccard = 1, identical signatures →
    // identical band keys → all 3 pairs are candidates) + 17 distinct
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1 to 3).map(i => (i.toLong, dup)) ++
      (4 to 20).map(i => (i.toLong,
        s"unique document number $i with entirely different words " +
          s"alpha$i beta$i gamma$i delta$i epsilon$i"))).toDF("id", "text")
    val r = Dedup.minhashLshStats(docs, "id", "text", threshold = 0.9).head()
    assert(r.getAs[Long]("n_docs") === 20L)
    assert(r.getAs[Long]("n_true_pairs") === 3L)
    assert(r.getAs[Long]("n_found_pairs") === 3L)
    assert(r.getAs[Double]("recall") === 1.0)
    // found is verified against the same truth → precision well-defined
    assert(r.getAs[Long]("n_found_pairs") <= r.getAs[Long]("n_candidates"))
    assert(r.getAs[Double]("cand_precision") > 0.0)
  }

  test("minhashLshStats: refuses unbounded input (exhaustive harness)") {
    val big = spark.range(0, 50).select(col("id"),
      concat(lit("doc "), col("id")).as("text"))
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashLshStats(big, "id", "text", maxSample = 10).head()
    }
    assert(e.getMessage.contains("maxSample"))
  }

  test("assortativity: star is -1, regular ring is degenerate (null)") {
    // K1,3 star: center degree 3 pairs with leaves degree 1 → r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val rs = Graph.assortativity(star).head()
    assert(rs.getAs[Long]("n_nodes") === 4L)
    assert(rs.getAs[Long]("n_edges") === 3L)
    assert(rs.getAs[Double]("assortativity") === -1.0)
    // 4-cycle: every degree = 2 → zero variance → null by contract
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val rr = Graph.assortativity(ring).head()
    assert(rr.getAs[Long]("n_edges") === 4L)
    assert(rr.isNullAt(rr.fieldIndex("assortativity")))
    // duplicate + reversed + self-loop edges collapse before counting
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 2L), (0L, 2L),
      (0L, 3L)).toDF("src", "dst")
    assert(Graph.assortativity(messy).head().getAs[Long]("n_edges") === 3L)
  }

  test("fisherExact: matches the closed-form hypergeometric sum") {
    // 2x2 = [[1,9],[11,3]]: scipy-checked two-sided p = 0.002759
    val rows = Seq.fill(1)((1, 1)) ++ Seq.fill(9)((1, 0)) ++
      Seq.fill(11)((0, 1)) ++ Seq.fill(3)((0, 0))
    val r = Stats.fisherExact(rows.toDF("r", "c"), "r", "c").head()
    assert((r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"), r.getAs[Long]("d")) === ((1L, 9L, 11L, 3L)))
    assert(r.getAs[Double]("p_value") === 0.002759)
    assert(math.abs(r.getAs[Double]("odds_ratio") - 0.030303) < 1e-6)
    // symmetric-ish table [[3,1],[1,3]]: p = 0.485714
    val rows2 = Seq.fill(3)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(1)((0, 1)) ++ Seq.fill(3)((0, 0))
    val r2 = Stats.fisherExact(rows2.toDF("r", "c"), "r", "c").head()
    assert(r2.getAs[Double]("p_value") === 0.485714)
  }

  test("termBursts: a batch-exclusive term bursts only in its batch") {
    // "krakatoa" appears 20x in batch 1 and nowhere else; filler terms
    // are uniform across batches (z <= 0 → filtered out)
    val docs = ((1 to 20).map(_ => (1, "krakatoa common filler words here")) ++
      (1 to 20).map(_ => (2, "common filler words here again")) ++
      (1 to 20).map(_ => (3, "common filler words here again"))).toDF("batch", "text")
    val r = Bursts.termBursts(docs, "batch", "text", minCount = 10)
    val k = r.filter(col("term") === "krakatoa").collect()
    assert(k.length === 1 && k(0).getAs[Int]("batch") === 1)
    assert(k(0).getAs[Long]("n_in") === 20L && k(0).getAs[Long]("n_rest") === 0L)
    assert(k(0).getAs[Double]("rate_rest") === 0.0)
    assert(k(0).getAs[Double]("z_burst") > 5.0)
    // uniform terms never appear as bursts in every batch: a term at
    // its base rate everywhere has z <= 0 in at least one batch
    val uni = r.filter(col("term") === "common")
    assert(uni.count() < 3)
  }

  test("chowTest: detects a slope break; no break → F ≈ 0") {
    // regime A: y = 2x (+0.1 once), regime B: y = 10 - x (+0.1 once)
    val pts = (1 to 5).map(x => (x.toDouble,
        2.0 * x + (if (x == 3) 0.1 else 0.0), true)) ++
      (1 to 5).map(x => (x.toDouble,
        10.0 - x + (if (x == 2) 0.1 else 0.0), false))
    val r = Ridge.chowTest(pts.toDF("x", "y", "s"), "x", "y", "s").head()
    assert(r.getAs[Long]("n_a") === 5L && r.getAs[Long]("n_b") === 5L)
    assert(math.abs(r.getAs[Double]("f_chow") - 9560.1) < 1e-3)
    assert(math.abs(r.getAs[Double]("r2_pooled") - 0.09296) < 1e-6)
    assert(math.abs(r.getAs[Double]("r2_split") - 0.999715) < 1e-6)
    // identical line + identical scatter in both regimes → F = 0
    val same = (1 to 6).flatMap(x => Seq(
      (x.toDouble, 3.0 * x + (if (x % 2 == 0) 0.5 else -0.5), true),
      (x.toDouble, 3.0 * x + (if (x % 2 == 0) 0.5 else -0.5), false)))
    val r0 = Ridge.chowTest(same.toDF("x", "y", "s"), "x", "y", "s").head()
    assert(math.abs(r0.getAs[Double]("f_chow")) < 1e-6)
  }

  test("brownForsythe: equal spreads → F = 0; unequal spreads → large F") {
    // same shape shifted: identical |x - median| deviations → F = 0
    val eq = Seq(1, 2, 3, 4, 5).map(v => ("a", v.toDouble)) ++
      Seq(11, 12, 13, 14, 15).map(v => ("b", v.toDouble))
    val r0 = StatTests.brownForsythe(eq.toDF("g", "v"), "g", "v").head()
    assert(r0.getAs[Long]("k") === 2L && r0.getAs[Long]("n") === 10L)
    assert(r0.getAs[Double]("f_bf") === 0.0)
    // 10x the spread in group b: python-checked F = 8.248939
    val ne = Seq(1, 2, 3, 4, 5).map(v => ("a", v.toDouble)) ++
      Seq(10, 20, 30, 40, 50).map(v => ("b", v.toDouble))
    val r1 = StatTests.brownForsythe(ne.toDF("g", "v"), "g", "v").head()
    assert(math.abs(r1.getAs[Double]("f_bf") - 8.248939) < 1e-6)
  }
}
