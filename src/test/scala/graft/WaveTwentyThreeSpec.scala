package graft

import graft.dedup.Dedup
import graft.ml.Stats
import graft.operators.Reporting
import graft.proximity.Embeddings
import org.apache.spark.sql.functions._

/** Wave-23 kernels: decile migration, Cochran–Armitage, GK gamma,
  * Krippendorff alpha, cross-source dups, TwoNN intrinsic dim. */
class WaveTwentyThreeSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Timestamp.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i).atTime(12, 0))

  test("decileMigration: shares sum to 1 per d1; stable spend stays put") {
    // 40 users, identical spend in both halves → everyone stays on
    // the diagonal (same decile both periods)
    val ev = (1 to 40).flatMap { u =>
      Seq((u.toLong, day(1), u * 10.0), (u.toLong, day(60), u * 10.0))
    }.toDF("user_id", "ts", "value")
    val r = Reporting.decileMigration(ev, "user_id", "ts", "value",
      buckets = 4).collect()
    assert(r.forall(x => x.getLong(0) === x.getLong(1))) // diagonal
    val shares = r.groupBy(_.getLong(0))
      .map { case (_, rows) => rows.map(_.getDouble(3)).sum }
    assert(shares.forall(s => math.abs(s - 1.0) < 1e-6))
  }

  test("cochranArmitage: python-checked rising trend; flat → z 0") {
    val rows = (Seq.fill(5)((0, 1)) ++ Seq.fill(45)((0, 0)) ++
      Seq.fill(15)((1, 1)) ++ Seq.fill(35)((1, 0)) ++
      Seq.fill(30)((2, 1)) ++ Seq.fill(20)((2, 0))).toDF("x", "conv")
    val r = Stats.cochranArmitage(rows, "x", "conv").head()
    assert(r.getAs[Long]("k") === 3L && r.getAs[Long]("n") === 150L)
    assert(r.getAs[Long]("slope_sign") === 1L)
    assert(r.getAs[Double]("z_trend") === 5.303301)
    val flat = (Seq.fill(10)((0, 1)) ++ Seq.fill(40)((0, 0)) ++
      Seq.fill(10)((1, 1)) ++ Seq.fill(40)((1, 0))).toDF("x", "conv")
    assert(Stats.cochranArmitage(flat, "x", "conv").head()
      .getAs[Double]("z_trend") === 0.0)
  }

  test("gkGamma: near-perfect diagonal table, hand-counted C and D") {
    val rows = (Seq.fill(10)((0L, 0L)) ++ Seq.fill(10)((1L, 1L)) ++
      Seq.fill(10)((2L, 2L)) ++ Seq.fill(2)((0L, 1L)) ++
      Seq.fill(2)((1L, 0L))).toDF("r", "c")
    val g = Stats.gkGamma(rows, "r", "c").head()
    assert(g.getAs[Long]("n_concordant") === 340L)
    assert(g.getAs[Long]("n_discordant") === 4L)
    assert(g.getAs[Double]("gamma") === 0.976744)
  }

  test("krippendorffAlpha: worked binary example; perfect agreement → 1") {
    val ratings = Seq(
      ("A", 1), ("A", 1), ("B", 1), ("B", 0), ("C", 0), ("C", 0),
      ("D", 1), ("D", 1), ("D", 1), ("E", 0), ("E", 0),
      ("solo", 1) // single-rating item: excluded
    ).toDF("item", "rating")
    val r = Stats.krippendorffAlpha(ratings, "item", "rating").head()
    assert(r.getAs[Long]("n_items") === 5L)
    assert(r.getAs[Long]("n_ratings") === 11L)
    assert(r.getAs[Double]("alpha") === 0.666667)
    // all raters always agree → alpha = 1 exactly
    val perfect = Seq(("A", 1), ("A", 1), ("B", 0), ("B", 0))
      .toDF("item", "rating")
    assert(Stats.krippendorffAlpha(perfect, "item", "rating").head()
      .getAs[Double]("alpha") === 1.0)
  }

  test("crossSourceDupShare: within-source dup → share 0; cross → 1") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    def filler(i: Int) =
      s"u$i v$i w$i x$i y$i z$i q$i r$i s$i t$i"
    val within = (Seq((1L, s"$shared one", "web"),
      (2L, s"$shared two", "web")) ++
      (3 to 20).map(i => (i.toLong, filler(i), "web"))).toDF("doc_id", "text", "source")
    val rw = Dedup.crossSourceDupShare(within, "doc_id", "text", "source")
      .head()
    assert(rw.getAs[Long]("n_pairs") >= 1L)
    assert(rw.getAs[Double]("cross_share") === 0.0)
    val cross = (Seq((1L, s"$shared one", "web"),
      (2L, s"$shared two", "books")) ++
      (3 to 20).map(i => (i.toLong, filler(i), "web"))).toDF("doc_id", "text", "source")
    assert(Dedup.crossSourceDupShare(cross, "doc_id", "text", "source")
      .head().getAs[Double]("cross_share") === 1.0)
  }

  test("twoNnIntrinsicDim: a 2-D manifold in high-D reads as ~2") {
    // Poisson-ish scatter (java.util.Random is algorithm-specified, so
    // the seed makes this deterministic; lattice/low-discrepancy points
    // have near-equal NN gaps and bias TwoNN): 1-D curve vs 4-D cloud
    val rnd = new java.util.Random(42)
    val line = (0 until 300).map { i =>
      val t = 100.0 * rnd.nextDouble()
      (i.toLong, Array(t, 2 * t, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    }.toDF("id", "v")
    val r1 = Embeddings.twoNnIntrinsicDim(line, "id", "v").head()
    assert(r1.getAs[Long]("n_points") === 300L)
    val id1 = r1.getAs[Double]("id_mle")
    assert(id1 > 0.6 && id1 < 1.6)
    val rnd2 = new java.util.Random(7)
    val cloud = (0 until 300).map { i =>
      (i.toLong, Array(rnd2.nextDouble(), rnd2.nextDouble(),
        rnd2.nextDouble(), rnd2.nextDouble(), 0.0, 0.0, 0.0, 0.0))
    }.toDF("id", "v")
    val id4 = Embeddings.twoNnIntrinsicDim(cloud, "id", "v").head()
      .getAs[Double]("id_mle")
    assert(id4 > 2.0 * id1) // the 4-D cloud reads much higher
    // refuses unbounded input
    val big = spark.range(0, 50).select(col("id"),
      array(col("id").cast("double")).as("v"))
    val e = intercept[IllegalArgumentException] {
      Embeddings.twoNnIntrinsicDim(big, "id", "v", maxSample = 10).head()
    }
    assert(e.getMessage.contains("maxSample"))
  }
}
