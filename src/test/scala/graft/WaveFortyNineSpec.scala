package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 49: log-rank survival test, Krippendorff's alpha,
  * mixture reweighting, cross-shard near-dup audit, exchange bucket
  * skew (q481–q485). */
class WaveFortyNineSpec extends SparkSpec {
  import spark.implicits._

  test("logRank: hand-computed two-arm example") {
    // A: events at t=1 and t=2; B: censored at t=3 twice
    // t=1: n1=2 n0=2 d1=1 dt=1 -> E=0.5,  V=1/4
    // t=2: n1=1 n0=2 d1=1 dt=1 -> E=1/3,  V=2/9
    val life = Seq(
      (1L, 1, "A"), (2L, 1, "A"), (3L, 0, "B"), (3L, 0, "B")
    ).toDF("dur", "event", "arm")
    val r = graft.ml.SurvivalTests
      .logRank(life, "dur", "event", "arm", "A", "B").head()
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Long]("observed_a") == 2)
    assert(r.getAs[Double]("expected_a") == 0.833333)
    assert(r.getAs[Double]("o_minus_e") == 1.166667)
    assert(r.getAs[Double]("var_sum") == 0.472222)
    assert(math.abs(r.getAs[Double]("z_stat") - 1.69775) < 1e-4)
    // identical arms → z = 0 (symmetric design)
    val sym = Seq((1L, 1, "A"), (2L, 0, "A"), (1L, 0, "B"), (2L, 1, "B"))
      .toDF("dur", "event", "arm")
    val rs = graft.ml.SurvivalTests
      .logRank(sym, "dur", "event", "arm", "A", "B").head()
    assert(rs.getAs[Double]("o_minus_e") == 0.0)
  }

  test("krippendorffAlpha: textbook nominal example") {
    // u1:[a,a] u2:[a,b] u3:[b,b,b] u4:[c] (unpairable, drops)
    // Do = 2/7, De = (3·4 + 4·3)/(7·6) = 4/7, alpha = 0.5
    val df = Seq(
      (1, "a"), (1, "a"), (2, "a"), (2, "b"),
      (3, "b"), (3, "b"), (3, "b"), (4, "c")
    ).toDF("u", "c")
    val r = graft.eda.Agreement.krippendorffAlpha(df, "u", "c").head()
    assert(r.getAs[Long]("n_units") == 4)
    assert(r.getAs[Long]("n_pairable") == 3)
    assert(r.getAs[Long]("n_ratings") == 7)
    assert(r.getAs[Long]("n_values") == 2) // c only in unpairable unit
    assert(r.getAs[Double]("d_o") == 0.285714)
    assert(r.getAs[Double]("d_e") == 0.571429)
    assert(r.getAs[Double]("alpha") == 0.5)
    // perfect agreement → alpha 1
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
      .toDF("u", "c")
    assert(graft.eda.Agreement.krippendorffAlpha(perfect, "u", "c")
      .head().getAs[Double]("alpha") == 1.0)
  }

  test("mixtureReweight: weights morph composition toward the target") {
    val docs = Seq(
      ("s0", "a b c"), ("s0", "d e f"), ("s1", "g h")
    ).toDF("source", "text")
    val r = graft.text.CorpusStats.mixtureReweight(docs, "source",
      "text", Map("s0" -> 0.25, "s1" -> 0.75), cap = 3.0).collect()
    val s0 = r.find(_.getAs[String]("source") == "s0").get
    val s1 = r.find(_.getAs[String]("source") == "s1").get
    assert(s0.getAs[Long]("n_tokens") == 6)
    assert(s0.getAs[Double]("current_share") == 0.75)
    assert(s0.getAs[Double]("weight") == 0.333333)
    assert(s0.getAs[Long]("expected_tokens") == 2)
    assert(s1.getAs[Double]("weight") == 3.0) // 0.75/0.25 hits the cap
    assert(s1.getAs[Long]("expected_tokens") == 6)
  }

  test("crossShardNearDups: classifies pair mass by shard boundary") {
    val docs = Seq(
      (0L, "x y z"), (1L, "x y z"), (4L, "x y z"),
      (2L, "totally different words here")
    ).toDF("doc_id", "text")
    val r = graft.dedup.ShardExchange
      .crossShardNearDups(docs, "doc_id", "text", nShards = 4,
        threshold = 0.9).collect()
    // pairs: (0,1) cross s0-s1, (0,4) within s0, (1,4) cross s0-s1
    assert(r.length == 2)
    val within = r.find(_.getAs[Boolean]("within")).get
    assert(within.getAs[Int]("shard_x") == 0 &&
      within.getAs[Int]("shard_y") == 0 &&
      within.getAs[Long]("n_pairs") == 1)
    val cross = r.find(!_.getAs[Boolean]("within")).get
    assert(cross.getAs[Int]("shard_x") == 0 &&
      cross.getAs[Int]("shard_y") == 1 &&
      cross.getAs[Long]("n_pairs") == 2)
  }

  test("bucketSkew: uniform manifest reports balanced buckets") {
    val docs = (0L until 64L).map(i => (i, s"unique document $i"))
      .toDF("doc_id", "text")
    val manifests = (0 until 2).map { k =>
      graft.dedup.ShardExchange.localManifest(
        docs.filter(pmod(col("doc_id"), lit(2L)) === k),
        "doc_id", "text", s"s$k", k) }
    val g = graft.dedup.ShardExchange.globalAssign(manifests)
    val r = graft.dedup.ShardExchange.bucketSkew(g).head()
    assert(r.getAs[Long]("n_rows") == 64)
    assert(r.getAs[Long]("min_rows") >= 1)
    assert(r.getAs[Double]("skew") >= 1.0)
    assert(r.getAs[Long]("p50_rows") >= r.getAs[Long]("min_rows"))
    assert(r.getAs[Long]("p50_rows") <= r.getAs[Long]("max_rows"))
  }
}
