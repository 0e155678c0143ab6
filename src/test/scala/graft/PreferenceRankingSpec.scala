package graft

import graft.ml.{Preference, RankingMetrics}
import org.apache.spark.sql.functions._

/** Bradley-Terry (q258), Cohen's kappa (q259) and retrieval metrics
  * (q260): hand-computed fixtures and closed-form limits. */
class PreferenceRankingSpec extends SparkSpec {
  import spark.implicits._

  test("bradleyTerry: two items converge to the win-ratio closed form") {
    // stationary point of the MM map for 2 items: p_a/p_b = wins_a/wins_b
    // and Σp = 1 → p_a = 3/4
    val m = Seq(("a", "b", 30, 10)).toDF("item_a", "item_b", "wa", "wb")
    val out = Preference.bradleyTerry(m, "item_a", "item_b", "wa", "wb",
        iters = 30)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("a").getDouble(3) - 0.75) < 1e-6)
    assert(math.abs(out("b").getDouble(3) - 0.25) < 1e-6)
    assert(out("a").getLong(1) == 40 && out("a").getDouble(2) == 30.0)
  }

  test("bradleyTerry: symmetric round-robin stays uniform every round") {
    // 3 items, every pair splits 5-5: the uniform vector is a fixed
    // point, so even 1 iteration returns exactly 1/3 (rounded)
    val m = Seq(("a", "b", 5, 5), ("b", "c", 5, 5), ("a", "c", 5, 5))
      .toDF("item_a", "item_b", "wa", "wb")
    val out = Preference.bradleyTerry(m, "item_a", "item_b", "wa", "wb",
      iters = 1).collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.getDouble(3) == 0.333333))
  }

  test("bradleyTerry: dominant item takes most of the mass") {
    val m = Seq(("a", "b", 9, 1), ("b", "c", 9, 1), ("a", "c", 9, 1))
      .toDF("item_a", "item_b", "wa", "wb")
    val out = Preference.bradleyTerry(m, "item_a", "item_b", "wa", "wb")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") > out("b") && out("b") > out("c"))
    assert(out("a") > 0.6)
  }

  test("cohenKappa: perfect agreement gives kappa 1") {
    val df = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("z", "z"))
      .toDF("a", "b")
    val r = Preference.cohenKappa(df, "a", "b").head()
    assert(r.getDouble(3) == 1.0) // po
    assert(r.getDouble(5) == 1.0) // kappa
  }

  test("cohenKappa: hand-computed 2x2 table") {
    // confusion: (x,x)=20 (x,y)=5 (y,x)=10 (y,y)=15, N=50
    // po = 35/50 = 0.7; pa_x = 0.5, pb_x = 0.6 → pe = 0.5*0.6 + 0.5*0.4
    // = 0.5; kappa = 0.2/0.5 = 0.4
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(5)(("x", "y")) ++
      Seq.fill(10)(("y", "x")) ++ Seq.fill(15)(("y", "y"))
    val out = rows.toDF("a", "b")
    val r = Preference.cohenKappa(out, "a", "b").head()
    assert(r.getDouble(3) == 0.7 && r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == 0.4)
    assert(Preference.cohenKappa(out, "a", "b").count() == 4)
  }

  test("rankingMetrics: hand-computed single query") {
    // 5 docs scored 50..10, relevant at ranks 1 and 3:
    // p@2 = 1/2, recall@2 = 1/2, rr = 1, ap = (1/1 + 2/3)/2 = 5/6,
    // dcg@2 = 1/log2(2) = 1, idcg@2 = 1 + 1/log2(3) → ndcg ≈ 0.613147
    val runs = Seq((1, 101, 50.0, 1), (1, 102, 40.0, 0), (1, 103, 30.0, 1),
      (1, 104, 20.0, 0), (1, 105, 10.0, 0))
      .toDF("query", "doc", "score", "rel")
    val r = RankingMetrics.evaluate(runs, "query", "doc", "score", "rel",
      k = 2).head()
    assert(r.getLong(1) == 5 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5)
    assert(r.getDouble(5) == 1.0)
    assert(math.abs(r.getDouble(6) - 5.0 / 6) < 1e-6)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getDouble(7) - 1.0 / idcg) < 1e-6)
  }

  test("rankingMetrics: no relevant docs -> null recall/ap/ndcg, rr 0") {
    val runs = Seq((7, 1, 2.0, 0), (7, 2, 1.0, 0))
      .toDF("query", "doc", "score", "rel")
    val r = RankingMetrics.evaluate(runs, "query", "doc", "score", "rel")
      .head()
    assert(r.getDouble(5) == 0.0)
    assert(r.isNullAt(4) && r.isNullAt(6) && r.isNullAt(7))
  }

  test("rankingMetrics: tie on score breaks by doc id") {
    // both docs score 1.0; doc 1 (relevant) sorts first → rr = 1
    val runs = Seq((1, 2, 1.0, 0), (1, 1, 1.0, 1))
      .toDF("query", "doc", "score", "rel")
    val r = RankingMetrics.evaluate(runs, "query", "doc", "score", "rel")
      .head()
    assert(r.getDouble(5) == 1.0)
  }
}
