package graft

import graft.dedup.LeakageSplit
import graft.ml.{Experiments, Stats}
import graft.operators.{Cooccur, Reporting}
import graft.text.Packing
import org.apache.spark.sql.functions._

/** Wave-18 kernels: Shapley attribution, raking/IPF, leakage-safe
  * split, snake shard planner, Yuen trimmed t, Apriori triples. */
class WaveEighteenSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("shapleyAttribution: hand-solved 2-channel game") {
    // journeys: {A}→conv ×3, {B}→conv ×1, {A,B}→conv ×2, {A}→no ×1
    // v(A)=3, v(B)=1, v(AB)=6 → Shapley_A = ½·3 + ½·5 = 4, _B = 2
    var uid = 0
    def journey(chs: Seq[String], conv: Boolean) = {
      uid += 1
      chs.zipWithIndex.map { case (c, i) =>
        (uid.toLong, ts(s"2024-01-01 0$i:00:00"), c, (uid * 10 + i).toLong)
      } ++ (if (conv) Seq((uid.toLong, ts("2024-01-01 09:00:00"),
        "purchase", (uid * 10 + 9).toLong)) else Nil)
    }
    val ev = (Seq.fill(3)(journey(Seq("A"), conv = true)).flatten ++
      journey(Seq("B"), conv = true) ++
      Seq.fill(2)(journey(Seq("A", "B"), conv = true)).flatten ++
      journey(Seq("A"), conv = false))
      .toDF("user_id", "ts", "event_type", "event_id")
    val r = Reporting.shapleyAttribution(ev, "user_id", "ts",
      "event_type", "purchase").collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r("A") === ((4.0, 0.666667)))
    assert(r("B") === ((2.0, 0.333333)))
  }

  test("rakeWeights: weighted sample margins hit the population margins") {
    // population 2x2: counts [[40,10],[10,40]]; sample undercounts r=1
    val pop = Seq.fill(40)((0, 0)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(10)((1, 0)) ++ Seq.fill(40)((1, 1))
    val smp = Seq.fill(20)((0, 0)) ++ Seq.fill(5)((0, 1)) ++
      Seq.fill(2)((1, 0)) ++ Seq.fill(8)((1, 1))
    val w = Experiments.rakeWeights(smp.toDF("r", "c"), pop.toDF("r", "c"),
      "r", "c", iters = 3)
    // row margins after the final row scale... the final scale is the
    // COLUMN one, so check columns exactly and rows approximately
    val colM = w.groupBy("c").agg(sum("weighted_n").as("m"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(colM(0) - 50.0) < 1e-6)
    assert(math.abs(colM(1) - 50.0) < 1e-6)
    val rowM = w.groupBy("r").agg(sum("weighted_n").as("m"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(rowM(0) - 50.0) < 1.0) // geometric convergence
    // representative sample → all weights = population/sample ratio
    val even = Experiments.rakeWeights(pop.toDF("r", "c"),
      pop.toDF("r", "c"), "r", "c", iters = 3)
    assert(even.select("weight").distinct().collect()
      .map(_.getDouble(0)).toSeq === Seq(1.0))
  }

  test("leakageSafeSplit: linked docs share a component; audit is zero") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"$shared one two three four five six seven eight"),
      (2L, s"nine ten eleven twelve $shared thirteen"),
      (3L, "totally unrelated words with nothing in common here at all " +
        "more filler so shingles exist"),
      (4L, "another independent document full of its own vocabulary " +
        "nothing shared with others")).toDF("doc_id", "text")
    val r = LeakageSplit.leakageSafeSplit(docs, "doc_id", "text",
      shingleSize = 8, maxDf = 5, iters = 4)
    val rows = r.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 4L)
    // docs 1+2 collapse to one component → 3 components across splits
    assert(rows.map(_.getAs[Long]("n_components")).sum === 3L)
    assert(rows.forall(_.getAs[Long]("n_cross_pairs") === 0L))
    // a 3-chain (1-2, 2-3) also collapses within 4 rounds
    val chain = Seq(
      (1L, s"$shared aaa bbb ccc ddd eee fff ggg hhh"),
      (2L, s"$shared india juliet kilo lima mike november oscar papa"),
      (3L, "india juliet kilo lima mike november oscar papa zzz yyy xxx " +
        "www vvv uuu")).toDF("doc_id", "text")
    val rc = LeakageSplit.leakageSafeSplit(chain, "doc_id", "text",
      shingleSize = 8, maxDf = 5, iters = 4).collect()
    assert(rc.map(_.getAs[Long]("n_components")).sum === 1L)
    assert(rc.length === 1) // one component → one split
  }

  test("snakeShards: serpentine deal balances; totals hand-checked") {
    val items = Seq(10L, 9, 8, 7, 6, 5, 4, 3).zipWithIndex
      .map { case (sz, i) => (i.toLong, sz) }
    val r = Packing.snakeShards(items.toDF("id", "sz"), "id", "sz", 3)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    // ranks desc: 10 9 8 | 7 6 5 (reversed) | 4 3
    assert(r === Map(0L -> 19L, 1L -> 18L, 2L -> 15L))
  }

  test("yuenT: outlier-robust t matches the python reference") {
    val df = ((Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 100).map(v => ("a", v.toDouble))) ++
      (3 to 12).map(v => ("b", v.toDouble))).toDF("g", "v")
    val r = Stats.yuenT(df, "g", "v", "a", "b", trim = 0.2).head()
    assert(r.getAs[Long]("n_a") === 11L && r.getAs[Long]("h_a") === 7L)
    assert(r.getAs[Double]("mt_a") === 6.0)
    assert(r.getAs[Double]("mt_b") === 7.5)
    assert(r.getAs[Double]("t_yuen") === -0.854823)
    assert(r.getAs[Double]("df") === 10.887683)
  }

  test("itemTriples: support prune + lift on a hand basket set") {
    // baskets: {1,2,3} ×3, {1,2,4} — triple (1,2,3) support 3,
    // lift = 3·4²/(4·4·3) = 1.0; (1,2,4) support 1 pruned
    val rows = (1 to 3).flatMap(b => Seq((b.toLong, 1L), (b.toLong, 2L),
      (b.toLong, 3L))) ++ Seq((4L, 1L), (4L, 2L), (4L, 4L))
    val r = Cooccur.itemTriples(rows.toDF("b", "i"), "b", "i",
      minSupport = 2).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2)) === ((1L, 2L, 3L)))
    assert(r(0).getAs[Long]("n_triple") === 3L)
    assert(r(0).getAs[Double]("lift") === 1.0)
  }
}
