package graft

import graft.eda.SkewReport
import graft.operators.IntervalJoin
import graft.text.BloomBlocklist
import org.apache.spark.sql.functions._

/** Wave-9 kernels: interval-overlap join, skew diagnostics, Bloom-pruned
  * blocklist anti-join. */
class IntervalSkewBloomSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("overlapJoin equals the naive inequality join, no duplicates") {
    val rnd = new scala.util.Random(42)
    def mk(n: Int) = (1 to n).map { i =>
      val start = rnd.nextInt(100000)
      (i.toLong, (rnd.nextInt(3) + 1).toLong,
        new java.sql.Timestamp(1700000000000L + start * 1000L),
        new java.sql.Timestamp(1700000000000L + (start + rnd.nextInt(5000)) * 1000L))
    }
    val l = mk(300).toDF("id", "k", "s", "e")
    val r = mk(300).toDF("id", "k", "s", "e")
    val fast = IntervalJoin.overlapJoin(l, r, "k", "s", "e", widthSec = 1000)
      .select(col("l_id"), col("r_id"))
    val naive = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("l_id"), col("b.id").as("r_id"))
    assert(fast.count() === naive.count()) // anchor dedup: no double-count
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("overlapJoin plan: equi-join on grid buckets, no cartesian") {
    val l = Seq((1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")))
      .toDF("id", "k", "s", "e")
    val plan = IntervalJoin.overlapJoin(l, l, "k", "s", "e", 600)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("__bucket"))
  }

  test("keySkew: hand-computed gini, shares, and uniform baseline") {
    val df = (Seq.fill(10)(1) ++ Seq.fill(20)(2) ++ Seq.fill(70)(3)).toDF("k")
    val r = SkewReport.keySkew(df, "k").head()
    assert(r.getLong(0) === 100L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.7)  // max share
    assert(r.getDouble(3) === 1.0)  // top5 covers all 3 keys
    // sorted counts [10,20,70]: gsum = (2-4)*10 + (4-4)*20 + (6-4)*70 = 120
    assert(r.getDouble(4) === 0.4)
    val uniform = (1 to 100).flatMap(k => Seq.fill(5)(k)).toDF("k")
    assert(SkewReport.keySkew(uniform, "k").head().getDouble(4) === 0.0)
  }

  test("keySkew gini rides the adaptive rank kernel: forced-bucketed " +
      "route matches the window route cell-for-cell (VERDICT r7 item 4)") {
    val df = (Seq.fill(10)(1) ++ Seq.fill(20)(2) ++ Seq.fill(70)(3) ++
      (10 to 40).flatMap(k => Seq.fill(k % 7 + 1)(k))).toDF("k")
    graft.core.Routing.drain()
    val small = SkewReport.keySkew(df, "k").head()
    assert(graft.core.Routing.drain().contains("rank-kernel=window"))
    val big = SkewReport.keySkew(df, "k", rankSmallMaxRows = 0).head()
    assert(graft.core.Routing.drain().contains("rank-kernel=bucketed"))
    assert(small === big)
  }

  test("joinCardinality: exact fan-out prediction without the join") {
    val l = Seq(1, 1, 1, 2, 3).toDF("k")
    val r = Seq(1, 1, 2, 9).toDF("k")
    val c = SkewReport.joinCardinality(l, r, "k").head()
    assert(c.getLong(0) === 5L && c.getLong(1) === 4L)
    assert(c.getLong(2) === 2L)          // keys 1 and 2 match
    assert(c.getLong(3) === 3L * 2 + 1)  // true join size
    assert(c.getLong(4) === 6L)          // hottest key pair product
    // verify against the actual join
    assert(l.join(r, "k").count() === c.getLong(3))
  }

  test("bloom anti-join is EXACT even with a tiny, high-fpp filter") {
    val corpus = (1 to 2000).map(i => (i.toLong, s"key$i")).toDF("id", "fp")
    val block = (1 to 2000 by 3).map(i => s"key$i").toDF("bfp")
    // deliberately undersized bloom → many false positives; the confirm
    // join must remove every one of them
    val got = BloomBlocklist.antiJoinPruned(corpus, "fp", block, "bfp",
      expectedItems = 10L, fpp = 0.5).select("id")
    val want = corpus.join(block.withColumnRenamed("bfp", "fp"),
      Seq("fp"), "left_anti").select("id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() === (1 to 2000).count(_ % 3 != 1).toLong)
  }
}
