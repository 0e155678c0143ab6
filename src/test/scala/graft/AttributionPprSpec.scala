package graft

import graft.operators.Reporting
import graft.proximity.Graph
import org.apache.spark.sql.functions._

/** Time-decay multi-touch attribution (q242) and personalized PageRank
  * (q243): hand-computed credits, window exclusion, and PPR's
  * uniform-seed equivalence with standard PageRank. */
class AttributionPprSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-02-${day}%02d 12:00:00")

  test("time-decay credits: half-life halves, per-conversion unit mass") {
    // user 1: click 1 day before (w=1), signup 8 days before (w=0.5)
    //   -> click 2/3, signup 1/3
    // user 2: converts with no in-window touch -> (none) gets 1.0
    // user 3: touch 40 days before conversion -> outside 30d lookback
    val ev = Seq(
      (1L, 101L, "click", ts(14)), (1L, 102L, "signup", ts(7)),
      (1L, 103L, "purchase", ts(15)),
      (2L, 201L, "purchase", ts(10)),
      (3L, 301L, "click", java.sql.Timestamp.valueOf("2024-01-01 12:00:00")),
      (3L, 302L, "purchase", ts(20)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = Reporting.timeDecayAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("click", "signup"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(out("click") == (0.666667, 1L), out.toString)
    assert(out("signup") == (0.333333, 1L))
    assert(out("(none)") == (2.0, 2L)) // users 2 and 3 both uncredited
    // conservation: total credits == number of conversions
    assert(math.abs(out.values.map(_._1).sum - 3.0) < 1e-5)
  }

  test("personalized pagerank: mass concentrates at seeds; uniform " +
      "seeds recover standard pagerank") {
    // chain 1->2->3->4 plus 4->1 back-edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val ppr = Graph.personalizedPageRank(edges, seeds, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
    // walk restarts at 1: rank decays along the chain
    assert(ppr(1L) > ppr(2L) && ppr(2L) > ppr(3L) && ppr(3L) > ppr(4L), ppr.toString)
    // seeds == all nodes -> the restart vector is uniform == pageRank
    val all = Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("id")
    val uni = Graph.personalizedPageRank(edges, all, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val std = Graph.pageRank(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    uni.foreach { case (k, v) => assert(math.abs(v - std(k)) < 1e-12, s"$k") }
  }

  test("ppr dangling mass returns to the seeds only") {
    // 1 -> 2, 2 dangling; seed = {1}
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val ppr = Graph.personalizedPageRank(edges, seeds, iters = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 1.0) < 1e-9)
    assert(ppr(1L) > ppr(2L)) // restarts + dangling return both favor 1
  }
}
