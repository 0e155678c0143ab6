package graft

import graft.core.Tables
import graft.operators.Events
import org.apache.spark.sql.functions._

/** Batch sessionization, rolling windows, ordered funnels. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessionize: gap splits sessions, idx is 0-based per user") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:30:00")),
      (1L, ts("2024-01-01 02:00:00")), // 90 min idle → new session
      (2L, ts("2024-01-01 05:00:00"))
    ).toDF("user_id", "ts")
    val got = Events.sessionize(ev, "user_id", "ts", 3600)
      .select("user_id", "ts", "session_idx")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .map { case (u, t, s) => (u, t.toString.take(19), s) }.toSet
    assert(got === Set(
      (1L, "2024-01-01 00:00:00", 0L), (1L, "2024-01-01 00:30:00", 0L),
      (1L, "2024-01-01 02:00:00", 1L), (2L, "2024-01-01 05:00:00", 0L)))
  }

  test("rollingWindow: trailing count includes frame peers at equal ts") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:30:00"), 2.0),
      (1L, ts("2024-01-01 00:30:00"), 3.0), // equal-ts peer
      (1L, ts("2024-01-01 02:00:00"), 4.0)  // outside 1h of the others
    ).toDF("user_id", "ts", "value")
    val got = Events.rollingWindow(ev, "user_id", "ts", "value", 3600)
      .select("value", "rolling_n", "rolling_sum")
      .as[(Double, Long, Double)].collect().toSet
    assert(got === Set((1.0, 1L, 1.0), (2.0, 3L, 6.0), (3.0, 3L, 6.0), (4.0, 1L, 4.0)))
  }

  test("funnel: strict ordering and horizon both enforced") {
    val ev = Seq(
      // u1 completes in order within horizon
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2: purchase BEFORE click → only reaches click
      (2L, ts("2024-01-01 00:00:00"), "signup"),
      (2L, ts("2024-01-01 00:30:00"), "purchase"),
      (2L, ts("2024-01-01 01:00:00"), "click"),
      // u3: click outside the 1-day horizon
      (3L, ts("2024-01-01 00:00:00"), "signup"),
      (3L, ts("2024-01-03 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"), withinSec = Some(86400L))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq === Seq(3L, 2L, 1L))
    assert(got.map(_._2).toSeq === Seq("signup", "click", "purchase"))
  }

  test("funnel counts are monotonically non-increasing on real events") {
    val ns = Events.funnel(Tables.load(spark, sf, "events"), "user_id", "ts",
        "event_type", Seq("signup", "view", "click", "purchase"))
      .orderBy("step").select("n_users").as[Long].collect()
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
    assert(ns.head > 0)
  }

  test("sessionize/rolling plans: one hash exchange, no SinglePartition window") {
    val ev = Tables.load(spark, sf, "events")
    val p1 = Events.sessionize(ev, "user_id", "ts", 3600)
      .queryExecution.executedPlan.toString
    val p2 = Events.rollingWindow(ev, "user_id", "ts", "value", 3600)
      .queryExecution.executedPlan.toString
    Seq(p1, p2).foreach { p =>
      assert(p.contains("hashpartitioning(user_id"))
      assert(!p.contains("SinglePartition"))
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"))
    }
  }
}
