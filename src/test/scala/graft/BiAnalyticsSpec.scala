package graft

import graft.operators.Reporting
import org.apache.spark.sql.functions._

/** Wave-16 BI kernels: ABC/Pareto, last-touch attribution, RFM. */
class BiAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("abcAnalysis: dominant entity is A, tail is C, shares sum to 1") {
    val df = (Seq.fill(75)(("big", 10.0)) ++ Seq.fill(3)(("mid", 50.0)) ++
      Seq(("tiny", 60.0))).toDF("e", "v")
    val out = Reporting.abcAnalysis(df, "e", "v").collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getString(4)))).toMap
    // totals: big 750, mid 150, tiny 60 → grand 960
    assert(out("big")._2 === "A")   // cum 0.781 ≤ 0.8
    assert(out("mid")._2 === "B")   // cum 0.9375 ≤ 0.95
    assert(out("tiny")._2 === "C")
    val shares = Reporting.abcAnalysis(df, "e", "v")
      .agg(sum("share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-4)
  }

  test("lastTouchAttribution: credits the latest prior touch, not itself") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 00:10:00"), "view", 0.0),
      (1L, ts("2024-01-01 00:20:00"), "purchase", 100.0), // → view
      (2L, ts("2024-01-01 00:00:00"), "purchase", 50.0),  // no touch → (none)
      (3L, ts("2024-01-01 00:00:00"), "click", 0.0),
      (3L, ts("2024-01-01 00:05:00"), "purchase", 25.0),  // → click
      (3L, ts("2024-01-01 00:06:00"), "purchase", 25.0)   // still → click
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Reporting.lastTouchAttribution(df, "user_id", "ts",
        "event_type", "purchase", Seq("click", "view"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("view") === ((1L, 100.0)))
    assert(out("(none)") === ((1L, 50.0)))
    assert(out("click") === ((2L, 50.0)))
  }

  test("rfmSegments: best customer scores 444, dormant one scores low") {
    val asOf = ts("2024-02-01 00:00:00")
    val rows =
      // whale: recent, frequent, rich
      (0 until 20).map(i => (1L, ts(f"2024-01-${25 + i % 5}%02d 12:00:00"), 500.0)) ++
      // dormant: one old cheap event
      Seq((2L, ts("2024-01-01 00:00:00"), 1.0)) ++
      // mid users to populate the quantile grid
      (3L to 10L).flatMap(u => (0 until 5).map(i =>
        (u, ts(f"2024-01-${10 + i}%02d 00:00:00"), 50.0)))
    val out = Reporting.rfmSegments(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", asOf, bins = 4)
      .collect().map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out(1L) === "444")
    assert(out(2L).forall(c => c == '1')) // oldest, rarest, cheapest
  }

  test("abcAnalysis: classes are monotone along the cumulative ranking") {
    val df = (1 to 50).map(i => (s"e$i", i.toDouble)).toDF("e", "v")
    val cls = Reporting.abcAnalysis(df, "e", "v")
      .orderBy(desc("total"), asc("entity"))
      .select("abc_class").as[String].collect()
    val rank = Map("A" -> 0, "B" -> 1, "C" -> 2)
    assert(cls.map(rank).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }
}
