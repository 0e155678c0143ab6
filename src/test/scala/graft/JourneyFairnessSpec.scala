package graft

import graft.ml.Fairness
import graft.operators.Reporting
import org.apache.spark.sql.functions._

/** Journey n-gram mining (q245) and per-segment fairness report
  * (q246): hand-computed supports, gap arithmetic, degenerate-segment
  * null handling. */
class JourneyFairnessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-03-01 10:${m}%02d:00")

  test("journeyNgrams: overlapping trigram counts, support floor, " +
      "never crosses users") {
    // user 1: a b a b a  -> (a,b,a) x2, (b,a,b) x1
    // user 2: a b a      -> (a,b,a) x1
    val ev = (Seq("a", "b", "a", "b", "a").zipWithIndex.map {
        case (t, i) => (1L, i.toLong, t, ts(i)) } ++
      Seq("a", "b", "a").zipWithIndex.map {
        case (t, i) => (2L, 10L + i, t, ts(i)) })
      .toDF("user_id", "event_id", "event_type", "ts")
    val all = Reporting.journeyNgrams(ev, "user_id", "ts", "event_type",
        "event_id", n = 3, minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(all(("a", "b", "a")) == 3L) // 2 from user 1 + 1 from user 2
    assert(all(("b", "a", "b")) == 1L)
    assert(all.size == 2) // nothing spans the user boundary
    val floored = Reporting.journeyNgrams(ev, "user_id", "ts", "event_type",
      "event_id", n = 3, minSupport = 2L).collect()
    assert(floored.length == 1)
  }

  test("fairnessReport: hand-computed rates and gaps; empty-class " +
      "segment gets null TPR, not an error") {
    // seg A: 4 rows, preds 1,1,0,0 labels 1,0,1,0 -> ar .5, tpr .5, fpr .5
    // seg B: 2 rows, preds 1,1 labels 0,0 -> ar 1, tpr null (no pos), fpr 1
    val df = Seq(
      ("A", 1, 1), ("A", 0, 1), ("A", 1, 0), ("A", 0, 0),
      ("B", 0, 1), ("B", 0, 1))
      .toDF("seg", "y", "pred")
    val out = Fairness.fairnessReport(df, "seg", "y", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A"); val b = out("B")
    assert(a.getLong(1) == 4 && b.getLong(1) == 2)
    assert(a.getDouble(2) == 0.5 && b.getDouble(2) == 1.0) // acceptance
    assert(a.getDouble(3) == 0.5 && b.isNullAt(3))         // tpr
    assert(a.getDouble(4) == 0.5 && b.getDouble(4) == 1.0) // fpr
    // global: 6 rows, 4 accepts -> ar 2/3; parity gaps vs it
    assert(a.getDouble(5) == -0.166667 && b.getDouble(5) == 0.333333)
    // global fpr: fp=3 of neg=4 -> .75; gaps 0.5-0.75 / 1-0.75
    assert(a.getDouble(7) == -0.25 && b.getDouble(7) == 0.25)
  }
}
