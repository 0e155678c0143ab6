package graft

import graft.ml.Encoders
import graft.operators.{Anomaly, Cohorts}
import graft.proximity.Graph
import org.apache.spark.sql.functions._

/** Wave-8 kernels: rolling z-score anomalies, cohort retention, BFS
  * depths, supervised encoders. */
class AnomCohortEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("rollingZScore: spike flagged against trailing baseline only") {
    val base = (0 until 10).map(i => (1L, ts(f"2024-01-01 00:${i}%02d:00"), 10.0))
    val spike = Seq((1L, ts("2024-01-01 00:10:30"), 10.0 + 100.0))
    val df = (base ++ spike).toDF("user_id", "t", "value")
      .withColumn("value", col("value") + (rand(7) * 0.01)) // break sd=0
    val out = Anomaly.rollingZScore(df, "user_id", "t", "value",
      windowSec = 3600, minN = 5, threshold = 3.0)
    val flagged = out.filter(col("is_anomaly")).select("t").as[java.sql.Timestamp].collect()
    assert(flagged.toSeq === Seq(ts("2024-01-01 00:10:30")))
    // early rows (baseline < minN) are never flagged and have NULL z
    assert(out.filter(col("baseline_n") < 5 && col("z").isNotNull).count() === 0)
  }

  test("rollingZScore: equal-ts peers are excluded from each other's baseline") {
    // two simultaneous spikes: each must still be flagged — neither
    // inflates the baseline the other is judged against
    val base = (0 until 8).map(i => (1L, ts(f"2024-01-01 00:0${i}:00"), 5.0 + i * 0.001))
    val burst = Seq((1L, ts("2024-01-01 00:09:00"), 500.0),
      (1L, ts("2024-01-01 00:09:00"), 500.0))
    val out = Anomaly.rollingZScore((base ++ burst).toDF("user_id", "t", "value"),
      "user_id", "t", "value", 3600, 5, 3.0)
    assert(out.filter(col("is_anomaly")).count() === 2)
  }

  test("cohort retention: offsets count distinct returning users") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort wk of Jan 1 (Monday)
      (1L, ts("2024-01-09 10:00:00")), // back in week 1
      (2L, ts("2024-01-02 10:00:00")), // same cohort
      (2L, ts("2024-01-02 11:00:00")), // same week — not double-counted
      (3L, ts("2024-01-10 10:00:00"))  // cohort wk of Jan 8
    ).toDF("user_id", "t")
    val r = Cohorts.retention(df, "user_id", "t")
      .collect().map(x => (x.getTimestamp(0).toString.take(10), x.getInt(1)) -> x.getLong(2)).toMap
    assert(r(("2024-01-01", 0)) === 2L) // users 1,2 in week 0
    assert(r(("2024-01-01", 1)) === 1L) // user 1 returned
    assert(r(("2024-01-08", 0)) === 1L) // user 3's cohort
    assert(r.size === 3)
  }

  test("bfsDepths: hop distances, unreachable absent, early stop") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val sources = Seq(1L).toDF("id")
    val d = Graph.bfsDepths(edges, sources, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)) // 10,11 unreachable
  }

  test("bfsDepths: maxHops truncates the frontier") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val d = Graph.bfsDepths(edges, Seq(1L).toDF("id"), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 2L -> 1))
  }

  test("woeTable: hand-computed weight of evidence and IV terms") {
    // cat a: 3 pos 1 neg; cat b: 1 pos 3 neg; totals: 4 pos 4 neg
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 0)) ++
      Seq(("b", 1)) ++ Seq.fill(3)(("b", 0))).toDF("c", "y")
    val w = Encoders.woeTable(df, "c", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    val expA = math.log((3.5 / 4.0) / (1.5 / 4.0))
    assert(math.abs(w("a") - BigDecimal(expA).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(w("a") === -w("b")) // symmetric fixture
  }

  test("targetEncode: shrinks rare levels toward the global mean") {
    val df = (Seq.fill(100)(("common", 10.0)) ++ Seq(("rare", 1000.0)))
      .toDF("c", "y")
    val enc = Encoders.targetEncode(df, "c", "y", "enc", smoothing = 20.0)
      .select("c", "enc").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gm = (100 * 10.0 + 1000.0) / 101
    // rare level: (1000 + 20*gm)/(1+20) — far from its raw mean of 1000
    assert(math.abs(enc("rare") - (1000.0 + 20 * gm) / 21.0) < 1e-4)
    assert(enc("rare") < 120.0)
    assert(math.abs(enc("common") - (1000.0 + 20 * gm) / 120.0) > 0) // sanity
  }

  test("binnedWoe: monotone feature-label link shows monotone WOE") {
    // y = 1 iff x in the top half: high bins must carry higher WOE
    val df = (1 to 1000).map(i => (i.toDouble, if (i > 500) 1 else 0))
      .toDF("x", "y")
    val w = Encoders.binnedWoe(df, "x", "y", bins = 4)
      .collect().map(r => r.getString(0).toInt -> r.getDouble(4)).toMap
    assert(w.size === 4)
    assert(w(0) < w(1) || w(1) < w(2)) // lower bins: negative evidence
    assert(w(3) > w(0))
    assert(w(0) < 0 && w(3) > 0)
  }
}
