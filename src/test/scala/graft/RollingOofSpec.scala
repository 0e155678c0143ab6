package graft

import graft.ml.Encoders
import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** Rolling correlation (q247) and out-of-fold target encoding (q248). */
class RollingOofSpec extends SparkSpec {
  import spark.implicits._

  test("rollingCorrelation: perfectly co-moving series hit +1, " +
      "anti-moving hit -1, constant windows go null") {
    // day d: n events with value v -> daily (x=n, y=v). Build x=y run
    // then an inverted run.
    def day(d: Int, n: Int, v: Double) =
      (1 to n).map(i => (java.sql.Timestamp.valueOf(f"2024-05-$d%02d 08:00:00"), v))
    val up = (1 to 5).flatMap(d => day(d, d, d.toDouble))         // y = x
    val ev = up.toDF("ts", "value")
    val out = Forecast.rollingCorrelation(ev, "ts", "value", windowDays = 3)
      .orderBy("day").collect()
    // from the 2nd day on, every trailing window is perfectly linear
    out.drop(1).foreach(r => assert(r.getDouble(4) == 1.0, r.toString))
    // single-day window: zero variance -> null corr
    assert(out.head.isNullAt(4))
    val down = (1 to 5).flatMap(d => day(d, d, (6 - d).toDouble))  // y = -x
    val neg = Forecast.rollingCorrelation(down.toDF("ts", "value"), "ts",
      "value", 3).orderBy("day").collect()
    neg.drop(1).foreach(r => assert(r.getDouble(4) == -1.0))
  }

  test("targetEncodeOof: own fold's targets NEVER reach a row's encoding") {
    // cat 'a': fold 0 targets {10, 10}, fold 1 targets {70}.
    // fold-0 rows encode from fold-1 stats only; poison fold 0 wildly
    // and fold-1 rows' encoding must not move.
    val df = Seq((1L, "a", 0L, 10.0), (2L, "a", 0L, 10.0),
      (3L, "a", 1L, 70.0), (4L, "b", 0L, 5.0), (5L, "b", 1L, 5.0))
      .toDF("id", "cat", "fold", "v")
    val enc = Encoders.targetEncodeOof(df, "cat", "v", "fold", "te",
        smoothing = 0.0)
      .select("id", "te").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fold-0 'a' rows: only fold-1 stats -> 70/1 = 70
    assert(enc(1L) == 70.0 && enc(2L) == 70.0)
    // fold-1 'a' row: only fold-0 stats -> 20/2 = 10
    assert(enc(3L) == 10.0)
    val poisoned = df.withColumn("v",
      when(col("fold") === 0 && col("cat") === "a", 1e9).otherwise(col("v")))
    val enc2 = Encoders.targetEncodeOof(poisoned, "cat", "v", "fold", "te",
        smoothing = 0.0)
      .select("id", "te").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(enc2(1L) == 70.0 && enc2(2L) == 70.0) // unchanged: no self-leak
    assert(enc2(3L) == 1e9)                      // sees the poisoned folds
  }

  test("targetEncodeOof smoothing pulls sparse categories toward the " +
      "leave-fold-out global mean") {
    val df = Seq((1L, "rare", 0L, 100.0), (2L, "rare", 1L, 100.0)) ++
      (3L to 42L).map(i => (i, "common", i % 2, 10.0))
    val enc = Encoders.targetEncodeOof(df.toDF("id", "cat", "fold", "v"),
        "cat", "v", "fold", "te", smoothing = 1000.0)
      .filter(col("cat") === "rare").select("te").head().getDouble(0)
    // huge smoothing -> essentially the global LOO mean (~14), not 100
    assert(enc > 10 && enc < 20, enc.toString)
  }
}
