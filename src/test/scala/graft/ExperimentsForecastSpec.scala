package graft

import graft.ml.Experiments
import graft.operators.Forecast
import graft.text.Packing
import org.apache.spark.sql.functions._

/** CUPED (q251), diff-in-diff (q252), Holt linear smoothing (q257) and
  * length-bucket packing summary (q256): hand-computed estimates,
  * degenerate-input behavior. */
class ExperimentsForecastSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 12): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("cuped: perfectly predictive covariate drives variance to ~zero") {
    // per user one pre event (value i) and one post event (value 2i):
    // pooled theta = 2 exactly, so var(Y - 2X) = 0 in every variant
    val ev = (1 to 8).flatMap { i =>
      Seq((i.toLong, ts(5), i.toDouble), (i.toLong, ts(25), 2.0 * i))
    }.toDF("user_id", "ts", "value")
    val out = Experiments.cuped(ev, "user_id", "ts", "value",
        variantOf = u => u % 2, splitTs = "2024-01-15 00:00:00")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    val v0 = out(0L); val v1 = out(1L)
    assert(v0.getLong(1) == 4 && v1.getLong(1) == 4)
    // variant 0 users {2,4,6,8}: mean_y = 10; variant 1 {1,3,5,7}: 8
    assert(v0.getDouble(2) == 10.0 && v1.getDouble(2) == 8.0)
    assert(math.abs(v0.getDouble(5)) < 1e-9)  // var_y_cuped
    assert(v0.getDouble(6) == 2.0)            // theta
    assert(v0.getDouble(7) == 1.0)            // var_reduction
    // adjusted means shift toward each other: meanY - theta*(meanXv - meanX)
    // variant0 meanX=5, global meanX=4.5 -> 10 - 2*0.5 = 9
    assert(v0.getDouble(3) == 9.0 && v1.getDouble(3) == 9.0)
  }

  test("cuped: empty pre-period degrades to theta = 0, raw means") {
    val ev = (1 to 6).map(i => (i.toLong, ts(20), i.toDouble))
      .toDF("user_id", "ts", "value")
    val out = Experiments.cuped(ev, "user_id", "ts", "value",
        variantOf = u => u % 2, splitTs = "2024-01-15 00:00:00")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getDouble(6) == 0.0) // theta
    assert(out(0L).getDouble(2) == out(0L).getDouble(3)) // mean == cuped mean
  }

  test("diffInDiff: planted lift recovered with the classic SE") {
    // ctrl (even users) pre {1,3} post {2,4}; treat pre {1,3} post {7,9}
    // did = (8-2) - (3-2) = 5; each cell var 2, n 2 -> se = sqrt(4) = 2
    val ev = Seq(
      (2L, ts(5), 1.0), (4L, ts(6), 3.0), (2L, ts(25), 2.0), (4L, ts(26), 4.0),
      (1L, ts(5), 1.0), (3L, ts(6), 3.0), (1L, ts(25), 7.0), (3L, ts(26), 9.0))
      .toDF("user_id", "ts", "value")
    val r = Experiments.diffInDiff(ev, "ts", "value",
      treatOf = col("user_id") % 2 === 1,
      splitTs = "2024-01-15 00:00:00").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 8.0)
    assert(r.getDouble(4) == 5.0)   // did
    assert(r.getDouble(5) == 2.0)   // se
    assert(r.getDouble(6) == 2.5)   // t
  }

  test("holtLinear: constant daily total forecasts itself, zero residual") {
    val ev = (1 to 10).flatMap(d => Seq((d.toLong, ts(d), 4.0), (d.toLong, ts(d, 18), 4.0)))
      .toDF("event_id", "ts", "value")
    val rows = Forecast.holtLinear(ev, "ts", "value")
      .orderBy("day").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(1) == 8.0))          // daily total
    assert(rows.take(2).forall(_.isNullAt(4)))          // warmup: no forecast
    rows.drop(2).foreach { r =>
      assert(r.getDouble(4) == 8.0)                     // forecast
      assert(r.getDouble(5) == 0.0)                     // resid
    }
    assert(rows.forall(_.getDouble(2) == 8.0))          // level tracks
    assert(rows.forall(_.getDouble(3) == 0.0))          // trend zero
  }

  test("lengthBucketSummary: power-of-two buckets, batch and pad math") {
    // token counts: 10 -> bucket 16, 20 -> 32, 100 -> 128
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words(10)), (2L, words(20)), (3L, words(100)))
      .toDF("doc_id", "text")
    val out = Packing.lengthBucketSummary(docs, "doc_id", "text", batchSize = 8)
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(16, 32, 128))
    assert(out(16).getLong(1) == 1 && out(16).getLong(2) == 1) // docs, batches
    assert(out(16).getLong(3) == 10)                           // tokens
    assert(out(16).getDouble(4) == 0.375)                      // 1 - 10/16
    assert(out(128).getDouble(4) == round3(1.0 - 100.0 / 128))
  }

  private def round3(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
