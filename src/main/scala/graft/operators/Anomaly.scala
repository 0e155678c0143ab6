package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over an event stream — the
  * monitoring primitive behind "this metric just jumped": each point is
  * scored against its OWN entity's trailing window (excluding itself,
  * so a spike can't dilute the baseline it is judged against).
  *
  * Scale shape: one hash shuffle on the entity key, then a
  * partition-local RANGE frame over epoch-micros — no self-join, no
  * global sort, the same single-shuffle kernel as the rolling-window
  * features (operators/Events.scala rollingWindow).
  */
object Anomaly {

  /** Per-event trailing-baseline z-score:
    * (…, baseline_n, baseline_mean, z 6dp, is_anomaly). The frame is
    * `[ts − windowSec, ts)` — strictly before the current row's
    * timestamp (equal-ts peers are EXCLUDED with the row itself: a
    * burst of simultaneous anomalies must not vouch for each other).
    * Rows with fewer than `minN` baseline points are never flagged
    * (z is NULL there); `z` is rounded to 6dp BEFORE the threshold
    * compare so the flag is engine-stable at the boundary.
    */
  def rollingZScore(events: DataFrame, userCol: String, tsCol: String,
                    valueCol: String, windowSec: Long, minN: Int = 5,
                    threshold: Double = 3.0): DataFrame = {
    val ev = graft.core.Tables.ltzTs(events, tsCol)
    val w = Window.partitionBy(userCol).orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowSec * 1000000L, -1L)
    val n = count(col(valueCol)).over(w)
    val mu = avg(col(valueCol)).over(w)
    val sd = stddev_samp(col(valueCol)).over(w)
    ev.withColumn("baseline_n", n)
      .withColumn("baseline_mean", round(mu, 6))
      .withColumn("z",
        when(n >= minN && sd > 0,
          round((col(valueCol) - mu) / sd, 6)))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
  }
}
