package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-weighted (exponentially decayed) aggregates — the feature a
  * behavioral model wants instead of a raw lifetime sum: yesterday's
  * purchase counts more than last year's.
  *
  *   w(event) = exp(−ln2 · age_days / halfLifeDays)
  *
  * computed against a caller-supplied reference instant (NOT wall
  * clock — runs must be reproducible), so this is ONE map-side-combined
  * groupBy over projected weights. No window, no per-row state.
  */
object Decay {

  /** Per-key decayed sum/count of `valueCol` with the given half-life.
    * (key, n_events, decayed_sum 6dp, decayed_count 6dp) — decayed_count
    * is the sum of weights alone, the "effective sample size".
    */
  def decayedAggregate(events: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, asOf: java.sql.Timestamp,
                       halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0)
    val ev = graft.core.Tables.ltzTs(events, tsCol)
    val ageDays = (lit(asOf.getTime * 1000L) - unix_micros(col(tsCol))) /
      lit(86400.0 * 1e6)
    val w = exp(lit(-math.log(2.0) / halfLifeDays) * ageDays)
    ev.filter(col(tsCol) <= lit(asOf))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(w * col(valueCol)), 6).as("decayed_sum"),
        round(sum(w), 6).as("decayed_count"))
  }
}
