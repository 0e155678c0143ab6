package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group users by the week of their FIRST
  * event (the cohort), then count how many of each cohort are active
  * 0, 1, 2, … weeks later — the classic product-analytics retention
  * triangle.
  *
  * Scale shape: one user-keyed aggregate for cohort assignment, one
  * (user, week)-distinct aggregate for activity, one user-keyed equi
  * join between them, and a final metadata-sized groupBy — corpus
  * touched twice, both times collapsing to user cardinality. No
  * windows, no self-join of the raw event table.
  */
object Cohorts {

  /** (cohort_week, week_offset, n_active) — distinct users from the
    * cohort active in that offset week. week 0 row = cohort size.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = graft.core.Tables.ltzTs(events, tsCol)
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).as("__wk"))
    val cohorts = ev.groupBy("__u").agg(min(col("__wk")).as("cohort_week"))
    val active = ev.distinct()
    active.join(cohorts, Seq("__u"))
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_active"))
  }
}
