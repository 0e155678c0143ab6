package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Period-over-period BI reporting and behavioral transition analysis —
  * the weekly-report queries every analytics deployment runs.
  *
  * Scale shape: the heavy step is ONE period groupBy that collapses the
  * corpus to period-cardinality rows; the lag/moving-average windows
  * run over THAT table (52 rows a year), so the "global" window is
  * metadata-sized by construction. Transitions are a per-entity lag —
  * one shuffle on the entity key.
  */
object Reporting {

  /** Weekly metric report: (week, n, total 6dp, pct_change 6dp,
    * ma4 6dp) — percentage change vs the previous week and the
    * trailing 4-week moving average (current included). Sums
    * accumulate in DECIMAL(18,2) (order-independent addition).
    */
  def weeklyReport(events: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val ev = graft.core.Tables.ltzTs(events, tsCol)
    val weekly = ev.groupBy(date_trunc("week", col(tsCol)).as("week"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("__t"))
    val w = Window.orderBy("week")
    val ma = Window.orderBy("week").rowsBetween(-3, 0)
    weekly.select(col("week"), col("n"),
        round(col("__t"), 6).as("total"),
        round((col("__t") - lag("__t", 1).over(w)) / lag("__t", 1).over(w), 6)
          .as("pct_change"),
        round(avg("__t").over(ma), 6).as("ma4"))
  }

  /** Per-user event-type transition matrix: (from_type, to_type, n,
    * p 6dp) where p is row-normalized (Markov transition probability).
    * One entity-keyed lag window + one pair groupBy; ties at the same
    * (ts) are ordered by an id column for determinism.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, idCol: String): DataFrame = {
    val ev = graft.core.Tables.ltzTs(events, tsCol)
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = ev
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("__tot"))
    pairs.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("__tot"), 6).as("p"))
  }
}
