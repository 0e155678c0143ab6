package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inequality / concentration diagnostics per group: Gini coefficient,
  * Herfindahl-Hirschman index and the top-q share — the "is this
  * segment dominated by a few whales" read-out that pairs with the
  * ABC analysis (q191) and skew report (q169) when sizing salting and
  * partition strategies: a group with HHI near 1 is exactly the one
  * whose join key needs salting at 100 TB.
  *
  * Scale shape: one per-group sort window assigns Lorenz ranks, one
  * groupBy collapses to a #groups-sized frame. The window partitions
  * by the group key, so skew in the MEASURED data surfaces as window
  * skew here — for a pathological group, pre-aggregate values per
  * entity first (the q261 construction does: customer totals, not raw
  * orders, enter the sort).
  */
object Concentration {

  /** Per-group concentration over a non-negative measure. Gini uses
    * the sorted-index form G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n with xᵢ
    * ascending (ties are index-permutation-invariant: equal x make the
    * i·xᵢ sum identical under any tie order). HHI = Σ (xᵢ/Σx)², in
    * [1/n, 1]. `top_share` is the share held by the top
    * ceil(n·topFrac) values. Zero-total groups emit nulls (shares are
    * undefined). Negative values are accepted arithmetically but make
    * Gini exceed [0,1] — clamp upstream when the measure can go
    * negative. Returns (group, n, total, gini, hhi, top_share),
    * floats 6dp. */
  def concentration(df: DataFrame, groupCol: String, valueCol: String,
                    topFrac: Double = 0.1): DataFrame = {
    require(topFrac > 0 && topFrac <= 1, s"topFrac in (0,1], got $topFrac")
    val asc = Window.partitionBy(col("__g")).orderBy(col("__x").asc)
    val desc = Window.partitionBy(col("__g")).orderBy(col("__x").desc)
    val ranked = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(asc))
      .withColumn("__ri", row_number().over(desc))
      .withColumn("__ng",
        count(lit(1)).over(Window.partitionBy("__g")))
    ranked.groupBy(col("__g").as("group"))
      .agg(count(lit(1)).as("n"),
        sum("__x").as("__t"),
        sum(col("__i") * col("__x")).as("__iw"),
        sum(col("__x") * col("__x")).as("__xx"),
        sum(when(col("__ri") <= ceil(col("__ng") * topFrac), col("__x"))
          .otherwise(lit(0.0))).as("__top"))
      // total is data-scaled (can be ~1e7) where 6dp sits inside float
      // summation-order noise — 2dp keeps the cross-engine flip
      // probability negligible; the O(1) ratios stay 6dp
      .select(col("group"), col("n"),
        round(col("__t"), 2).as("total"),
        when(col("__t") =!= 0.0, round(
          lit(2.0) * col("__iw") / (col("n") * col("__t")) -
            (col("n") + lit(1.0)) / col("n"), 6)).as("gini"),
        when(col("__t") =!= 0.0,
          round(col("__xx") / (col("__t") * col("__t")), 6)).as("hhi"),
        when(col("__t") =!= 0.0,
          round(col("__top") / col("__t"), 6)).as("top_share"))
  }

  /** DuckDB mirror of [[concentration]]: `rowsCte` must yield
    * (grp, x). */
  def concentrationOracleSql(rowsCte: String, topFrac: Double): String =
    s"""WITH rows0 AS ($rowsCte),
        ranked AS (SELECT grp, CAST(x AS DOUBLE) AS x,
            ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x ASC) AS i,
            ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x DESC) AS ri,
            COUNT(*) OVER (PARTITION BY grp) AS ng
          FROM rows0 WHERE x IS NOT NULL)
        SELECT grp AS "group", COUNT(*) AS n,
          ROUND(SUM(x), 2) AS total,
          CASE WHEN SUM(x) != 0 THEN ROUND(
            2.0 * SUM(i * x) / (COUNT(*) * SUM(x)) -
              (COUNT(*) + 1.0) / COUNT(*), 6) END AS gini,
          CASE WHEN SUM(x) != 0 THEN
            ROUND(SUM(x * x) / (SUM(x) * SUM(x)), 6) END AS hhi,
          CASE WHEN SUM(x) != 0 THEN
            ROUND(SUM(CASE WHEN ri <= CEIL(ng * $topFrac)
              THEN x ELSE 0.0 END) / SUM(x), 6) END AS top_share
        FROM ranked GROUP BY grp"""
}
