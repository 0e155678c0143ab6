package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group simple linear regression + correlation significance — the
  * "trend per segment" query (does price drive quantity differently per
  * return flag? is this metric drifting per tenant?). Everything is
  * closed-form over the standard ANSI regr_* aggregates, so the whole
  * thing is ONE map-side-combined groupBy — no per-group model fits,
  * no window, no iteration.
  */
object GroupRegression {

  /** (group, n, slope, intercept, r2, corr, t_stat) — 6dp. t is the
    * corr significance statistic r·sqrt((n−2)/(1−r²)) (NULL for n ≤ 2
    * or |r| = 1, where it diverges). Rows with a NULL on either side
    * are excluded pairwise (regr_* semantics on both engines).
    */
  def fit(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val r = col("__r")
    val n = col("n")
    val t = when(n > 2 && abs(r) < 1.0,
      round(r * sqrt((n - 2) / (lit(1.0) - r * r)), 6))
    df.groupBy(col(groupCol))
      .agg(regr_count(y, x).as("n"),
        regr_slope(y, x).as("__slope"),
        regr_intercept(y, x).as("__icpt"),
        regr_r2(y, x).as("__r2"),
        corr(y, x).as("__r"))
      .select(col(groupCol), col("n"),
        round(col("__slope"), 6).as("slope"),
        round(col("__icpt"), 6).as("intercept"),
        round(col("__r2"), 6).as("r2"),
        round(r, 6).as("corr"),
        t.as("t_stat"))
  }
}
