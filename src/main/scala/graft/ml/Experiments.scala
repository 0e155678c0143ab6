package graft.ml

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation read-outs beyond the plain two-sample test the
  * reference's metric utilities cover (Welch t is q185): CUPED
  * variance reduction (Deng et al., WSDM'13) and the two-period
  * difference-in-differences estimator — the two workhorse analyses a
  * platform runs over an events stream once an A/B assignment exists
  * (reference scope: src/workbench/utils/metrics_utils.py computes
  * point metrics only; these generalize them to adjusted estimates).
  *
  * Scale design: both are pure aggregation pyramids — one entity-level
  * groupBy (map-side combinable) followed by constant-size variant
  * aggregates. Sums ride DECIMAL(18,2) so every engine and every
  * partition order produces the identical total; the few double
  * divisions happen on those exact decimals in a fixed expression
  * shape, making the 6dp-rounded output engine-stable.
  */
object Experiments {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** CUPED-adjusted variant read-out. Each entity contributes a
    * pre-period covariate X (decimal sum of `valueCol` strictly before
    * `splitTs`) and a post-period outcome Y (decimal sum at/after it);
    * entities active in only one period count 0 in the other — the
    * standard "X is a pre-exposure covariate, never missing" framing.
    * θ = cov(X,Y)/var(X) is estimated POOLED across variants (the
    * unbiased choice under randomization), and each variant reports
    * its raw and adjusted mean plus the realized variance reduction
    * 1 − var(Y − θX)/var(Y).
    *
    * Returns one row per variant: (variant, n_units, mean_y,
    * mean_y_cuped, var_y, var_y_cuped, theta, var_reduction), 6dp.
    */
  def cuped(events: DataFrame, entityCol: String, tsCol: String,
            valueCol: String, variantOf: Column => Column,
            splitTs: String): DataFrame = {
    val e = Tables.ltzTs(events, tsCol)
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
    val pre = col(tsCol) < to_timestamp(lit(splitTs))
    // entity rollup: exact decimal X/Y per unit (one shuffle, combiner)
    val units = e.groupBy(col(entityCol).as("__u"))
      .agg(
        coalesce(sum(when(pre, dec(col(valueCol)))), lit(0).cast("decimal(18,2)")).as("__x"),
        coalesce(sum(when(!pre, dec(col(valueCol)))), lit(0).cast("decimal(18,2)")).as("__y"))
      .withColumn("__v", variantOf(col("__u")))
    // pooled θ and global mean-x from one constant-size aggregate
    val g = units.agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__x") * col("__y")).as("sxy")).head()
    val n = g.getLong(0).toDouble
    def d(i: Int): Double = if (g.isNullAt(i)) 0.0 else g.getDecimal(i).doubleValue()
    val sx = d(1); val sy = d(2); val sxx = d(3); val sxy = d(4)
    // empty/degenerate pre-period → θ = 0 (CUPED degrades to the raw mean)
    val thetaDen = n * sxx - sx * sx
    val theta = if (n == 0 || thetaDen == 0) 0.0 else (n * sxy - sx * sy) / thetaDen
    val meanX = if (n == 0) 0.0 else sx / n
    // per-variant moments (decimal-exact), then the CUPED identities:
    // var(Y−θX) = var(Y) − 2θ·cov(X,Y) + θ²·var(X)
    units.groupBy(col("__v").as("variant"))
      .agg(
        count(lit(1)).as("n_units"),
        sum(col("__x")).as("vsx"), sum(col("__y")).as("vsy"),
        sum(col("__x") * col("__x")).as("vsxx"),
        sum(col("__y") * col("__y")).as("vsyy"),
        sum(col("__x") * col("__y")).as("vsxy"))
      .select((Seq(col("variant"), col("n_units")) ++ {
        val nn = col("n_units").cast("double")
        val vsx = col("vsx").cast("double"); val vsy = col("vsy").cast("double")
        val vsxx = col("vsxx").cast("double"); val vsyy = col("vsyy").cast("double")
        val vsxy = col("vsxy").cast("double")
        val meanY = vsy / nn
        val varY = (vsyy - vsy * vsy / nn) / (nn - 1)
        val varX = (vsxx - vsx * vsx / nn) / (nn - 1)
        val covXY = (vsxy - vsx * vsy / nn) / (nn - 1)
        val varC = varY - lit(2 * theta) * covXY + lit(theta * theta) * varX
        Seq(
          round(meanY, 6).as("mean_y"),
          round(meanY - lit(theta) * (vsx / nn - lit(meanX)), 6).as("mean_y_cuped"),
          round(varY, 6).as("var_y"),
          round(varC, 6).as("var_y_cuped"),
          round(lit(theta), 6).as("theta"),
          round(lit(1.0) - varC / varY, 6).as("var_reduction"))
      }): _*)
      .orderBy("variant")
  }

  /** Two-period × two-group difference-in-differences over raw event
    * values: did = (m̄_treat,post − m̄_treat,pre) − (m̄_ctrl,post −
    * m̄_ctrl,pre), with the classic large-sample SE from the four cell
    * variances (Σ s²_g/n_g under independence). One aggregation, one
    * row out: (m_ctrl_pre, m_ctrl_post, m_treat_pre, m_treat_post,
    * did, se, t_stat), 6dp.
    */
  def diffInDiff(events: DataFrame, tsCol: String, valueCol: String,
                 treatOf: Column, splitTs: String): DataFrame = {
    val e = Tables.ltzTs(events, tsCol)
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(treatOf.cast("int").as("__t"),
        (col(tsCol) >= to_timestamp(lit(splitTs))).cast("int").as("__p"),
        dec(col(valueCol)).as("__y"))
    def cell(t: Int, p: Int, agg: Column): Column =
      sum(when(col("__t") === t && col("__p") === p, agg))
    val aggs = (for (t <- 0 to 1; p <- 0 to 1) yield Seq(
      cell(t, p, lit(1L)).as(s"n$t$p"),
      cell(t, p, col("__y")).as(s"s$t$p"),
      cell(t, p, col("__y") * col("__y")).as(s"q$t$p"))).flatten
    val m = e.agg(aggs.head, aggs.tail: _*)
    def nn(t: Int, p: Int) = col(s"n$t$p").cast("double")
    def mean(t: Int, p: Int) = col(s"s$t$p").cast("double") / nn(t, p)
    def v(t: Int, p: Int) =
      (col(s"q$t$p").cast("double") -
        col(s"s$t$p").cast("double") * col(s"s$t$p").cast("double") / nn(t, p)) /
        (nn(t, p) - 1)
    val did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    val se = sqrt(v(0, 0) / nn(0, 0) + v(0, 1) / nn(0, 1) +
      v(1, 0) / nn(1, 0) + v(1, 1) / nn(1, 1))
    m.select(
      round(mean(0, 0), 6).as("m_ctrl_pre"),
      round(mean(0, 1), 6).as("m_ctrl_post"),
      round(mean(1, 0), 6).as("m_treat_pre"),
      round(mean(1, 1), 6).as("m_treat_post"),
      round(did, 6).as("did"),
      round(se, 6).as("se"),
      round(did / se, 6).as("t_stat"))
  }
}
