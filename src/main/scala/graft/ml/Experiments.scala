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

  /** Propensity-style STRATIFIED treatment-effect estimate — the
    * observational companion to [[cuped]]/[[diffInDiff]] when
    * assignment wasn't randomized: bin units into `nStrata` roughly
    * equal strata of a confounding covariate, difference the arm means
    * within each stratum, and reweight — ATE weights by stratum size,
    * ATT by the stratum's treated count (Rosenbaum & Rubin '84
    * subclassification). Strata lacking an arm (no overlap) are
    * excluded and the weights renormalize over the rest.
    *
    * Stratum assignment rides the DISTINCT-covariate frame: one
    * groupBy collapses the units, a cumulative-count window over that
    * collapsed frame maps each value to floor(before·S/N)+1 (ties land
    * together — deterministic with no per-unit tiebreak and no
    * data-sized sort; a continuous covariate should be pre-quantized
    * so the distinct frame stays metadata-sized). Outcomes ride
    * DECIMAL(18,2). Returns one row per stratum: (stratum, n,
    * n_treated, mean_treated, mean_control, diff, ate, att) 6dp, with
    * ate/att repeated on every row.
    */
  def stratifiedAte(units0: DataFrame, treatedCol: String,
                    outcomeCol: String, covariateCol: String,
                    nStrata: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nStrata >= 2, "need at least 2 strata")
    val units = units0
      .filter(col(outcomeCol).isNotNull && col(covariateCol).isNotNull)
      .select(col(treatedCol).cast("int").as("__t"),
        dec(col(outcomeCol)).as("__y"),
        col(covariateCol).cast("double").as("__x"))
    val byV = units.groupBy("__x").agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nTot = byV.agg(sum("__c").as("__nTot"))
    val smap = byV
      .withColumn("__before", coalesce(sum("__c").over(wCum), lit(0L)))
      .crossJoin(nTot)
      .select(col("__x"),
        (floor(col("__before") * nStrata / col("__nTot")) + 1)
          .cast("int").as("stratum"))
    val g = units.join(smap, Seq("__x"))
      .groupBy("stratum").agg(
        count(lit(1)).as("n"),
        sum("__t").cast("long").as("n_treated"),
        sum(when(col("__t") === 1, col("__y"))).as("__st"),
        sum(when(col("__t") === 0, col("__y"))).as("__sc"))
    val nT = col("n_treated").cast("double")
    val nC = (col("n") - col("n_treated")).cast("double")
    val scored = g
      .withColumn("__mt", col("__st").cast("double") / nT)
      .withColumn("__mc", col("__sc").cast("double") / nC)
      .withColumn("__diff",
        when(col("n_treated") > 0 && col("n_treated") < col("n"),
          col("__mt") - col("__mc")))
    val overall = scored.filter(col("__diff").isNotNull).agg(
      (sum(col("__diff") * col("n")) / sum(col("n"))).as("__ate"),
      (sum(col("__diff") * col("n_treated")) / sum(col("n_treated")))
        .as("__att"))
    scored.crossJoin(overall)
      .select(col("stratum"), col("n"), col("n_treated"),
        round(col("__mt"), 6).as("mean_treated"),
        round(col("__mc"), 6).as("mean_control"),
        round(col("__diff"), 6).as("diff"),
        round(col("__ate"), 6).as("ate"),
        round(col("__att"), 6).as("att"))
  }

  /** DuckDB twin of [[stratifiedAte]]; `unitsCte` must yield
    * (treated, y, x). */
  def stratifiedAteOracleSql(unitsCte: String, nStrata: Int = 5): String =
    s"""WITH units AS ($unitsCte),
        u AS (SELECT CAST(treated AS INT) AS t,
            CAST(y AS DECIMAL(18,2)) AS y, CAST(x AS DOUBLE) AS x
          FROM units WHERE y IS NOT NULL AND x IS NOT NULL),
        byv AS (SELECT x, COUNT(*) AS c FROM u GROUP BY x),
        smap AS (SELECT x,
            CAST(FLOOR(COALESCE(SUM(c) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              * $nStrata / (SELECT SUM(c) FROM byv)) AS INT) + 1
              AS stratum
          FROM byv),
        g AS (SELECT stratum, COUNT(*) AS n,
            CAST(SUM(t) AS BIGINT) AS n_treated,
            SUM(CASE WHEN t = 1 THEN y END) AS st,
            SUM(CASE WHEN t = 0 THEN y END) AS sc
          FROM u JOIN smap USING (x) GROUP BY stratum),
        sc2 AS (SELECT stratum, n, n_treated,
            CAST(st AS DOUBLE) / n_treated AS mt,
            CAST(sc AS DOUBLE) / (n - n_treated) AS mc,
            CASE WHEN n_treated > 0 AND n_treated < n THEN
              CAST(st AS DOUBLE) / n_treated -
                CAST(sc AS DOUBLE) / (n - n_treated) END AS diff
          FROM g),
        tot AS (SELECT SUM(diff * n) / SUM(n) AS ate,
            SUM(diff * n_treated) / SUM(n_treated) AS att
          FROM sc2 WHERE diff IS NOT NULL)
        SELECT stratum, n, n_treated, ROUND(mt, 6) AS mean_treated,
          ROUND(mc, 6) AS mean_control, ROUND(diff, 6) AS diff,
          ROUND(ate, 6) AS ate, ROUND(att, 6) AS att
        FROM sc2 CROSS JOIN tot"""

  /** Delta-method confidence interval for a RATIO metric per arm —
    * revenue per session, clicks per impression: any metric whose
    * denominator varies per unit, where the naive mean-of-ratios and
    * its t-interval are both wrong (Deng et al., KDD'18 practice
    * note). R = ΣY/ΣX over units; Var(R) ≈ (S_yy − 2R·S_yx + R²·S_xx)
    * / (n·x̄²) with sample (n−1) moments of the unit-level (Y, X).
    *
    * ONE aggregate per arm over the unit frame (the caller's unit
    * groupBy is the only corpus pass): decimal ΣY/ΣX for the exact
    * point estimate, double cross-moments in the fixed closed form.
    * Arms with n < 2 or x̄ = 0 emit null se/bounds. Returns one row
    * per arm: (arm, n, num_total, den_total, ratio, se, ci_lo, ci_hi)
    * 6dp, z = 1.96. */
  def ratioMetricCi(units: DataFrame, armCol: String, numCol: String,
                    denCol: String): DataFrame = {
    val y = col(numCol).cast("double")
    val x = col(denCol).cast("double")
    val g = units.groupBy(col(armCol).as("arm")).agg(
      count(lit(1)).as("n"),
      sum(dec(col(numCol))).as("__sy"), sum(dec(col(denCol))).as("__sx"),
      sum(y * y).as("__syy"), sum(x * x).as("__sxx"),
      sum(y * x).as("__syx"))
    val n = col("n").cast("double")
    val my = col("__sy").cast("double") / n
    val mx = col("__sx").cast("double") / n
    val r = col("__sy").cast("double") / col("__sx").cast("double")
    val syy = (col("__syy") - n * my * my) / (n - 1)
    val sxx = (col("__sxx") - n * mx * mx) / (n - 1)
    val syx = (col("__syx") - n * my * mx) / (n - 1)
    val varR = (syy - lit(2.0) * r * syx + r * r * sxx) / (n * mx * mx)
    val se = when(col("n") >= 2 && col("__sx") =!= 0,
      sqrt(greatest(varR, lit(0.0))))
    g.select(col("arm"), col("n"),
      col("__sy").cast("double").as("num_total"),
      col("__sx").cast("double").as("den_total"),
      round(r, 6).as("ratio"), round(se, 6).as("se"),
      round(r - lit(1.96) * se, 6).as("ci_lo"),
      round(r + lit(1.96) * se, 6).as("ci_hi"))
  }

  /** DuckDB twin of [[ratioMetricCi]]; `unitsCte` must yield
    * (arm, y, x). */
  def ratioMetricCiOracleSql(unitsCte: String): String =
    s"""WITH units AS ($unitsCte),
        g AS (SELECT arm, COUNT(*) AS n,
            SUM(CAST(y AS DECIMAL(18,2))) AS sy,
            SUM(CAST(x AS DECIMAL(18,2))) AS sx,
            SUM(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS syy,
            SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS sxx,
            SUM(CAST(y AS DOUBLE) * CAST(x AS DOUBLE)) AS syx
          FROM units GROUP BY arm),
        sc AS (SELECT arm, n,
            CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
            CAST(sy AS DOUBLE) / n AS my, CAST(sx AS DOUBLE) / n AS mx,
            CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE) AS r,
            syy, sxx, syx
          FROM g),
        v AS (SELECT arm, n, syd, sxd, r,
            CASE WHEN n >= 2 AND sxd != 0 THEN
              SQRT(GREATEST((
                (syy - n * my * my) / (n - 1)
                - 2 * r * ((syx - n * my * mx) / (n - 1))
                + r * r * ((sxx - n * mx * mx) / (n - 1)))
                / (n * mx * mx), 0)) END AS se
          FROM sc)
        SELECT arm, n, syd AS num_total, sxd AS den_total,
          ROUND(r, 6) AS ratio, ROUND(se, 6) AS se,
          ROUND(r - 1.96 * se, 6) AS ci_lo,
          ROUND(r + 1.96 * se, 6) AS ci_hi
        FROM v"""

  /** Nearest-neighbor CALIPER MATCHING on a scalar covariate — the
    * third leg of the observational stool after [[stratifiedAte]]
    * (coarse strata) and regression adjustment ([[cuped]]'s machinery):
    * each treated unit matches the control whose covariate is closest
    * (with replacement), discarded if the gap exceeds `caliper`
    * (Rosenbaum & Rubin '85); ATT = mean matched outcome difference.
    *
    * Scale shape: in sorted covariate order the nearest control is
    * always the last control AT-OR-BEFORE or the first control AFTER
    * the treated value, so the corpus collapses to the DISTINCT-
    * covariate frame first (treated outcome sums + one deterministic
    * control representative per value — the max-outcome control, a
    * fixed tie rule) and two ignore-nulls window lookups over that
    * collapsed frame replace the all-pairs distance join — the
    * [[stratifiedAte]] argument: pre-quantize a continuous covariate
    * and the window frame stays metadata-sized. Equal back/forward
    * gaps take the at-or-before control (so an exact-x control always
    * wins at distance 0). Returns ONE row: (n_treated, n_matched,
    * att, mean_treated, mean_matched_control) 6dp, means over the
    * matched set. */
  def caliperMatch(units0: DataFrame, treatedCol: String,
                   outcomeCol: String, covariateCol: String,
                   caliper: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(caliper > 0, "caliper must be positive")
    val units = units0
      .filter(col(outcomeCol).isNotNull && col(covariateCol).isNotNull)
      .select(col(treatedCol).cast("int").as("__t"),
        col(outcomeCol).as("__y"),
        col(covariateCol).cast("double").as("__x"))
    val byX = units.groupBy("__x").agg(
      sum(when(col("__t") === 1, 1L).otherwise(0L)).as("__nt"),
      sum(when(col("__t") === 1, dec(col("__y")))).as("__syt"),
      max(when(col("__t") === 0, col("__y").cast("double"))).as("__cyRep"))
    val wB = Window.orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.orderBy("__x")
      .rowsBetween(1, Window.unboundedFollowing)
    val cx = when(col("__cyRep").isNotNull, col("__x"))
    val m = byX
      .withColumn("__bx", last(cx, ignoreNulls = true).over(wB))
      .withColumn("__by", last(col("__cyRep"), ignoreNulls = true).over(wB))
      .withColumn("__fx", first(cx, ignoreNulls = true).over(wF))
      .withColumn("__fy", first(col("__cyRep"), ignoreNulls = true).over(wF))
      .filter(col("__nt") > 0)
    val db = col("__x") - col("__bx")
    val df_ = col("__fx") - col("__x")
    val pickBack = col("__bx").isNotNull &&
      (col("__fx").isNull || db <= df_)
    val scored = m
      .withColumn("__cy", when(pickBack, col("__by")).otherwise(col("__fy")))
      .withColumn("__d", when(pickBack, db).otherwise(df_))
      .withColumn("__ok", col("__cy").isNotNull && col("__d") <= caliper)
    val okNt = when(col("__ok"), col("__nt")).otherwise(lit(0L))
    scored.agg(
      sum("__nt").cast("long").as("n_treated"),
      sum(okNt).cast("long").as("n_matched"),
      round(
        (sum(when(col("__ok"), col("__syt").cast("double"))) -
          sum(okNt.cast("double") * col("__cy"))) / sum(okNt), 6).as("att"),
      round(sum(when(col("__ok"), col("__syt").cast("double"))) / sum(okNt),
        6).as("mean_treated"),
      round(sum(okNt.cast("double") * col("__cy")) / sum(okNt), 6)
        .as("mean_matched_control"))
  }

  /** DuckDB twin of [[caliperMatch]]; `unitsCte` must yield
    * (treated, y, x). */
  def caliperMatchOracleSql(unitsCte: String, caliper: Double): String =
    s"""WITH units AS ($unitsCte),
        u AS (SELECT CAST(treated AS INT) AS t, y,
            CAST(x AS DOUBLE) AS x
          FROM units WHERE y IS NOT NULL AND x IS NOT NULL),
        byx AS (SELECT x,
            SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS nt,
            SUM(CASE WHEN t = 1 THEN CAST(y AS DECIMAL(18,2)) END) AS syt,
            MAX(CASE WHEN t = 0 THEN CAST(y AS DOUBLE) END) AS cyrep
          FROM u GROUP BY x),
        w AS (SELECT x, nt, syt,
            LAST_VALUE(CASE WHEN cyrep IS NOT NULL THEN x END IGNORE NULLS)
              OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bx,
            LAST_VALUE(cyrep IGNORE NULLS)
              OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS by,
            FIRST_VALUE(CASE WHEN cyrep IS NOT NULL THEN x END IGNORE NULLS)
              OVER (ORDER BY x
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fx,
            FIRST_VALUE(cyrep IGNORE NULLS)
              OVER (ORDER BY x
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fy
          FROM byx),
        m AS (SELECT x, nt, syt,
            CASE WHEN bx IS NOT NULL AND (fx IS NULL OR x - bx <= fx - x)
              THEN by ELSE fy END AS cy,
            CASE WHEN bx IS NOT NULL AND (fx IS NULL OR x - bx <= fx - x)
              THEN x - bx ELSE fx - x END AS d
          FROM w WHERE nt > 0),
        s AS (SELECT nt, syt, cy,
            (cy IS NOT NULL AND d <= $caliper) AS ok
          FROM m)
        SELECT CAST(SUM(nt) AS BIGINT) AS n_treated,
          CAST(SUM(CASE WHEN ok THEN nt ELSE 0 END) AS BIGINT)
            AS n_matched,
          ROUND((SUM(CASE WHEN ok THEN CAST(syt AS DOUBLE) END)
              - SUM(CASE WHEN ok THEN nt ELSE 0 END * cy))
            / SUM(CASE WHEN ok THEN nt ELSE 0 END), 6) AS att,
          ROUND(SUM(CASE WHEN ok THEN CAST(syt AS DOUBLE) END)
            / SUM(CASE WHEN ok THEN nt ELSE 0 END), 6) AS mean_treated,
          ROUND(SUM(CASE WHEN ok THEN nt ELSE 0 END * cy)
            / SUM(CASE WHEN ok THEN nt ELSE 0 END), 6)
            AS mean_matched_control
        FROM s"""

  /** Raking / iterative proportional fitting (Deming & Stephan 1940):
    * calibrate per-cell sample weights so the weighted sample margins
    * match the POPULATION margins on two categorical dimensions — the
    * survey-reweighting step before any "is my responding subset
    * representative" read-out. `iters` full row+column cycles are
    * unrolled (IPF converges geometrically; 3 cycles is the practical
    * default, and a FIXED count is what makes the oracle exact).
    *
    * Scale shape: two corpus passes (population margins, sample cell
    * counts) collapse everything to the (#rows × #cols) cell frame —
    * metadata — and the IPF cycles are joins on that frame only.
    * Returns one row per sample cell: (r, c, n_sample, weight 6dp,
    * weighted_n 6dp) — weight is the per-unit multiplier, weighted_n
    * = n_sample · weight. Empty sample cells get no row (their mass
    * is redistributed by construction). */
  def rakeWeights(sample: DataFrame, population: DataFrame,
                  rowCol: String, colCol: String,
                  iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, s"iters $iters out of range")
    val popR = population.groupBy(col(rowCol).as("r"))
      .agg(count(lit(1)).cast("double").as("__pr"))
    val popC = population.groupBy(col(colCol).as("c"))
      .agg(count(lit(1)).cast("double").as("__pc"))
    var cells = sample.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("n_sample"))
      .join(popR, Seq("r")).join(popC, Seq("c"))
      .withColumn("__w", lit(1.0))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val rowTot = cells.groupBy("r")
        .agg(sum(col("n_sample") * col("__w")).as("__tr"))
      cells = cells.join(rowTot, Seq("r"))
        .withColumn("__w", col("__w") * col("__pr") / col("__tr"))
        .drop("__tr")
      val colTot = cells.groupBy("c")
        .agg(sum(col("n_sample") * col("__w")).as("__tc"))
      cells = cells.join(colTot, Seq("c"))
        .withColumn("__w", col("__w") * col("__pc") / col("__tc"))
        .drop("__tc").localCheckpoint(true)
    }
    cells.select(col("r"), col("c"), col("n_sample"),
      round(col("__w"), 6).as("weight"),
      round(col("n_sample") * col("__w"), 6).as("weighted_n"))
  }

  /** DuckDB twin of [[rakeWeights]]; `sampleCte`/`popCte` must yield
    * (r, c). The IPF cycles are unrolled identically. */
  def rakeWeightsOracleSql(sampleCte: String, popCte: String,
                           iters: Int = 3): String = {
    val rounds = (1 to iters).map { t =>
      s"""tr$t AS (SELECT r, SUM(n_sample * w) AS tr
            FROM w${t - 1} GROUP BY r),
          wr$t AS (SELECT w.r, w.c, w.n_sample, w.pr, w.pc,
              w.w * w.pr / tr$t.tr AS w
            FROM w${t - 1} w JOIN tr$t ON w.r = tr$t.r),
          tc$t AS (SELECT c, SUM(n_sample * w) AS tc
            FROM wr$t GROUP BY c),
          w$t AS (SELECT w.r, w.c, w.n_sample, w.pr, w.pc,
              w.w * w.pc / tc$t.tc AS w
            FROM wr$t w JOIN tc$t ON w.c = tc$t.c)"""
    }.mkString(",\n")
    s"""WITH s AS ($sampleCte), p AS ($popCte),
        popr AS (SELECT r, CAST(COUNT(*) AS DOUBLE) AS pr
          FROM p GROUP BY r),
        popc AS (SELECT c, CAST(COUNT(*) AS DOUBLE) AS pc
          FROM p GROUP BY c),
        w0 AS (SELECT s.r, s.c, COUNT(*) AS n_sample,
            ANY_VALUE(popr.pr) AS pr, ANY_VALUE(popc.pc) AS pc, 1.0 AS w
          FROM s JOIN popr ON s.r = popr.r JOIN popc ON s.c = popc.c
          GROUP BY s.r, s.c),
        $rounds
        SELECT r, c, CAST(n_sample AS BIGINT) AS n_sample,
          ROUND(w, 6) AS weight,
          ROUND(n_sample * w, 6) AS weighted_n
        FROM w$iters"""
  }

  /** Quantile treatment effects: the per-decile difference between
    * the treated and control outcome distributions — WHERE the effect
    * lives (bottom lift vs top-tail lift), which the single ATE
    * (q277/q282) averages away. Exact per-group percentiles (the
    * quantile_cont kernel), deciles 10%..90%.
    *
    * Scale shape: one exact-percentile aggregate per group (two rows),
    * exploded to 9 metadata rows. Returns (p, q_treat 6dp,
    * q_ctrl 6dp, qte 6dp). */
  def quantileTreatmentEffects(units: DataFrame, groupCol: String,
                               valueCol: String, treatGroup: String,
                               ctrlGroup: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val ps = (1 to 9).map(_ / 10.0)
    val base = units.filter(v.isNotNull && !isnan(v) &&
      col(groupCol).isin(treatGroup, ctrlGroup))
    def qs(g: String) = base.filter(col(groupCol) === g)
      .agg(graft.functions.ExactPercentiles.exactPercentiles(v, ps)
        .as("__q"))
    val t = qs(treatGroup)
      .select(posexplode(col("__q")).as(Seq("__i", "q_treat")))
    val c = qs(ctrlGroup)
      .select(posexplode(col("__q")).as(Seq("__i", "q_ctrl")))
    t.join(c, Seq("__i"))
      .select(((col("__i") + 1).cast("double") / 10.0).as("p"),
        round(col("q_treat"), 6).as("q_treat"),
        round(col("q_ctrl"), 6).as("q_ctrl"),
        round(col("q_treat") - col("q_ctrl"), 6).as("qte"))
      .orderBy("p")
  }

  /** DuckDB twin of [[quantileTreatmentEffects]]; `unitsCte` must
    * yield (g, v). */
  def qteOracleSql(unitsCte: String, treatGroup: String,
                   ctrlGroup: String): String = {
    val ps = (1 to 9).map(_ / 10.0).mkString("[", ", ", "]")
    s"""WITH base AS (SELECT g, CAST(v AS DOUBLE) AS v FROM ($unitsCte)
          WHERE v IS NOT NULL AND NOT isnan(CAST(v AS DOUBLE))
            AND g IN ('$treatGroup', '$ctrlGroup')),
        qt AS (SELECT quantile_cont(v, $ps) AS q FROM base
          WHERE g = '$treatGroup'),
        qc AS (SELECT quantile_cont(v, $ps) AS q FROM base
          WHERE g = '$ctrlGroup'),
        ix AS (SELECT UNNEST(range(1, 10)) AS i)
        SELECT CAST(i AS DOUBLE) / 10.0 AS p, ROUND(qt.q[i], 6) AS q_treat,
          ROUND(qc.q[i], 6) AS q_ctrl,
          ROUND(qt.q[i] - qc.q[i], 6) AS qte
        FROM ix CROSS JOIN qt CROSS JOIN qc ORDER BY p"""
  }

  /** Exact Bayesian A/B read-out for binary outcomes under uniform
    * Beta(1,1) priors: posterior means per arm and the EXACT
    * probability that B beats A,
    *   P(p_B > p_A) = Σ_{i=0}^{a_B−1} B(a_A+i, b_A+b_B) /
    *                  ((b_B+i)·B(1+i, b_B)·B(a_A, b_A)),
    * the closed form of Cook (2005) — every Beta has INTEGER
    * parameters here, so the log-Beta terms come from the SAME
    * cumulative log-factorial ladder as q293's Fisher kernel (lf
    * window), never an lgamma call that could differ between libms.
    *
    * Scale shape: ONE conditional-count aggregate over the units
    * frame; the ladder frame is n+2 rows (unpartitioned cumsum — the
    * documented small-strata trade of the Fisher kernel, require-
    * guarded at 1e6) and the Cook sum is an a_B-row aggregate.
    * Returns one row: (n_a, s_a, n_b, s_b, mean_a 6dp, mean_b 6dp,
    * prob_b_beats_a 6dp). */
  def bayesianAb(units: DataFrame, armCol: String, convCol: String,
                 armA: String, armB: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = units.sparkSession
    val isA = col(armCol) === armA
    val isB = col(armCol) === armB
    val cRow = units.filter((isA || isB) && col(convCol).isNotNull)
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("na"),
        sum(when(isA && col(convCol) === 1, 1L).otherwise(0L)).as("sa"),
        sum(when(isB, 1L).otherwise(0L)).as("nb"),
        sum(when(isB && col(convCol) === 1, 1L).otherwise(0L)).as("sb"))
      .head()
    val (na, sa, nb, sb) = (cRow.getLong(0), cRow.getLong(1),
      cRow.getLong(2), cRow.getLong(3))
    require(na + nb <= 1000000L,
      s"bayesianAb exact kernel is for n <= 1e6, got ${na + nb}")
    // Beta(1+s, 1+f) posteriors; integer params for the ladder
    val (aA, bA) = (1L + sa, 1L + (na - sa))
    val (aB, bB) = (1L + sb, 1L + (nb - sb))
    val top = aA + aB + bA + bB
    val lf = spark.range(0, top + 1)
      .withColumn("lf", sum(log(greatest(col("id"), lit(1L))))
        .over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    def lfOf(alias: String) =
      lf.select(col("id").as(alias + "_i"), col("lf").as(alias))
    // ln B(x, y) = lf(x−1) + lf(y−1) − lf(x+y−1)
    val is = spark.range(0, aB).select(col("id").as("i"))
    val terms = is
      .join(lfOf("l1"), lit(aA - 1) + col("i") === col("l1_i")) // (aA+i)−1
      .join(lfOf("l2"), col("i") === col("l2_i")) // (1+i)−1
      .join(lfOf("l3"),
        lit(aA + bA + bB - 1) + col("i") === col("l3_i")) // (aA+i+bA+bB)−1
      .crossJoin(lf.filter(col("id") === bA + bB - 1)
        .select(col("lf").as("lbab")))
      .crossJoin(lf.filter(col("id") === bB - 1).select(col("lf").as("lbb")))
      .crossJoin(lf.filter(col("id") === aA - 1).select(col("lf").as("laa")))
      .crossJoin(lf.filter(col("id") === bA - 1).select(col("lf").as("lba")))
      .crossJoin(lf.filter(col("id") === aA + bA - 1)
        .select(col("lf").as("laba")))
      .select(
        // ln B(aA+i, bA+bB) = l1 + lbab − l3
        // ln B(1+i, bB) = l2 + lbb − lf(i+bB)  … need lf(i+bB):
        col("i"), col("l1"), col("l2"), col("l3"), col("lbab"),
        col("lbb"), col("laa"), col("lba"), col("laba"))
      .join(lfOf("l4"), col("i") + lit(bB) === col("l4_i")) // (1+i+bB)−1
      .select((col("l1") + col("lbab") - col("l3") -
        log(lit(bB.toDouble) + col("i")) -
        (col("l2") + col("lbb") - col("l4")) -
        (col("laa") + col("lba") - col("laba"))).as("lt"))
    val p = terms.agg(sum(exp(col("lt"))).as("p"))
    p.select(lit(na).as("n_a"), lit(sa).as("s_a"),
      lit(nb).as("n_b"), lit(sb).as("s_b"),
      round(lit(aA.toDouble / (aA + bA)), 6).as("mean_a"),
      round(lit(aB.toDouble / (aB + bB)), 6).as("mean_b"),
      round(least(col("p"), lit(1.0)), 6).as("prob_b_beats_a"))
  }

  /** DuckDB twin of [[bayesianAb]]; `unitsCte` must yield (arm, conv).
    * Builds the identical log-factorial ladder and Cook sum. */
  def bayesianAbOracleSql(unitsCte: String, armA: String,
                          armB: String): String =
    s"""WITH units AS (SELECT * FROM ($unitsCte)
          WHERE arm IN ('$armA', '$armB') AND conv IS NOT NULL),
        cts AS (SELECT
            CAST(SUM(CASE WHEN arm = '$armA' THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
            CAST(SUM(CASE WHEN arm = '$armA' AND conv = 1 THEN 1 ELSE 0
              END) AS BIGINT) AS sa,
            CAST(SUM(CASE WHEN arm = '$armB' THEN 1 ELSE 0 END)
              AS BIGINT) AS nb,
            CAST(SUM(CASE WHEN arm = '$armB' AND conv = 1 THEN 1 ELSE 0
              END) AS BIGINT) AS sb
          FROM units),
        par AS (SELECT na, sa, nb, sb, 1 + sa AS aa, 1 + na - sa AS ba,
            1 + sb AS ab, 1 + nb - sb AS bb FROM cts),
        lf AS MATERIALIZED (SELECT i,
            SUM(LN(GREATEST(i, 1))) OVER (ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
          FROM (SELECT UNNEST(range(0,
            (SELECT aa + ab + ba + bb FROM par) + 1)) AS i)),
        ks AS (SELECT UNNEST(range(0, (SELECT ab FROM par))) AS i),
        t AS (SELECT
            (l1.lf + lbab.lf - l3.lf
              - LN(CAST(par.bb AS DOUBLE) + ks.i)
              - (l2.lf + lbb.lf - l4.lf)
              - (laa.lf + lba.lf - laba.lf)) AS lt
          FROM ks CROSS JOIN par
          JOIN lf l1 ON l1.i = par.aa - 1 + ks.i
          JOIN lf l2 ON l2.i = ks.i
          JOIN lf l3 ON l3.i = par.aa + par.ba + par.bb - 1 + ks.i
          JOIN lf l4 ON l4.i = ks.i + par.bb
          JOIN lf lbab ON lbab.i = par.ba + par.bb - 1
          JOIN lf lbb ON lbb.i = par.bb - 1
          JOIN lf laa ON laa.i = par.aa - 1
          JOIN lf lba ON lba.i = par.ba - 1
          JOIN lf laba ON laba.i = par.aa + par.ba - 1)
        SELECT par.na AS n_a, par.sa AS s_a, par.nb AS n_b, par.sb AS s_b,
          ROUND(CAST(par.aa AS DOUBLE) / (par.aa + par.ba), 6) AS mean_a,
          ROUND(CAST(par.ab AS DOUBLE) / (par.ab + par.bb), 6) AS mean_b,
          ROUND(LEAST((SELECT SUM(EXP(lt)) FROM t), 1.0), 6)
            AS prob_b_beats_a
        FROM par"""

  /** Effective sample size and Kish design effect per group under a
    * row-weight column: ESS = (Σw)²/Σw², deff = n·Σw²/(Σw)² — the
    * "how many docs is this weighted corpus really worth" read-out
    * for importance-weighted (DSIR-style) or length-weighted training
    * mixes; deff ≈ 1 means weighting costs nothing, deff = 2 means
    * half the nominal sample is wasted on weight variance.
    *
    * Scale shape: ONE map-combinable groupBy with exact decimal power
    * sums (w at (18,2), w² at (37,4)) — order-free on any engine and
    * partitioning. Returns (group, n, sum_w 6dp, ess 6dp, deff 6dp).
    */
  def essProfile(df: DataFrame, groupCol: String,
                 weightCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = col(weightCol).cast(DecimalType(18, 2))
    val g = df.filter(col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n"),
        sum(w).cast("double").as("__s1"),
        sum(w * w).cast("double").as("__s2"))
    g.select(col("group"), col("n"),
        round(col("__s1"), 6).as("sum_w"),
        round(col("__s1") * col("__s1") / col("__s2"), 6).as("ess"),
        round(col("n").cast("double") * col("__s2") /
          (col("__s1") * col("__s1")), 6).as("deff"))
      .orderBy("group")
  }

  /** DuckDB twin of [[essProfile]]; `srcCte` must yield (g, w). */
  def essProfileOracleSql(srcCte: String): String =
    s"""WITH src AS ($srcCte),
        g AS (SELECT g AS "group", COUNT(*) AS n,
            CAST(SUM(CAST(w AS DECIMAL(18,2))) AS DOUBLE) AS s1,
            CAST(SUM(CAST(w AS DECIMAL(18,2))
              * CAST(w AS DECIMAL(18,2))) AS DOUBLE) AS s2
          FROM src WHERE w IS NOT NULL AND CAST(w AS DOUBLE) > 0
          GROUP BY g)
        SELECT "group", n, ROUND(s1, 6) AS sum_w,
          ROUND(s1 * s1 / s2, 6) AS ess,
          ROUND(CAST(n AS DOUBLE) * s2 / (s1 * s1), 6) AS deff
        FROM g ORDER BY "group""""

  /** TOST equivalence test (two one-sided Welch z-tests against a
    * ±margin): the A/B question significance tests cannot answer —
    * "are these two arms the SAME to within δ" (no significant
    * difference ≠ equivalence). Equivalent when BOTH one-sided tests
    * reject: (diff+δ)/se > z_crit AND (diff−δ)/se < −z_crit.
    * One exact-decimal moments aggregate. Returns one row:
    * (n_a, n_b, diff 6dp, se 6dp, t_lower 6dp, t_upper 6dp,
    * equivalent). */
  def tostEquivalence(df: DataFrame, groupCol: String, valueCol: String,
                      armA: String, armB: String, margin: Double,
                      zCrit: Double = 1.644854): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val y = col(valueCol).cast(DecimalType(18, 2))
    val isA = col(groupCol) === armA
    val isB = col(groupCol) === armB
    val g = df.filter(col(valueCol).isNotNull && (isA || isB))
      .agg(sum(isA.cast("long")).as("n_a"),
        sum(isB.cast("long")).as("n_b"),
        sum(when(isA, y)).cast("double").as("__sa"),
        sum(when(isB, y)).cast("double").as("__sb"),
        sum(when(isA, y * y)).cast("double").as("__qa"),
        sum(when(isB, y * y)).cast("double").as("__qb"))
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    // try_divide: an empty or single-row arm makes a divisor DOUBLE
    // 0.0 — DIVIDE_BY_ZERO under ANSI; null (not estimable) matches
    // DuckDB's null-on-zero-divide in the oracle twin. A zero se
    // (both arms constant) likewise yields null t's, not a crash.
    val ma = try_divide(col("__sa"), na)
    val mb = try_divide(col("__sb"), nb)
    val va = try_divide(col("__qa") - na * ma * ma, na - 1)
    val vb = try_divide(col("__qb") - nb * mb * mb, nb - 1)
    val diff = ma - mb
    val se = sqrt(va / na + vb / nb)
    val tLo = try_divide(diff + margin, se)
    val tUp = try_divide(diff - margin, se)
    g.select(col("n_a"), col("n_b"), round(diff, 6).as("diff"),
      round(se, 6).as("se"), round(tLo, 6).as("t_lower"),
      round(tUp, 6).as("t_upper"),
      (tLo > zCrit && tUp < -zCrit).as("equivalent"))
  }

  /** DuckDB twin of [[tostEquivalence]]; `srcCte` yields (arm, v). */
  def tostEquivalenceOracleSql(srcCte: String, armA: String,
                               armB: String, margin: Double,
                               zCrit: Double = 1.644854): String =
    s"""WITH src AS (SELECT arm, CAST(v AS DECIMAL(18,2)) AS v
          FROM ($srcCte)
          WHERE v IS NOT NULL AND arm IN ('$armA', '$armB')),
        g AS (SELECT
            CAST(SUM(CASE WHEN arm = '$armA' THEN 1 ELSE 0 END)
              AS BIGINT) AS na,
            CAST(SUM(CASE WHEN arm = '$armB' THEN 1 ELSE 0 END)
              AS BIGINT) AS nb,
            CAST(SUM(CASE WHEN arm = '$armA' THEN v END) AS DOUBLE)
              AS sa,
            CAST(SUM(CASE WHEN arm = '$armB' THEN v END) AS DOUBLE)
              AS sb,
            CAST(SUM(CASE WHEN arm = '$armA' THEN v * v END) AS DOUBLE)
              AS qa,
            CAST(SUM(CASE WHEN arm = '$armB' THEN v * v END) AS DOUBLE)
              AS qb
          FROM src),
        c AS (SELECT na, nb,
            sa / na - sb / nb AS diff,
            SQRT(((qa - na * (sa / na) * (sa / na)) / (na - 1)) / na
              + ((qb - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb)
              AS se
          FROM g)
        SELECT na AS n_a, nb AS n_b, ROUND(diff, 6) AS diff,
          ROUND(se, 6) AS se,
          ROUND((diff + $margin) / se, 6) AS t_lower,
          ROUND((diff - $margin) / se, 6) AS t_upper,
          ((diff + $margin) / se > $zCrit
            AND (diff - $margin) / se < -$zCrit) AS equivalent
        FROM c"""
}
