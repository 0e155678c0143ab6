package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Closed-form causal-inference estimators beyond the experiment
  * family (diff-in-diff q252, CUPED, bootstrap CI): instrumental
  * variables, regression discontinuity, and the cluster-design
  * correction — each a one-or-two-aggregate moments plan with no
  * iteration and no driver-side data.
  */
object Causal {

  /** Wald / just-identified 2SLS instrumental-variable estimate:
    * β_IV = cov(Z,Y)/cov(Z,D) — the causal effect of treatment D on
    * outcome Y when D is confounded but instrument Z moves D and
    * nothing else. Also reports the FIRST-STAGE strength (cov(Z,D)/
    * var(Z) and its F) — a weak instrument is the failure mode to
    * surface, not hide. ONE moments aggregate; Z and D are 0/1 so
    * every sufficient statistic is an integer count or an exact
    * decimal sum. Returns one row:
    * (n, first_stage 6dp, first_stage_f 6dp, beta_iv 6dp). */
  def ivWald(df: DataFrame, zCol: String, dCol: String,
             yCol: String): DataFrame = {
    val z = col(zCol).cast("long")
    val d = col(dCol).cast("long")
    val y = col(yCol).cast(DecimalType(18, 2))
    val g = df.filter(col(yCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(z).as("__sz"), sum(d).as("__sd"),
        sum(z * d).as("__szd"),
        sum(y).cast("double").as("__sy"),
        sum(when(z === 1, y)).cast("double").as("__szy"))
    val nd = col("n").cast("double")
    val mz = col("__sz").cast("double") / nd
    val md = col("__sd").cast("double") / nd
    val my = col("__sy") / nd
    val czd = col("__szd").cast("double") / nd - mz * md
    val czy = col("__szy") / nd - mz * my
    val vz = mz - mz * mz
    val fs = czd / vz
    // first-stage F for a single binary regressor: t² with
    // t = b/se, se² = (RSS/(n−2))/Szz; RSS = Sdd − b·Szd (centered)
    val szz = nd * vz
    val sdd = col("__sd").cast("double") - nd * md * md
    val szd = nd * czd
    val rss = sdd - fs * szd
    val fStat = when(rss > 0,
      fs * fs / ((rss / (nd - 2)) / szz))
    g.select(col("n"), round(fs, 6).as("first_stage"),
      round(fStat, 6).as("first_stage_f"),
      round(when(abs(czd) > 0, czy / czd), 6).as("beta_iv"))
  }

  /** DuckDB twin of [[ivWald]]; `srcCte` must yield (z, d, y) with
    * z/d in {0,1}. */
  def ivWaldOracleSql(srcCte: String): String =
    s"""WITH src AS (SELECT CAST(z AS BIGINT) AS z,
            CAST(d AS BIGINT) AS d, CAST(y AS DECIMAL(18,2)) AS y
          FROM ($srcCte) WHERE y IS NOT NULL),
        g AS (SELECT COUNT(*) AS n, SUM(z) AS sz, SUM(d) AS sd,
            SUM(z * d) AS szd, CAST(SUM(y) AS DOUBLE) AS sy,
            CAST(SUM(CASE WHEN z = 1 THEN y END) AS DOUBLE) AS szy
          FROM src),
        c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
            CAST(sz AS DOUBLE) / n AS mz, CAST(sd AS DOUBLE) / n AS md,
            sy / n AS my, szd, szy, sd FROM g),
        m AS (SELECT n, nd, mz, md,
            CAST(szd AS DOUBLE) / nd - mz * md AS czd,
            szy / nd - mz * my AS czy,
            mz - mz * mz AS vz,
            CAST(sd AS DOUBLE) - nd * md * md AS sdd FROM c),
        f AS (SELECT n, nd, czd, czy, vz, sdd,
            czd / vz AS fs, nd * vz AS szz, nd * czd AS szdc FROM m)
        SELECT n, ROUND(fs, 6) AS first_stage,
          ROUND(CASE WHEN sdd - fs * szdc > 0 THEN
            fs * fs / (((sdd - fs * szdc) / (nd - 2)) / szz) END, 6)
            AS first_stage_f,
          ROUND(CASE WHEN ABS(czd) > 0 THEN czy / czd END, 6)
            AS beta_iv
        FROM f"""

  /** Sharp regression discontinuity at a known cutoff: fit separate
    * local lines on each side of the cutoff within ±bandwidth (exact
    * decimal moments per side), and report the jump — the difference
    * of the two intercepts AT the cutoff. Running variable is
    * centered at the cutoff so the intercepts are directly the
    * boundary values. One aggregate with per-side conditional sums.
    * Returns one row: (n_left, n_right, left_at_cutoff 6dp,
    * right_at_cutoff 6dp, effect 6dp). */
  def rddSharp(df: DataFrame, runCol: String, yCol: String,
               cutoff: Double, bandwidth: Double): DataFrame = {
    val x0 = col(runCol).cast("double") - cutoff
    val y = col(yCol).cast(DecimalType(18, 2))
    val base = df.filter(col(runCol).isNotNull && col(yCol).isNotNull &&
        abs(x0) <= bandwidth)
      .select(x0.as("__x"), y.as("__y"), (x0 >= 0).as("__r"))
    def side(cond: org.apache.spark.sql.Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(cond, col("__x"))).as(s"__sx_$tag"),
      sum(when(cond, col("__y"))).cast("double").as(s"__sy_$tag"),
      sum(when(cond, col("__x") * col("__x"))).as(s"__sxx_$tag"),
      sum(when(cond, col("__x") * col("__y").cast("double")))
        .as(s"__sxy_$tag"))
    val aggs = side(!col("__r"), "l") ++ side(col("__r"), "r")
    val g = base.agg(aggs.head, aggs.tail: _*)
    def intercept(tag: String) = {
      val n = col(s"n_$tag").cast("double")
      val mx = col(s"__sx_$tag") / n
      val my = col(s"__sy_$tag") / n
      val b = (col(s"__sxy_$tag") - n * mx * my) /
        (col(s"__sxx_$tag") - n * mx * mx)
      my - b * mx
    }
    g.select(col("n_l").as("n_left"), col("n_r").as("n_right"),
      round(intercept("l"), 6).as("left_at_cutoff"),
      round(intercept("r"), 6).as("right_at_cutoff"),
      round(intercept("r") - intercept("l"), 6).as("effect"))
  }

  /** DuckDB twin of [[rddSharp]]; `srcCte` must yield (x, y). */
  def rddSharpOracleSql(srcCte: String, cutoff: Double,
                        bandwidth: Double): String =
    s"""WITH base AS (SELECT CAST(x AS DOUBLE) - $cutoff AS x,
            CAST(y AS DECIMAL(18,2)) AS y,
            (CAST(x AS DOUBLE) - $cutoff >= 0) AS r
          FROM ($srcCte) WHERE x IS NOT NULL AND y IS NOT NULL
            AND ABS(CAST(x AS DOUBLE) - $cutoff) <= $bandwidth),
        g AS (SELECT
            SUM(CASE WHEN NOT r THEN 1 ELSE 0 END) AS nl,
            SUM(CASE WHEN NOT r THEN x END) AS sxl,
            CAST(SUM(CASE WHEN NOT r THEN y END) AS DOUBLE) AS syl,
            SUM(CASE WHEN NOT r THEN x * x END) AS sxxl,
            SUM(CASE WHEN NOT r THEN x * CAST(y AS DOUBLE) END)
              AS sxyl,
            SUM(CASE WHEN r THEN 1 ELSE 0 END) AS nr,
            SUM(CASE WHEN r THEN x END) AS sxr,
            CAST(SUM(CASE WHEN r THEN y END) AS DOUBLE) AS syr,
            SUM(CASE WHEN r THEN x * x END) AS sxxr,
            SUM(CASE WHEN r THEN x * CAST(y AS DOUBLE) END) AS sxyr
          FROM base),
        c AS (SELECT nl, nr,
            syl / nl - ((sxyl - nl * (sxl / nl) * (syl / nl))
              / (sxxl - nl * (sxl / nl) * (sxl / nl))) * (sxl / nl)
              AS il,
            syr / nr - ((sxyr - nr * (sxr / nr) * (syr / nr))
              / (sxxr - nr * (sxr / nr) * (sxr / nr))) * (sxr / nr)
              AS ir
          FROM g)
        SELECT CAST(nl AS BIGINT) AS n_left,
          CAST(nr AS BIGINT) AS n_right,
          ROUND(il, 6) AS left_at_cutoff,
          ROUND(ir, 6) AS right_at_cutoff,
          ROUND(ir - il, 6) AS effect
        FROM c"""

  /** Intra-cluster correlation (one-way ANOVA estimator) + Kish
    * design effect DEFF = 1 + (m̄−1)·ICC — "how many effective
    * observations does a cluster-randomized design really have".
    * ICC = (MSB − MSW)/(MSB + (m̄−1)·MSW) with m̄ the mean cluster
    * size (the standard unequal-size adjustment m₀ =
    * (N − Σm²/N)/(k−1)). Exact decimal per-cluster moments → scalar
    * frame. Returns one row: (k, n, m0 6dp, icc 6dp, deff 6dp). */
  def iccDesignEffect(df: DataFrame, clusterCol: String,
                      valueCol: String): DataFrame = {
    val y = col(valueCol).cast(DecimalType(18, 2))
    val per = df.filter(col(valueCol).isNotNull)
      .groupBy(col(clusterCol).as("__c"))
      .agg(count(lit(1)).as("__m"),
        sum(y).cast("double").as("__s1"),
        sum(y * y).cast("double").as("__s2"))
    val g = per.agg(count(lit(1)).as("k"), sum("__m").as("n"),
      sum(col("__m") * col("__m")).as("__smm"),
      sum("__s1").as("__t1"), sum("__s2").as("__t2"),
      sum(col("__s1") * col("__s1") / col("__m").cast("double"))
        .as("__sb"))
    val kd = col("k").cast("double")
    val nd = col("n").cast("double")
    val m0 = (nd - col("__smm").cast("double") / nd) / (kd - 1)
    val ssb = col("__sb") - col("__t1") * col("__t1") / nd
    val ssw = col("__t2") - col("__sb")
    val msb = ssb / (kd - 1)
    val msw = ssw / (nd - kd)
    val icc = (msb - msw) / (msb + (m0 - 1) * msw)
    g.select(col("k"), col("n"), round(m0, 6).as("m0"),
      round(icc, 6).as("icc"),
      round(lit(1.0) + (m0 - 1) * icc, 6).as("deff"))
  }

  /** DuckDB twin of [[iccDesignEffect]]; `srcCte` yields (c, y). */
  def iccDesignEffectOracleSql(srcCte: String): String =
    s"""WITH src AS (SELECT c, CAST(y AS DECIMAL(18,2)) AS y
          FROM ($srcCte) WHERE y IS NOT NULL),
        per AS (SELECT c, COUNT(*) AS m,
            CAST(SUM(y) AS DOUBLE) AS s1,
            CAST(SUM(y * y) AS DOUBLE) AS s2
          FROM src GROUP BY c),
        g AS (SELECT COUNT(*) AS k, SUM(m) AS n,
            SUM(m * m) AS smm, SUM(s1) AS t1, SUM(s2) AS t2,
            SUM(s1 * s1 / CAST(m AS DOUBLE)) AS sb FROM per),
        c2 AS (SELECT k, n, CAST(k AS DOUBLE) AS kd,
            CAST(n AS DOUBLE) AS nd, smm, t1, t2, sb FROM g),
        c3 AS (SELECT k, n, kd, nd,
            (nd - CAST(smm AS DOUBLE) / nd) / (kd - 1) AS m0,
            (sb - t1 * t1 / nd) / (kd - 1) AS msb,
            (t2 - sb) / (nd - kd) AS msw FROM c2)
        SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
          ROUND(m0, 6) AS m0,
          ROUND((msb - msw) / (msb + (m0 - 1) * msw), 6) AS icc,
          ROUND(1.0 + (m0 - 1)
            * ((msb - msw) / (msb + (m0 - 1) * msw)), 6) AS deff
        FROM c3"""
}
