package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analysis statistics: the A/B read-out (Welch's t) and the
  * Kaplan–Meier survival estimator — closed-form over aggregates, no
  * iteration, no sampling.
  */
object Stats {

  /** Welch's two-sample t-test between the groups of a binary
    * `groupCol` (values 'a'/'b' — caller names them). One row:
    * (n_a, n_b, mean_a, mean_b, diff, se, t_stat, df) all 6dp —
    * df by Welch–Satterthwaite. ONE aggregate over the corpus.
    */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             groupA: String, groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val isA = col(groupCol) === groupA
    val isB = col(groupCol) === groupB
    val agg = df.filter(isA || isB).agg(
      count(when(isA, 1)).as("n_a"), count(when(isB, 1)).as("n_b"),
      avg(when(isA, v)).as("__ma"), avg(when(isB, v)).as("__mb"),
      var_samp(when(isA, v)).as("__va"), var_samp(when(isB, v)).as("__vb"))
    val sa = col("__va") / col("n_a")
    val sb = col("__vb") / col("n_b")
    val se = sqrt(sa + sb)
    val dfW = pow(sa + sb, 2) /
      (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))
    agg.select(col("n_a"), col("n_b"),
      round(col("__ma"), 6).as("mean_a"), round(col("__mb"), 6).as("mean_b"),
      round(col("__ma") - col("__mb"), 6).as("diff"),
      round(se, 6).as("se"),
      round((col("__ma") - col("__mb")) / se, 6).as("t_stat"),
      round(dfW, 6).as("df"))
  }

  /** Rolling-origin (time-series) cross-validation fold table: k folds
    * where fold i trains on everything BEFORE cut_i and validates on
    * [cut_i, cut_{i+1}) — the leakage-free CV for temporal data (the
    * hashed-fold CrossFold would let the future train the past). Cuts
    * are the exact i/(k+1) percentiles of event-time micros — ONE
    * percentile aggregate, then k metadata-sized count aggregates.
    * Returns (fold, train_end_us, valid_end_us, n_train, n_valid).
    */
  def rollingOriginFolds(df: DataFrame, tsCol: String, k: Int): DataFrame = {
    require(k >= 1)
    val ev = graft.core.Tables.ltzTs(df, tsCol)
    val us = unix_micros(col(tsCol))
    val ps = (1 to (k + 1)).map(_.toDouble / (k + 1))
    val spark0 = df.sparkSession
    val cutRow = ev.agg(graft.functions.ExactPercentiles.exactPercentiles(
      us.cast("double"), ps)).head()
    if (cutRow.isNullAt(0)) // no events: zero folds, not an NPE
      return spark0.range(0).select(lit(0).as("fold"),
        lit(0L).as("train_end_us"), lit(0L).as("valid_end_us"),
        lit(0L).as("n_train"), lit(0L).as("n_valid"))
    val cuts = cutRow.getSeq[Double](0).map(_.toLong)
    // ONE conditional-aggregate pass for every fold's counts — k
    // separate scans would re-read the corpus k times at 100 TB
    val aggs = (0 until k).flatMap { i =>
      Seq(sum(when(us < cuts(i), 1L).otherwise(0L)).as(s"__tr$i"),
        sum(when(us >= cuts(i) && us < cuts(i + 1), 1L).otherwise(0L))
          .as(s"__va$i"))
    }
    val c = ev.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    (0 until k).map(i =>
      (i, cuts(i), cuts(i + 1), c.getLong(2 * i), c.getLong(2 * i + 1)))
      .toDF("fold", "train_end_us", "valid_end_us", "n_train", "n_valid")
  }

  /** UCB1 arm ranking (Auer et al. 2002): per arm the mean reward plus
    * the √(2·ln N / n) exploration bonus, ranked best-first — the
    * deterministic bandit read-out (Thompson sampling would need an
    * RNG and break the oracle). One groupBy to arm cardinality, then a
    * metadata window for the rank. Returns
    * (arm, n, mean_reward, ucb, rank). */
  def ucbAllocation(df: DataFrame, armCol: String,
                    rewardCol: String): DataFrame = {
    val arms = df.filter(col(rewardCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), avg(col(rewardCol)).as("__m"))
    val total = arms.agg(sum("n").as("__nt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ucb").desc, col("arm"))
    arms.crossJoin(broadcast(total))
      .select(col("arm"), col("n"), round(col("__m"), 6).as("mean_reward"),
        round(col("__m") + sqrt(lit(2.0) * log(col("__nt")) / col("n")), 6)
          .as("ucb"))
      .withColumn("rank", row_number().over(w))
  }

  /** Purged rolling-origin folds: [[rollingOriginFolds]] plus an
    * EMBARGO gap — training data within `embargoUs` microseconds
    * before each fold's validation window is dropped (de Prado's
    * purged CV: rows whose labels/feature windows straddle the cut
    * would leak the validation period into training). Same single-pass
    * shape: one percentile aggregate for cuts, one conditional
    * aggregate for every fold's counts. Returns (fold, train_end_us,
    * valid_end_us, n_train, n_embargoed, n_valid). */
  def purgedRollingFolds(df: DataFrame, tsCol: String, k: Int,
                         embargoUs: Long): DataFrame = {
    require(k >= 1 && embargoUs >= 0)
    val ev = graft.core.Tables.ltzTs(df, tsCol)
    val us = unix_micros(col(tsCol))
    val ps = (1 to (k + 1)).map(_.toDouble / (k + 1))
    val spark = df.sparkSession
    import spark.implicits._
    val cutRow = ev.agg(graft.functions.ExactPercentiles.exactPercentiles(
      us.cast("double"), ps)).head()
    if (cutRow.isNullAt(0))
      return spark.range(0).select(lit(0).as("fold"),
        lit(0L).as("train_end_us"), lit(0L).as("valid_end_us"),
        lit(0L).as("n_train"), lit(0L).as("n_embargoed"),
        lit(0L).as("n_valid"))
    val cuts = cutRow.getSeq[Double](0).map(_.toLong)
    val aggs = (0 until k).flatMap { i =>
      Seq(
        sum(when(us < cuts(i) - embargoUs, 1L).otherwise(0L)).as(s"__tr$i"),
        sum(when(us >= cuts(i) - embargoUs && us < cuts(i), 1L)
          .otherwise(0L)).as(s"__em$i"),
        sum(when(us >= cuts(i) && us < cuts(i + 1), 1L).otherwise(0L))
          .as(s"__va$i"))
    }
    val c = ev.agg(aggs.head, aggs.tail: _*).head()
    (0 until k).map(i =>
      (i, cuts(i), cuts(i + 1), c.getLong(3 * i), c.getLong(3 * i + 1),
        c.getLong(3 * i + 2)))
      .toDF("fold", "train_end_us", "valid_end_us", "n_train",
        "n_embargoed", "n_valid")
  }

  /** Calibration (reliability) bins for a probability column against a
    * 0/1 label: per equal-width bin — (bin, n, mean_pred 6dp,
    * frac_pos 6dp). The ECE summand |mean_pred − frac_pos|·n/N is the
    * caller's one-liner. Right-open bins, p = 1 lands in the last bin.
    */
  def calibrationBins(df: DataFrame, probCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 1)
    val p = col(probCol).cast("double")
    val b = least(floor(p * bins).cast("int"), lit(bins - 1))
    df.filter(p.isNotNull && p >= 0 && p <= 1)
      .groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(p), 6).as("mean_pred"),
        round(avg(when(col(labelCol) === 1, 1.0).otherwise(0.0)), 6)
          .as("frac_pos"))
  }

  /** Kaplan–Meier survival curve over (duration, event) pairs — event
    * 1 = observed, 0 = right-censored. One row per distinct OBSERVED
    * duration t: (t, n_at_risk, n_events, survival 6dp) with
    *   S(t) = Π_{t_i ≤ t} (1 − d_i / r_i)
    * computed as exp(Σ ln(1 − d/r)) — a cumulative-sum window over the
    * DISTINCT-duration table (cohort-cardinality, not the corpus; the
    * corpus collapses in one groupBy).
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val d = col(durationCol).cast("double")
    val byT = df.groupBy(d.as("t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_events"))
    val w = Window.orderBy(desc("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = byT.withColumn("n_at_risk", sum("__n").over(w))
    val wcum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exp-sum-log needs a zero guard: the last at-risk group dying gives
    // factor 0, where Spark's log() returns NULL but DuckDB's ln() gives
    // −inf — survival is pinned to 0 from the first zero factor instead
    val factor = lit(1.0) - col("n_events") / col("n_at_risk")
    val zeros = sum(when(factor <= 0, 1).otherwise(0)).over(wcum)
    atRisk.filter(col("n_events") > 0)
      .withColumn("survival",
        when(zeros > 0, lit(0.0)).otherwise(
          round(exp(sum(when(factor > 0, log(factor))).over(wcum)), 6)))
      .select(col("t"), col("n_at_risk"), col("n_events"), col("survival"))
  }

  /** Nelson-Aalen cumulative-hazard estimator over the same
    * (duration, event) life table as [[kaplanMeier]]:
    * H(t) = Σ_{s≤t} d_s/n_s with the standard variance estimator
    * Σ d_s/n_s² and the Fleming-Harrington survival exp(−H) — the
    * hazard-space twin of KM (numerically steadier when risk sets get
    * small, and the estimator additive-mergeable across strata).
    * Same scale shape: one duration groupBy collapses the cohort, all
    * windows ride the #distinct-durations frame. Returns
    * (t, n_at_risk, n_events, cum_hazard, var_hazard, na_survival)
    * floats 6dp. */
  def nelsonAalen(df: DataFrame, durationCol: String,
                  eventCol: String): DataFrame = {
    val d = col(durationCol).cast("double")
    val byT = df.groupBy(d.as("t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("n_events"))
    val w = Window.orderBy(desc("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val atRisk = byT.withColumn("n_at_risk", sum("__n").over(w))
    val wcum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inc = col("n_events").cast("double") / col("n_at_risk")
    atRisk.filter(col("n_events") > 0)
      .withColumn("cum_hazard", sum(inc).over(wcum))
      .withColumn("var_hazard",
        round(sum(col("n_events").cast("double") /
          (col("n_at_risk") * col("n_at_risk"))).over(wcum), 6))
      .select(col("t"), col("n_at_risk"), col("n_events"),
        round(col("cum_hazard"), 6).as("cum_hazard"), col("var_hazard"),
        round(exp(-col("cum_hazard")), 6).as("na_survival"))
  }

  /** Two-group log-rank test over the same (duration, event) life table
    * as [[kaplanMeier]] — "are these two survival curves the same?", the
    * standard follow-up once q183/q265 draw them. At each pooled event
    * time t: O_g observed events in group g, E_g = d·n_g/n expected
    * under H0, hypergeometric variance v = d·(n_g/n)·(1−n_g/n)·(n−d)/(n−1);
    * χ² = (ΣO_g − ΣE_g)²/Σv (identical for both groups).
    *
    * Scale shape: ONE (group, duration) groupBy collapses the cohort;
    * everything after rides the distinct-durations × 2 grid (the
    * at-risk counts are desc-cumulative window sums per group, the
    * pooled totals a partition-by-t window) — no join back to the
    * corpus. Returns one row per group:
    * (grp, n_subjects, observed, expected 6dp, chi2_logrank 6dp).
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
              groupCol: String): DataFrame = {
    val d = col(durationCol).cast("double")
    val byGT = df.groupBy(col(groupCol).as("grp"), d.as("t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("__d"))
    val groups = byGT.select("grp").distinct()
    val times = byGT.select("t").distinct()
    // grid: every (group × distinct duration) so the desc cumsum sees
    // the FULL risk set even at times where a group had no subjects
    val grid = times.crossJoin(groups)
      .join(byGT, Seq("grp", "t"), "left")
      .na.fill(0L, Seq("__n", "__d"))
    val wRisk = Window.partitionBy("grp").orderBy(desc("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wT = Window.partitionBy("t")
    val pooled = grid
      .withColumn("n_g", sum("__n").over(wRisk))
      .withColumn("n_tot", sum(col("n_g")).over(wT))
      .withColumn("d_tot", sum("__d").over(wT))
    val share = col("n_g").cast("double") / col("n_tot")
    val terms = pooled.filter(col("d_tot") > 0)
      .withColumn("__e", col("d_tot") * share)
      .withColumn("__v",
        when(col("n_tot") > 1,
          col("d_tot") * share * (lit(1.0) - share) *
            (col("n_tot") - col("d_tot")).cast("double") /
            (col("n_tot") - 1)).otherwise(lit(0.0)))
    val sizes = grid.groupBy("grp").agg(sum("__n").as("n_subjects"))
    val perGroup = terms.groupBy("grp").agg(
      sum("__d").as("observed"),
      sum("__e").as("__E"),
      sum("__v").as("__V"))
      .join(sizes, Seq("grp")) // 2-row frames; broadcast either way
    perGroup.select(col("grp"), col("n_subjects"), col("observed"),
      round(col("__E"), 6).as("expected"),
      round(when(col("__V") > 0,
          (col("observed") - col("__E")) * (col("observed") - col("__E")) /
            col("__V")).otherwise(lit(0.0)), 6).as("chi2_logrank"))
  }

  /** Empirical-Bayes shrinkage of per-group event RATES under a
    * beta-binomial model (Robbins '56 / the baseball-batting-average
    * classic): fit Beta(α, β) to the observed per-group raw rates by
    * method of moments — m = mean(raw), v = population variance;
    * α+β = m(1−m)/v − 1 — then post the posterior mean
    * (x + α)/(n + α + β) per group. Low-n groups pull hard toward the
    * corpus rate, high-n groups barely move: the principled fix for
    * "this source looks great on 12 documents" quality rankings, and
    * the rate-space sibling of the mean-space shrink inside
    * `ml/Encoders` target encoding (there the strength is a fixed
    * hyperparameter; here the data chooses it).
    *
    * Scale shape: one map-combinable groupBy collapses the corpus to
    * the #groups frame; the MoM prior is a second aggregate over THAT
    * frame, broadcast back via crossJoin. When MoM is degenerate
    * (v = 0, or v ≥ m(1−m), or m ∈ {0,1}) the prior is undefined —
    * alpha/beta emit null and shrunk_rate = raw_rate. Returns one row
    * per group: (grp, n, x, raw_rate, shrunk_rate, alpha, beta) 6dp,
    * alpha/beta repeated. */
  def ebRates(df: DataFrame, groupCol: String, successCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).as("n"),
      sum(when(col(successCol) === 1, 1L).otherwise(0L)).as("x"))
      .withColumn("__raw", col("x").cast("double") / col("n"))
    val prior = g.agg(avg("__raw").as("__m"),
      (avg(col("__raw") * col("__raw")) - avg("__raw") * avg("__raw"))
        .as("__v"))
    val s = when(col("__v") > 0 &&
        col("__v") < col("__m") * (lit(1.0) - col("__m")),
      col("__m") * (lit(1.0) - col("__m")) / col("__v") - 1.0)
    g.crossJoin(prior)
      .withColumn("__s", s)
      .select(col("grp"), col("n"), col("x"),
        round(col("__raw"), 6).as("raw_rate"),
        round(coalesce(
          (col("x") + col("__m") * col("__s")) / (col("n") + col("__s")),
          col("__raw")), 6).as("shrunk_rate"),
        round(col("__m") * col("__s"), 6).as("alpha"),
        round((lit(1.0) - col("__m")) * col("__s"), 6).as("beta"))
  }

  /** DuckDB twin of [[ebRates]]; `unitsCte` must yield
    * (grp, success). */
  def ebRatesOracleSql(unitsCte: String): String =
    s"""WITH units AS ($unitsCte),
        g AS (SELECT grp, COUNT(*) AS n,
            SUM(CASE WHEN success = 1 THEN 1 ELSE 0 END) AS x,
            CAST(SUM(CASE WHEN success = 1 THEN 1 ELSE 0 END) AS DOUBLE)
              / COUNT(*) AS raw
          FROM units GROUP BY grp),
        pr AS (SELECT AVG(raw) AS m,
            AVG(raw * raw) - AVG(raw) * AVG(raw) AS v
          FROM g),
        ps AS (SELECT m, v,
            CASE WHEN v > 0 AND v < m * (1 - m)
              THEN m * (1 - m) / v - 1 END AS s
          FROM pr)
        SELECT g.grp, g.n, CAST(g.x AS BIGINT) AS x,
          ROUND(g.raw, 6) AS raw_rate,
          ROUND(COALESCE((g.x + ps.m * ps.s) / (g.n + ps.s), g.raw), 6)
            AS shrunk_rate,
          ROUND(ps.m * ps.s, 6) AS alpha,
          ROUND((1 - ps.m) * ps.s, 6) AS beta
        FROM g CROSS JOIN ps"""

  /** DuckDB twin of [[logRank]]; `lifeCte` must yield
    * (grp, duration, event). */
  def logRankOracleSql(lifeCte: String): String =
    s"""WITH life AS ($lifeCte),
        bygt AS (SELECT grp, CAST(duration AS DOUBLE) AS t,
            COUNT(*) AS n,
            SUM(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS d
          FROM life GROUP BY 1, 2),
        grid AS (SELECT g.grp, ts.t, COALESCE(b.n, 0) AS n,
            COALESCE(b.d, 0) AS d
          FROM (SELECT DISTINCT t FROM bygt) ts
          CROSS JOIN (SELECT DISTINCT grp FROM bygt) g
          LEFT JOIN bygt b ON b.grp = g.grp AND b.t = ts.t),
        risk AS (SELECT grp, t, n, d,
            SUM(n) OVER (PARTITION BY grp ORDER BY t DESC) AS n_g
          FROM grid),
        pooled AS (SELECT grp, t, n, d, n_g,
            SUM(n_g) OVER (PARTITION BY t) AS n_tot,
            SUM(d) OVER (PARTITION BY t) AS d_tot
          FROM risk),
        terms AS (SELECT grp, n, d,
            d_tot * (CAST(n_g AS DOUBLE) / n_tot) AS e,
            CASE WHEN n_tot > 1 THEN
              d_tot * (CAST(n_g AS DOUBLE) / n_tot) *
                (1 - CAST(n_g AS DOUBLE) / n_tot) *
                CAST(n_tot - d_tot AS DOUBLE) / (n_tot - 1)
              ELSE 0 END AS v
          FROM pooled WHERE d_tot > 0),
        sizes AS (SELECT grp, CAST(SUM(n) AS BIGINT) AS n_subjects
          FROM grid GROUP BY grp),
        per AS (SELECT grp,
            CAST(SUM(d) AS BIGINT) AS observed,
            SUM(e) AS ee, SUM(v) AS vv
          FROM terms GROUP BY grp)
        SELECT per.grp, n_subjects, observed, ROUND(ee, 6) AS expected,
          ROUND(CASE WHEN vv > 0
            THEN (observed - ee) * (observed - ee) / vv
            ELSE 0 END, 6) AS chi2_logrank
        FROM per JOIN sizes ON per.grp = sizes.grp"""
}
