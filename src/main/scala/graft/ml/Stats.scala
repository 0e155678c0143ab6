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
}
