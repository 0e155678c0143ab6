package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UQ-model evaluation pack (reference: utils/model_utils.py:540-690
  * `uq_metrics`): interval coverage at 68/80/90/95%, median interval
  * widths, CRPS under the Gaussian assumption, the 95% interval score,
  * and the interval/confidence-to-error rank correlations.
  *
  * Interval bounds come from the UQ quantile columns when present
  * (`q_025`…`q_975`, with the reference's q_16/q_84 → q_10/q_90
  * fallback) and otherwise from Gaussian multiples of `prediction_std`.
  *
  * Scale shape: every coverage/mean is ONE aggregate pass; the five
  * medians ride a single ExactPercentiles aggregate each inside the
  * same pass; the two Spearman correlations share one stacked
  * spearmanByGroup pipeline (the bucket-partitioned rank kernel — no
  * global sort). Φ and φ for CRPS are plain column math: φ exactly,
  * Φ via the Abramowitz-Stegun 7.1.26 erf polynomial (|ε| < 1.5e-7 —
  * far below the 6-decimal reporting convention), keeping the whole
  * expression inside whole-stage codegen instead of a UDF.
  */
object UQMetrics {

  /** A&S 7.1.26 erf approximation as a Column expression. */
  private def erf(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val e = lit(1.0) - poly * exp(-ax * ax)
    when(x < 0, -e).otherwise(e)
  }
  private def phiCdf(z: Column): Column =
    (lit(1.0) + erf(z / math.sqrt(2.0))) / 2.0
  private def phiPdf(z: Column): Column =
    exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi)

  private def median(c: Column): Column =
    element_at(graft.functions.ExactPercentiles
      .exactPercentiles(c.cast("double"), Seq(0.5)), 1)

  /** One row of UQ quality metrics. Rows with null/NaN in any metric
    * input column are dropped first (the reference's poison guard); an
    * input with no valid rows yields the row with null metrics and
    * n_samples = 0 (the reference returns an empty dict there). */
  def uqMetrics(df: DataFrame, targetCol: String): DataFrame = {
    require(df.columns.contains(targetCol),
      s"Target column '$targetCol' not found in DataFrame")
    require(df.columns.contains("prediction"),
      "Prediction column 'prediction' not found in DataFrame")
    val hasQ = df.columns.contains("q_025") && df.columns.contains("q_975")
    require(hasQ || df.columns.contains("prediction_std"),
      "Either quantile columns (q_025, q_975, ...) or 'prediction_std' must be present")

    val candidates = Seq("prediction", "prediction_std", "confidence",
      targetCol, "q_025", "q_05", "q_10", "q_16", "q_25", "q_75", "q_84",
      "q_90", "q_95", "q_975").filter(df.columns.contains).distinct
    val clean = df.filter(candidates.map(c =>
      col(c).isNotNull && !isnan(col(c).cast("double"))).reduce(_ && _))

    val y = col(targetCol).cast("double")
    val pred = col("prediction").cast("double")
    val std = if (df.columns.contains("prediction_std"))
      col("prediction_std").cast("double") else lit(null).cast("double")

    val (lo95, hi95, lo90, hi90, lo80, hi80, lo68, hi68, lo50, hi50) =
      if (hasQ) (
        col("q_025"), col("q_975"), col("q_05"), col("q_95"),
        col("q_10"), col("q_90"),
        // fallback to the 80% interval like the reference's df.get
        (if (df.columns.contains("q_16")) col("q_16") else col("q_10")),
        (if (df.columns.contains("q_84")) col("q_84") else col("q_90")),
        col("q_25"), col("q_75"))
      else (
        pred - lit(1.96) * std, pred + lit(1.96) * std,
        pred - lit(1.645) * std, pred + lit(1.645) * std,
        pred - lit(1.282) * std, pred + lit(1.282) * std,
        pred - std, pred + std,
        pred - lit(0.674) * std, pred + lit(0.674) * std)

    def cov(lo: Column, hi: Column): Column =
      round(avg((y >= lo && y <= hi).cast("int")), 6)

    val z = (y - pred) / std
    val crps = std * (z * (lit(2.0) * phiCdf(z) - 1) +
      lit(2.0) * phiPdf(z) - lit(1.0 / math.sqrt(math.Pi)))
    val is95 = (hi95 - lo95) +
      lit(40.0) * (lo95 - y) * (y < lo95).cast("int") +
      lit(40.0) * (y - hi95) * (y > hi95).cast("int")

    // both rank correlations in ONE stacked pipeline
    val pairs = clean.select(lit("iw").as("__pair"),
        (hi68 - lo68).as("__a"), abs(y - pred).as("__b"))
      .unionByName(
        if (df.columns.contains("confidence"))
          clean.select(lit("conf").as("__pair"),
            col("confidence").cast("double").as("__a"), abs(y - pred).as("__b"))
        else clean.limit(0).select(lit("conf").as("__pair"),
          lit(0.0).as("__a"), lit(0.0).as("__b")))
    val corrs = Metrics.spearmanByGroup(pairs, "__pair", "__a", "__b")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else Double.box(r.getDouble(1)))).toMap

    val aggRow = clean.agg(
      cov(lo68, hi68).as("coverage_68"), cov(lo80, hi80).as("coverage_80"),
      cov(lo90, hi90).as("coverage_90"), cov(lo95, hi95).as("coverage_95"),
      round(median(std), 6).as("median_std"),
      round(median(hi50 - lo50), 6).as("median_width_50"),
      round(median(hi68 - lo68), 6).as("median_width_68"),
      round(median(hi80 - lo80), 6).as("median_width_80"),
      round(median(hi90 - lo90), 6).as("median_width_90"),
      round(median(hi95 - lo95), 6).as("median_width_95"),
      round(avg(crps), 6).as("crps"),
      round(avg(is95), 6).as("interval_score_95"),
      count(lit(1)).as("n_samples"))
    aggRow.withColumn("interval_to_error_corr",
        lit(corrs.getOrElse("iw", null)).cast("double"))
      .withColumn("confidence_to_error_corr",
        lit(corrs.getOrElse("conf", null)).cast("double"))
  }
}
