package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** UQ model v0: split-conformal prediction intervals + residual-aware
  * confidence, calibrated on out-of-fold predictions
  * (reference: src/workbench/algorithms/dataframe/uq_model_v0.py:61-363).
  *
  * Calibration (fit):
  *  1. nonconformity = |y − ŷ| / max(std, 1e-10); per confidence level α,
  *     scale factor q_α = exact quantile of the scores at
  *     min(⌈(n+1)α⌉/n, 1) — the split-conformal finite-sample adjustment
  *     (Lei et al. 2018).
  *  2. ŷ is cut into ≤10 quantile bins; within each bin an isotonic
  *     regression std → |residual| (global-fit fallback under 20 samples)
  *     gives the expected-residual curve. Isotonic fits use Spark MLlib's
  *     distributed PAVA, so calibration never materializes rows on the
  *     driver — only the pooled piecewise-linear thresholds come back.
  *  3. The 0..100 percentiles of expected residual on the calibration set
  *     back the percentile-rank confidence score.
  *
  * Inference (predict) is one narrow projection: interval columns are
  *  pure column arithmetic (codegen'd); expected residual + confidence
  *  interpolate the broadcast threshold curves in a JVM UDF (the curves
  *  are data-dependent-size arrays — as literals they would blow up
  *  codegen; as a broadcast lookup they are a per-row binary search).
  */
object UQ {

  val DefaultConfidenceLevels: Seq[Double] = Seq(0.50, 0.68, 0.80, 0.90, 0.95)
  val DefaultBins = 10
  val MinSamplesPerBin = 20L

  /** Interval column names per confidence level (uq_model_v0.py:47-55). */
  val QuantileColumns: Map[Double, (String, String)] = Map(
    0.50 -> ("q_25", "q_75"), 0.68 -> ("q_16", "q_84"),
    0.80 -> ("q_10", "q_90"), 0.90 -> ("q_05", "q_95"),
    0.95 -> ("q_025", "q_975"))

  /** Piecewise-linear isotonic curve (MLlib boundaries/predictions ==
    * sklearn X_thresholds_/y_thresholds_). */
  case class IsotonicCurve(x: Array[Double], y: Array[Double]) {
    /** np.interp semantics: clip outside the boundary range. */
    def interp(v: Double): Double = {
      if (x.isEmpty) return 0.0
      if (v <= x.head) return y.head
      if (v >= x.last) return y.last
      var i = java.util.Arrays.binarySearch(x, v)
      if (i >= 0) y(i)
      else {
        i = -i - 1 // insertion point; 0 < i < x.length here
        val t = (v - x(i - 1)) / (x(i) - x(i - 1))
        y(i - 1) + t * (y(i) - y(i - 1))
      }
    }
  }

  case class UQModelV0(
      confidenceLevels: Seq[Double],
      scaleFactors: Map[String, Double],
      binEdges: Array[Double],
      bins: Seq[IsotonicCurve],
      residualPercentiles: Array[Double]) extends Serializable {

    /** searchsorted(edges, pred, right) − 1, clipped to [0, nbins−1]. */
    private[ml] def binIndex(pred: Double): Int = {
      var i = java.util.Arrays.binarySearch(binEdges, pred)
      if (i >= 0) { // step right over any equal run (side="right")
        while (i < binEdges.length && binEdges(i) == pred) i += 1
      } else i = -i - 1
      math.min(math.max(i - 1, 0), bins.size - 1)
    }

    def expectedResidual(pred: Double, std: Double): Double =
      math.max(bins(binIndex(pred)).interp(std), 0.0)

    /** 1 − percentile-rank of the expected residual, clipped to [0,1]. */
    def confidence(expResidual: Double): Double = {
      var i = java.util.Arrays.binarySearch(residualPercentiles, expResidual)
      if (i >= 0) {
        while (i < residualPercentiles.length && residualPercentiles(i) == expResidual) i += 1
      } else i = -i - 1
      math.min(math.max(1.0 - i.toDouble / residualPercentiles.length, 0.0), 1.0)
    }

    /** Append UQ columns: expected_residual, confidence, q_50 = ŷ and the
      * interval bounds for every calibrated confidence level
      * (uq_model_v0.py:258-341). `df` keeps its id columns — the
      * reference's `query` index passthrough. */
    def predict(df: DataFrame, predCol: String, stdCol: String): DataFrame = {
      val model = this
      val cal = udf { (pred: Double, std: Double) =>
        val er = model.expectedResidual(pred, std)
        (er, model.confidence(er))
      }
      val safeStd = greatest(col(stdCol).cast("double"), lit(1e-10))
      val withCal = df
        .withColumn("__uq", cal(col(predCol).cast("double"), col(stdCol).cast("double")))
        .withColumn("expected_residual", col("__uq._1"))
        .withColumn("confidence", col("__uq._2"))
        .drop("__uq")
        .withColumn("q_50", col(predCol).cast("double"))
      confidenceLevels.filter(QuantileColumns.contains).foldLeft(withCal) { (d, a) =>
        val q = scaleFactors(f"$a%.2f")
        val (lo, hi) = QuantileColumns(a)
        d.withColumn(lo, col(predCol).cast("double") - lit(q) * safeStd)
          .withColumn(hi, col(predCol).cast("double") + lit(q) * safeStd)
      }
    }

    /** Persist as a one-row parquet table (the Spark-native analogue of
      * the reference's uq_metadata_v0.json). */
    def save(spark: SparkSession, dir: String): Unit = {
      import spark.implicits._
      Seq((confidenceLevels, scaleFactors.toSeq.sortBy(_._1), binEdges.toSeq,
        bins.map(c => (c.x.toSeq, c.y.toSeq)), residualPercentiles.toSeq))
        .toDF("confidence_levels", "scale_factors", "bin_edges", "bins",
          "residual_percentiles")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
  }

  /** Fit on out-of-fold columns of `df` (uq_model_v0.py:180-256). */
  def fit(df: DataFrame, yCol: String, predCol: String, stdCol: String,
          confidenceLevels: Seq[Double] = DefaultConfidenceLevels,
          nBins: Int = DefaultBins): UQModelV0 = {
    val y = col(yCol).cast("double")
    val yp = col(predCol).cast("double")
    val std = col(stdCol).cast("double")
    val base = df.select(y.as("y"), yp.as("yp"), std.as("std"))
      .filter(col("y").isNotNull && col("yp").isNotNull && col("std").isNotNull)
      .withColumn("abs_res", abs(col("y") - col("yp")))
      .withColumn("score", col("abs_res") / greatest(col("std"), lit(1e-10)))
      .cache()
    val n = base.count()
    require(n > 0, "UQ.fit needs a non-empty calibration set")

    // split-conformal scale factors: one exact-percentile aggregate for
    // all levels (finite-sample adjusted quantiles)
    val adjusted = confidenceLevels.map(a => math.min(math.ceil((n + 1) * a) / n, 1.0))
    val qRow = base.select(graft.functions.ExactPercentiles
      .exactPercentiles(col("score"), adjusted).as("q")).head()
    val scaleFactors = confidenceLevels.zip(qRow.getSeq[Double](0))
      .map { case (a, q) => f"$a%.2f" -> q }.toMap

    // quantile bin edges over ŷ: linspace percentiles, dedup, ±1e-6 pads
    // (uq_model_v0.py:83-90)
    val probs = (0 to nBins).map(_.toDouble / nBins)
    val rawEdges = base.select(graft.functions.ExactPercentiles
      .exactPercentiles(col("yp"), probs).as("e")).head().getSeq[Double](0)
    val distinctEdges = rawEdges.distinct.sorted
    val unique =
      if (distinctEdges.length < 2) // constant ŷ → one bin around the value
        Array(distinctEdges.head - 1e-6, distinctEdges.head + 1e-6)
      else {
        val a = distinctEdges.toArray
        a(0) -= 1e-6; a(a.length - 1) += 1e-6; a
      }

    // per-bin isotonic std → |residual| with global fallback (<20 rows);
    // nested when-chain must be built right-associatively (otherwise()
    // applies once per chain)
    val binExpr = unique.init.indices.map { i =>
      when(col("yp") >= unique(i) && col("yp") < unique(i + 1), i)
    }.reduceRight((a, b) => a.otherwise(b))
    val binned = base.withColumn("bin", binExpr).cache()
    val counts = binned.groupBy("bin").count().collect()
      .collect { case r if !r.isNullAt(0) => r.getInt(0) -> r.getLong(1) }.toMap
    val globalCurve = fitIsotonic(binned)
    val curves = unique.init.indices.map { i =>
      if (counts.getOrElse(i, 0L) < MinSamplesPerBin) globalCurve
      else fitIsotonic(binned.filter(col("bin") === i))
    }

    // expected residual on the calibration set → 0..100 percentile table
    val model0 = UQModelV0(confidenceLevels, scaleFactors, unique, curves,
      Array.empty[Double])
    val erUdf = udf((p: Double, s: Double) => model0.expectedResidual(p, s))
    val pcts = binned.select(graft.functions.ExactPercentiles
      .exactPercentiles(erUdf(col("yp"), col("std")), (0 to 100).map(_ / 100.0))
      .as("p")).head().getSeq[Double](0).toArray
    base.unpersist(); binned.unpersist()
    model0.copy(residualPercentiles = pcts)
  }

  /** Distributed PAVA via MLlib; returns the pooled thresholds. */
  private def fitIsotonic(df: DataFrame): IsotonicCurve = {
    val m = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("std").setLabelCol("abs_res")
      .fit(df.select(col("std"), col("abs_res")))
    // y_min = 0 clamp like sklearn IsotonicRegression(y_min=0)
    IsotonicCurve(m.boundaries.toArray, m.predictions.toArray.map(math.max(_, 0.0)))
  }

  /** Load a model saved by [[UQModelV0.save]]. */
  def load(spark: SparkSession, dir: String): UQModelV0 = {
    val r: Row = spark.read.parquet(dir).head()
    UQModelV0(
      r.getSeq[Double](r.fieldIndex("confidence_levels")),
      r.getSeq[Row](r.fieldIndex("scale_factors"))
        .map(p => p.getString(0) -> p.getDouble(1)).toMap,
      r.getSeq[Double](r.fieldIndex("bin_edges")).toArray,
      r.getSeq[Row](r.fieldIndex("bins"))
        .map(b => IsotonicCurve(b.getSeq[Double](0).toArray, b.getSeq[Double](1).toArray)),
      r.getSeq[Double](r.fieldIndex("residual_percentiles")).toArray)
  }
}
