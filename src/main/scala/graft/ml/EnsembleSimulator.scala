package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Offline ensemble-strategy evaluation over aligned per-model
  * out-of-fold predictions (utils/ensemble_simulator.py:19-460) —
  * answers "would an ensemble of these models beat the best single
  * model, and with which aggregation strategy?" before deploying a
  * meta-endpoint.
  *
  * The reference loads each model's `full_cross_fold` capture into
  * pandas, intersects ids, and does numpy column math. Here alignment
  * is ONE M-way inner join on the id column into a wide frame (M is
  * the model count — small by construction), persisted once because
  * every analysis method re-scans it; all strategy math happens in
  * single aggregate passes over that frame. Per-model scalars (MAE,
  * confidence-to-error Spearman) are metadata-sized aggregates
  * collected to the driver and re-entered as literals, mirroring how
  * the reference carries them as numpy scalars.
  */
class EnsembleSimulator private (val wide: DataFrame,
                                 val modelNames: Seq[String]) {
  private val m = modelNames.size
  private def p(i: Int) = col(s"__p$i")
  private def c(i: Int) = col(s"__c$i")
  private val t = col("__t")

  /** Null-safe scalar read: an empty aligned frame or a zero-variance
    * r² aggregates to null — surface NaN like the pandas math would. */
  private def dbl(row: Row, i: Int): Double =
    if (row.isNullAt(i)) Double.NaN else row.getDouble(i)

  /** Per-model MAE on the aligned rows (one aggregate pass). */
  lazy val maeScores: Seq[Double] = {
    val row = wide.agg(
      avg(abs(p(0) - t)).as("m0"),
      (1 until m).map(i => avg(abs(p(i) - t)).as(s"m$i")): _*).head()
    (0 until m).map(dbl(row, _))
  }

  /** One spearmanByGroup pipeline over a stacked (model-index, a, b)
    * frame instead of one full rank job-set per model; absent/null
    * groups (constant column, all-NaN pair) map to the default. */
  private def stackedSpearman(pairs: Int => (Column, Column),
                              default: Double): Seq[Double] = {
    val stacked = (0 until m).map { i =>
      val (a, b) = pairs(i)
      wide.select(lit(i.toString).as("__pair"), a.as("__a"), b.as("__b"))
    }.reduce(_ unionByName _)
    val got = Metrics.spearmanByGroup(stacked, "__pair", "__a", "__b")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) default else r.getDouble(1))).toMap
    (0 until m).map(i => got.getOrElse(i.toString, default))
  }

  /** Spearman(confidence, |residual|) per model — how well each model's
    * confidence predicts its own error (ensemble_simulator.py:80-83).
    * Models aligned without a real confidence column (constant 1.0)
    * get a null Spearman, reported as 0.0 like the reference. */
  lazy val confErrorCorr: Seq[Double] =
    stackedSpearman(i => (c(i), abs(p(i) - t)), default = 0.0)

  private def invMaeWeights: Seq[Double] = {
    val inv = maeScores.map(1.0 / _)
    inv.map(_ / inv.sum)
  }

  /** Per-model performance table: rmse, mae, r2, Spearman(target,
    * pred), mean confidence, confidence-to-error Spearman
    * (ensemble_simulator.py:307-342). One aggregate pass plus the
    * rank-correlation jobs; pass `withRankCorrelations = false` to skip
    * the two rank pipelines entirely (spearman / conf_err_corr columns
    * come back NaN) when only the plain aggregates are needed. */
  def modelPerformance(withRankCorrelations: Boolean = true): DataFrame = {
    val aggs = (0 until m).flatMap { i =>
      val err = p(i) - t
      Seq(sqrt(avg(err * err)).as(s"rmse$i"),
        avg(abs(err)).as(s"mae$i"),
        (lit(1.0) - try_divide(sum(err * err),
          sum(t * t) - count(lit(1)) * avg(t) * avg(t))).as(s"r2$i"),
        avg(c(i)).as(s"mc$i"))
    }
    val row = wide.agg(aggs.head, aggs.tail: _*).head()
    val spearmans =
      if (withRankCorrelations) stackedSpearman(i => (t, p(i)), default = Double.NaN)
      else Seq.fill(m)(Double.NaN)
    val confCorrs =
      if (withRankCorrelations) confErrorCorr else Seq.fill(m)(Double.NaN)
    val rows = modelNames.zipWithIndex.map { case (name, i) =>
      Row(name, r6(dbl(row, i * 4)), r6(dbl(row, i * 4 + 1)),
        r6(dbl(row, i * 4 + 2)), spearmans(i),
        r6(dbl(row, i * 4 + 3)), r6(confCorrs(i)))
    }
    smallFrame(rows, Seq("model", "rmse", "mae", "r2", "spearman",
      "mean_conf", "conf_err_corr"))
  }

  /** Suggested static ensemble weights from inverse MAE
    * (ensemble_simulator.py:344-366). */
  def ensembleWeights(): DataFrame = {
    val w = invMaeWeights
    smallFrame(
      modelNames.zipWithIndex.map { case (name, i) =>
        Row(name, r6(w(i)), r6(maeScores(i)))
      },
      Seq("model", "weight", "mae"))
  }

  /** MAE of the seven reference strategies, best first
    * (ensemble_simulator.py:368-456). All seven are row-wise
    * arithmetic over the wide frame → ONE aggregate pass; per-model
    * weights/scales enter as literals. */
  def strategyComparison(): DataFrame = {
    val w = invMaeWeights
    val corrScale = confErrorCorr.map(math.abs)
    val bestIdx = maeScores.zipWithIndex.minBy(_._1)._2
    val worstIdx = maeScores.zipWithIndex.maxBy(_._1)._2
    val remaining = (0 until m).filterNot(_ == worstIdx)

    def sumOf(f: Int => Column) = (0 until m).map(f).reduce(_ + _)
    val meanPred = sumOf(p) / m
    def weighted(kernel: Int => Column): Column = {
      val ks = sumOf(kernel)
      when(ks < 1e-12, sumOf(i => p(i) * w(i)))
        .otherwise(sumOf(i => p(i) * kernel(i)) / (ks + lit(1e-12)))
    }
    val dropWorst =
      if (remaining.isEmpty) p(worstIdx) // single model: nothing to drop
      else if (remaining.size == 1) p(remaining.head)
      else remaining.map(p).reduce(_ + _) / remaining.size

    val strategies = Seq(
      "Simple Mean" -> meanPred,
      "Confidence-Weighted" -> weighted(c),
      "Inverse-MAE Weighted" -> sumOf(i => p(i) * w(i)),
      s"Best Model Only (${modelNames(bestIdx)})" -> p(bestIdx),
      "Scaled Conf-Weighted" -> weighted(i => c(i) * w(i)),
      "Calibrated Conf-Weighted" -> weighted(i => c(i) * corrScale(i)),
      s"Drop Worst (${modelNames(worstIdx)})" -> dropWorst)

    val row = wide.agg(
      avg(abs(strategies.head._2 - t)).as("s0"),
      strategies.tail.zipWithIndex.map { case ((_, pred), i) =>
        avg(abs(pred - t)).as(s"s${i + 1}")
      }: _*).head()
    val rows = strategies.zipWithIndex
      .map { case ((name, _), i) => (name, r6(dbl(row, i))) }
      .sortBy(_._2) // ascending MAE, stable on ties like pandas sort_values
      .map { case (name, mae) => Row(name, mae) }
    smallFrame(rows, Seq("strategy", "mae"))
  }

  /** Pearson correlation matrix of per-model residuals, long form
    * (ensemble_simulator.py:235-260) — low correlation means the
    * models make DIFFERENT errors, i.e. ensemble headroom. Reuses the
    * single-pass CorrMatrix typed aggregate. */
  def residualCorrelations(): DataFrame =
    graft.eda.Eda.correlations(
      wide.select(modelNames.zipWithIndex.map { case (name, i) =>
        (p(i) - t).as(name)
      }.toIndexedSeq: _*),
      modelNames)

  /** Where the models disagree and whether disagreement predicts
    * ensemble error (ensemble_simulator.py:261-305): per-row SAMPLE
    * std across model predictions (pandas ddof=1), its mean/median/
    * max, and Spearman(disagreement, |ensemble residual|). */
  def modelAgreement(): DataFrame = {
    val meanPred = (0 until m).map(p).reduce(_ + _) / m
    // sample std via the sum-of-squares identity; single-model input
    // (m=1) yields null like pandas' ddof=1 NaN
    val std = sqrt(try_divide(
      (0 until m).map(i => p(i) * p(i)).reduce(_ + _) - lit(m) * meanPred * meanPred,
      lit(m - 1.0)))
    val base = wide.select(std.as("__std"),
      abs(meanPred - t).as("__ens_abs_res"))
    val corrDf = Metrics.spearman(base, "__std", "__ens_abs_res")
      .select(col("spearman").as("disagreement_error_corr"))
    base.agg(
      round(avg("__std"), 6).as("mean_disagreement"),
      round(element_at(graft.functions.ExactPercentiles
        .exactPercentiles(col("__std").cast("double"), Seq(0.5)), 1), 6)
        .as("median_disagreement"),
      round(max("__std"), 6).as("max_disagreement"))
      .crossJoin(corrDf) // both one-row frames
  }

  /** Aggregated predictions of a named strategy over the aligned frame
    * — the simulator's `reproduce_deployed` (ensemble_simulator.py:
    * 86-174): identical math to the deployed DAG's aggregation node,
    * so offline and DAG results compare 1:1. Returns (id, target,
    * prediction, prediction_std, confidence). */
  def reproduceDeployed(node: Ensemble.AggNode): DataFrame = {
    val upstream = (0 until m).map { i =>
      wide.select(col("__id"), t.as("target"),
        p(i).as("prediction"), c(i).as("confidence"))
    }
    node.apply(upstream, "__id").withColumnRenamed("__id", "id")
  }

  def release(): Unit = { wide.unpersist(); () }

  private def r6(x: Double): Double =
    if (x.isNaN) x else Metrics.round6(x)

  private def smallFrame(rows: Seq[Row], names: Seq[String]): DataFrame = {
    val fields = names.map(n =>
      StructField(n, if (n == "model" || n == "strategy") StringType else DoubleType))
    wide.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
      StructType(fields))
  }
}

object EnsembleSimulator {
  /** Align per-model prediction frames on `idColumn` (inner join =
    * the reference's common-id intersection, ensemble_simulator.py:
    * 68-77). Each frame needs `idColumn`, `prediction`, the target
    * column, and optionally `confidence` (missing → constant 1.0 with
    * conf_err_corr 0.0, like np.ones in the aggregation stack). */
  def fromFrames(frames: Seq[(String, DataFrame)], idColumn: String,
                 targetColumn: String): EnsembleSimulator = {
    require(frames.nonEmpty, "EnsembleSimulator: needs at least one model frame")
    val aligned = frames.zipWithIndex.map { case ((_, df), i) =>
      val confCol =
        if (df.columns.contains("confidence")) col("confidence").cast("double")
        else lit(1.0)
      val base = df.select(
        Seq(col(idColumn).as("__id"),
          col("prediction").cast("double").as(s"__p$i"),
          confCol.as(s"__c$i")) ++
          (if (i == 0) Seq(col(targetColumn).cast("double").as("__t")) else Nil): _*)
      base
    }.reduce(_.join(_, Seq("__id"), "inner"))
    // every analysis method re-scans the aligned frame — materialize
    // once (the reference holds it in memory as a pandas frame)
    new EnsembleSimulator(aligned.persist(), frames.map(_._1))
  }

  /** Load each model's captured predictions from the catalog — the
    * reference's `_load_predictions` over `full_cross_fold` captures
    * (ensemble_simulator.py:52-84). The capture must have been written
    * with an id column (crossFoldInference's `idColumn`). */
  def apply(catalog: graft.api.Catalog, modelNames: Seq[String],
            idColumn: String = "id",
            captureName: String = "full_cross_fold"): EnsembleSimulator = {
    require(modelNames.nonEmpty, "EnsembleSimulator: needs at least one model")
    val target = catalog.model(modelNames.head).target
    val frames = modelNames.map { name =>
      val df = catalog.model(name).getInferencePredictions(captureName)
        .getOrElse(throw new IllegalStateException(
          s"No '$captureName' predictions found for model '$name'. Run endpoint inference first."))
      name -> df
    }
    fromFrames(frames, idColumn, target)
  }
}
