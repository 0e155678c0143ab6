package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Champion/challenger contests over the Reports store — the reference's
  * contest stack: ranking and report shaping from
  * utils/model_comparison.py:99-294, the `/contests/` report helpers
  * from utils/contest_utils.py:1-98, and the promotion decision of the
  * default arbiter (batch/models/model_promotion.py:22-114).
  *
  * Everything here is metadata-sized driver work (metrics rows, report
  * tables with one row per model) — the heavy lifting happened when the
  * inference runs were captured. Divergence from the reference: the
  * arbiter's "freeze a dated copy and deploy" step collapses to
  * re-pointing the endpoint's registry row at the winner (model
  * artifacts here are immutable catalog entries, so no copy is needed
  * to pin the champion).
  */
object Contests {
  /** Reports-store key prefix for contests (contest_utils.py:7). */
  val ContestPrefix = "contests/"
  /** Champion promoted within this window → "recent change" flag. */
  val RecentChangeHours = 72
  /** Best challenger at most this many percent worse than the champion
    * on the primary metric still counts as contested
    * (model_comparison.py:25). */
  val ContestedPct: Double = -1.0
  /** Challengers this close to the champion are its frozen twin. */
  val TwinEps: Double = 1e-6

  private def metricsOf(m: Model, run: String): Option[Seq[(String, Double)]] =
    ModelComparison.metricsRow(m, run)

  /** Rank models by primary metric — rmse low-to-high for regressors,
    * `all`-row f1 high-to-low for classifiers (model_comparison.py:99).
    * Models without metrics for the run are skipped. Returns driver-side
    * (name, metrics) pairs best-first. */
  def rankModels(models: Seq[Model], run: String = "default")
      : Seq[(String, Seq[(String, Double)])] = {
    val scored = models.flatMap(m => metricsOf(m, run).map(m.name -> _))
    val byCol = scored.headOption.map(_._2.map(_._1)).getOrElse(Nil)
    if (byCol.contains("rmse"))
      scored.sortBy(_._2.toMap.getOrElse("rmse", Double.MaxValue))
    else if (byCol.contains("f1"))
      scored.sortBy(-_._2.toMap.getOrElse("f1", Double.MinValue))
    else scored
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The publishable contest report (model_comparison.py:160-240):
    * champion first, challengers best-first; each metric column followed
    * by its Δ vs the champion (positive = better than champion,
    * lower-is-better flipped; `support` gets no Δ; champion Δs are 0).
    * The trailing columns carry the contest endpoint and the
    * contest-level `contested` flag (best non-twin challenger within
    * [[ContestedPct]] of the champion). None when no model has metrics. */
  def contestReport(champion: Model, challengers: Seq[Model],
                    endpointName: String,
                    run: String = "full_cross_fold"): Option[DataFrame] = {
    val champOpt = metricsOf(champion, run)
    val ranked = rankModels(challengers, run)
    if (champOpt.isEmpty && ranked.isEmpty) return None

    val metricCols = champOpt.map(_.map(_._1))
      .orElse(ranked.headOption.map(_._2.map(_._1))).get
    val champMap = champOpt.map(_.toMap).getOrElse(Map.empty)
    val primary = if (metricCols.contains("rmse")) "rmse" else "f1"

    def deltas(vals: Map[String, Double]): Seq[Option[Double]] =
      metricCols.map { c =>
        if (c == "support") None
        else champMap.get(c).map { cv =>
          r6(if (ModelComparison.LowerIsBetter.contains(c)) cv - vals(c)
             else vals(c) - cv)
        }
      }

    val contested = champMap.get(primary).exists { cv =>
      ranked.map(_._2.toMap).exists { ch =>
        val d = if (ModelComparison.LowerIsBetter.contains(primary))
          cv - ch(primary) else ch(primary) - cv
        math.abs(d) > TwinEps && d >= ContestedPct / 100.0 * math.abs(cv)
      }
    }

    val allRows =
      champOpt.map(v => ("champion", champion.name, v.toMap)).toSeq ++
        ranked.map { case (n, v) => ("challenger", n, v.toMap) }
    val rows = allRows.map { case (role, name, vals) =>
      val cells = metricCols.zip(deltas(vals)).flatMap { case (c, d) =>
        Double.box(vals.getOrElse(c, Double.NaN)) ::
          (if (c == "support") Nil
           else List(d.map(Double.box).orNull))
      }
      Row.fromSeq(Seq(name, role, endpointName) ++ cells :+ Boolean.box(contested))
    }
    val fields = Seq(StructField("model", StringType),
      StructField("role", StringType), StructField("endpoint", StringType)) ++
      metricCols.flatMap { c =>
        StructField(c, DoubleType) ::
          (if (c == "support") Nil else List(StructField("d_" + c, DoubleType)))
      } :+ StructField("contested", BooleanType, nullable = false)
    Some(champion.catalog.spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), StructType(fields)))
  }

  /** Publish a contest report at `/contests/<endpoint>`
    * (model_promotion.py:47-56). */
  def publish(catalog: Catalog, endpointName: String, report: DataFrame): Unit =
    catalog.reports.upsert(ContestPrefix + endpointName, report)

  /** The contests a model takes part in — membership lives in the
    * published report rows, not on the Model (contest_utils.py:15-52).
    * Returns (contest location, role, endpoint). */
  def findContests(catalog: Catalog, modelName: String): Seq[(String, String, String)] =
    catalog.reports.list().filter(_.startsWith(ContestPrefix)).flatMap { loc =>
      val df = catalog.reports.get(loc)
      if (!df.columns.contains("model")) Nil
      else df.filter(org.apache.spark.sql.functions.col("model") === modelName)
        .collect().headOption.map { r =>
          (loc,
            if (df.columns.contains("role")) r.getAs[String]("role") else null,
            if (df.columns.contains("endpoint")) r.getAs[String]("endpoint") else null)
        }
    }

  /** Does the challenger beat the incumbent on the primary metrics?
    * (model_promotion.py:38-44; no incumbent → always true). */
  def beats(challenger: Map[String, Double], incumbent: Option[Map[String, Double]],
            isClassifier: Boolean): Boolean = incumbent match {
    case None => true
    case Some(inc) =>
      if (isClassifier) challenger("f1") > inc("f1")
      else challenger("rmse") < inc("rmse") && challenger("mae") < inc("mae")
  }

  /** The default promotion arbiter (model_promotion.py:59-114): rank the
    * challengers on their `run` metrics, compare the best against the
    * endpoint's current model, and when it wins re-point the endpoint at
    * it. Always publishes the contest report. Returns the promoted model
    * name, or None when the incumbent holds. */
  def promoteIfBetter(endpoint: Endpoint, challengers: Seq[Model],
                      run: String = "full_cross_fold"): Option[String] = {
    val catalog = endpoint.catalog
    val ranked = rankModels(challengers, run)
    if (ranked.isEmpty) return None
    val isClassifier = challengers.head.modelType == "classifier"
    val (winnerName, winnerMetrics) = ranked.head
    val incumbent = metricsOf(endpoint.model, run).map(_.toMap)
    val promoted =
      if (beats(winnerMetrics.toMap, incumbent, isClassifier) &&
          winnerName != endpoint.modelName) {
        // re-point the endpoint at the winner (toEndpoint rewrites the
        // registry row's input and records the endpoint on the model) —
        // the Spark-native form of "freeze a dated copy and deploy"
        catalog.model(winnerName).toEndpoint(endpoint.name)
        Some(winnerName)
      } else None
    val champion = catalog.model(
      promoted.getOrElse(endpoint.modelName))
    contestReport(champion,
      challengers.filterNot(_.name == champion.name), endpoint.name, run)
      .foreach(publish(catalog, endpoint.name, _))
    promoted
  }
}
