package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Champion/challenger contests over the Reports store — the reference's
  * contest stack: ranking and report shaping from
  * utils/model_comparison.py:99-294, the `/contests/` report helpers
  * from utils/contest_utils.py:1-98, and the promotion decision of the
  * default arbiter (batch/models/model_promotion.py:22-114).
  *
  * Everything here is metadata-sized driver work (metrics rows, report
  * tables with one row per model) — the heavy lifting happened when the
  * inference runs were captured, and each model's metrics parquet is
  * read ONCE per arbiter pass. Divergence from the reference: the
  * arbiter's "freeze a dated copy and deploy" step collapses to
  * re-pointing the endpoint's registry row at the winner (model
  * artifacts here are immutable catalog entries), and the summary's
  * recent-change window keys off the report's publish stamp (the
  * arbiter publishes immediately after deciding, so publish time IS the
  * promotion time).
  */
object Contests {
  /** Reports-store key prefix for contests (contest_utils.py:7). */
  val ContestPrefix = "contests/"
  /** Contest published within this window → `recent_change` flag
    * (contest_utils.py:13). */
  val RecentChangeHours = 72
  /** Best challenger at most this many percent worse than the champion
    * on the primary metric still counts as contested
    * (model_comparison.py:25). */
  val ContestedPct: Double = -1.0
  /** Challengers this close to the champion are its frozen twin. */
  val TwinEps: Double = 1e-6

  private type Metrics = Seq[(String, Double)]

  /** Non-empty metrics per model — a model whose capture produced an
    * all-null row ranks on nothing and is skipped like a missing run. */
  private def metricsOf(m: Model, run: String): Option[Metrics] =
    ModelComparison.metricsRow(m, run).filter(_.nonEmpty)

  /** Primary ranking metric across a pool: rmse (low-to-high) when ANY
    * model reports it, else f1 (high-to-low) — model_comparison.py:99.
    * Looking only at the first model would let one classifier in a
    * regressor pool flip the whole ranking. */
  private def primaryOf(pool: Seq[Metrics]): Option[String] = {
    val cols = pool.flatMap(_.map(_._1)).toSet
    if (cols.contains("rmse")) Some("rmse")
    else if (cols.contains("f1")) Some("f1") else None
  }

  /** Rank models best-first on the pool's primary metric; models missing
    * the metric rank last. Models without metrics for the run are
    * skipped. */
  def rankModels(models: Seq[Model], run: String = "default")
      : Seq[(String, Metrics)] = {
    val scored = models.flatMap(m => metricsOf(m, run).map(m.name -> _))
    rankScored(scored)
  }

  private def rankScored(scored: Seq[(String, Metrics)]): Seq[(String, Metrics)] =
    primaryOf(scored.map(_._2)) match {
      case Some("rmse") =>
        scored.sortBy(_._2.toMap.getOrElse("rmse", Double.MaxValue))
      case Some("f1") =>
        scored.sortBy(-_._2.toMap.getOrElse("f1", Double.MinValue))
      case _ => scored
    }

  private def r6(x: Double): Double = ModelComparison.round6(x)

  /** The publishable contest report (model_comparison.py:160-240):
    * champion first, challengers best-first; each metric column followed
    * by its Δ vs the champion (positive = better than champion,
    * lower-is-better flipped; `support` gets no Δ; champion Δs are 0; a
    * metric absent on either side gets a null Δ). The trailing columns
    * carry the contest endpoint and the contest-level `contested` flag
    * (best non-twin challenger within [[ContestedPct]] of the champion).
    * None when no model has metrics. */
  def contestReport(champion: Model, challengers: Seq[Model],
                    endpointName: String,
                    run: String = "full_cross_fold"): Option[DataFrame] =
    reportFrom(champion.catalog,
      metricsOf(champion, run).map(champion.name -> _),
      rankModels(challengers, run), endpointName)

  /** Report assembly from already-collected metrics — promoteIfBetter
    * reads each model's metrics parquet once and reuses them here. */
  private def reportFrom(catalog: Catalog, champ: Option[(String, Metrics)],
                         ranked: Seq[(String, Metrics)],
                         endpointName: String): Option[DataFrame] = {
    if (champ.isEmpty && ranked.isEmpty) return None
    // challenger-led union of metric keys (the reference's pd.concat
    // alignment, model_comparison.py:160-240): champion-only columns
    // append after; taking the champion's row alone silently drops
    // challenger-only metrics (e.g. a classifier's f1 in a mixed pool)
    val metricCols = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      (ranked.map(_._2) ++ champ.map(_._2).toSeq)
        .foreach(_.foreach { case (k, _) => seen += k })
      seen.toSeq
    }
    val champMap = champ.map(_._2.toMap).getOrElse(Map.empty)
    val primary = primaryOf(champ.map(_._2).toSeq ++ ranked.map(_._2))

    // null Δ when either side lacks the metric — heterogeneous pools
    // (classifier in a regressor contest, null per-class AUC) must not
    // crash the report
    def deltas(vals: Map[String, Double]): Seq[Option[Double]] =
      metricCols.map { c =>
        if (c == "support") None
        else for (cv <- champMap.get(c); v <- vals.get(c)) yield
          r6(if (ModelComparison.LowerIsBetter.contains(c)) cv - v else v - cv)
      }

    // a zero/NaN champion primary is no evidence to contest against —
    // the reference's _contested returns False there
    // (model_comparison.py:25-40)
    val contested = (for (p <- primary; cv <- champMap.get(p)
                          if cv != 0 && !cv.isNaN) yield
      ranked.map(_._2.toMap).exists { ch =>
        ch.get(p).exists { v =>
          val d = if (ModelComparison.LowerIsBetter.contains(p)) cv - v else v - cv
          math.abs(d) > TwinEps && d >= ContestedPct / 100.0 * math.abs(cv)
        }
      }).getOrElse(false)

    val allRows = champ.map { case (n, v) => ("champion", n, v.toMap) }.toSeq ++
      ranked.map { case (n, v) => ("challenger", n, v.toMap) }
    val rows = allRows.map { case (role, name, vals) =>
      val cells = metricCols.zip(deltas(vals)).flatMap { case (c, d) =>
        (vals.get(c).map(Double.box).orNull: Any) ::
          (if (c == "support") Nil else List(d.map(Double.box).orNull: Any))
      }
      Row.fromSeq(Seq(name, role, endpointName) ++ cells :+ Boolean.box(contested))
    }
    val fields = Seq(StructField("model", StringType),
      StructField("role", StringType), StructField("endpoint", StringType)) ++
      metricCols.flatMap { c =>
        StructField(c, DoubleType) ::
          (if (c == "support") Nil else List(StructField("d_" + c, DoubleType)))
      } :+ StructField("contested", BooleanType, nullable = false)
    Some(catalog.spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), StructType(fields)))
  }

  /** Publish a contest report at `/contests/<endpoint>` with a publish
    * stamp (model_promotion.py:47-56; the stamp feeds
    * [[contestSummary]]'s recent-change window). */
  def publish(catalog: Catalog, endpointName: String, report: DataFrame): Unit =
    catalog.reports.upsert(ContestPrefix + endpointName,
      report.withColumn("published_at",
        lit(new java.sql.Timestamp(System.currentTimeMillis()))))

  /** The contests a model takes part in — membership lives in the
    * published report rows, not on the Model (contest_utils.py:15-52).
    * Returns (contest location, role, endpoint). */
  def findContests(catalog: Catalog, modelName: String): Seq[(String, String, String)] =
    catalog.reports.list().filter(_.startsWith(ContestPrefix)).flatMap { loc =>
      val df = catalog.reports.get(loc)
      if (!df.columns.contains("model")) Nil
      else df.filter(col("model") === modelName)
        .collect().headOption.map { r =>
          (loc,
            if (df.columns.contains("role")) r.getAs[String]("role") else null,
            if (df.columns.contains("endpoint")) r.getAs[String]("endpoint") else null)
        }
    }

  /** One summary row per published contest, newest first
    * (contest_utils.py:55-98): contest name (prefix stripped), champion,
    * challenger count, endpoint, contested, and `recent_change` when the
    * report was published within [[RecentChangeHours]]. */
  def contestSummary(catalog: Catalog)
      : Seq[(String, String, Long, String, Boolean, Boolean)] = {
    val now = System.currentTimeMillis()
    catalog.reports.list().filter(_.startsWith(ContestPrefix)).flatMap { loc =>
      val df = catalog.reports.get(loc)
      if (!df.columns.contains("role")) None
      else {
        val rows = df.collect() // one row per model
        val champ = rows.find(_.getAs[String]("role") == "champion")
        val publishedAt =
          if (df.columns.contains("published_at"))
            champ.flatMap(r => Option(r.getAs[java.sql.Timestamp]("published_at")))
          else None
        Some((loc.stripPrefix(ContestPrefix),
          champ.map(_.getAs[String]("model")).orNull,
          rows.count(_.getAs[String]("role") == "challenger").toLong,
          champ.map(_.getAs[String]("endpoint")).orNull,
          champ.exists(r => df.columns.contains("contested") &&
            r.getAs[Boolean]("contested")),
          publishedAt.exists(ts => now - ts.getTime < RecentChangeHours * 3600000L),
          publishedAt))
      }
    }.sortBy(_._7.map(_.getTime).getOrElse(Long.MinValue))(Ordering[Long].reverse)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6))
  }

  /** Does the challenger beat the incumbent on the primary metrics?
    * (model_promotion.py:38-44; no incumbent → always true.) Missing
    * evidence never promotes: absent metric keys compare as false. */
  def beats(challenger: Map[String, Double], incumbent: Option[Map[String, Double]],
            isClassifier: Boolean): Boolean = incumbent match {
    case None => true
    case Some(inc) =>
      if (isClassifier)
        (for (c <- challenger.get("f1"); i <- inc.get("f1")) yield c > i)
          .getOrElse(false)
      else
        (for (cr <- challenger.get("rmse"); ir <- inc.get("rmse");
              cm <- challenger.get("mae"); im <- inc.get("mae"))
          yield cr < ir && cm < im).getOrElse(false)
  }

  /** The default promotion arbiter (model_promotion.py:59-114): rank the
    * challengers on their `run` metrics, compare the best against the
    * endpoint's current model, and when it wins re-point the endpoint at
    * it. ALWAYS publishes the contest report — also when no challenger
    * had metrics (champion-only report) or the incumbent held. Returns
    * the promoted model name, or None when the incumbent holds. */
  def promoteIfBetter(endpoint: Endpoint, challengers: Seq[Model],
                      run: String = "full_cross_fold"): Option[String] = {
    val catalog = endpoint.catalog
    val incumbentModel = endpoint.model
    // each metrics parquet read exactly once; everything below reuses
    // the collected rows
    val scored = challengers.flatMap(m => metricsOf(m, run).map(m.name -> _))
    val ranked = rankScored(scored)
    val incumbent = metricsOf(incumbentModel, run)
    // metric-key selection follows the BEST CHALLENGER's type (the
    // reference's arbiter, model_promotion.py:38-44) — the incumbent
    // only decides when no challenger scored (it may be deleted, or a
    // different family than the pool under contest)
    val isClassifier = ranked.headOption
      .flatMap { case (n, _) => challengers.find(_.name == n) }
      .map(_.modelType).getOrElse(incumbentModel.modelType) == "classifier"

    val promoted = ranked.headOption.flatMap { case (winnerName, winnerMetrics) =>
      if (winnerName != endpoint.modelName &&
          beats(winnerMetrics.toMap, incumbent.map(_.toMap), isClassifier)) {
        // re-point the endpoint at the winner (toEndpoint rewrites the
        // registry row's input and records the endpoint on the model) —
        // the Spark-native form of "freeze a dated copy and deploy"
        catalog.model(winnerName).toEndpoint(endpoint.name)
        Some(winnerName)
      } else None
    }
    val champName = promoted.getOrElse(endpoint.modelName)
    val champMetrics = promoted match {
      case Some(w) => ranked.find(_._1 == w).map(_._2)
      case None => incumbent
    }
    reportFrom(catalog, champMetrics.map(champName -> _),
      ranked.filterNot(_._1 == champName), endpoint.name)
      .foreach(publish(catalog, endpoint.name, _))
    promoted
  }
}
