package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation metrics as single-pass aggregate expressions
  * (reference: src/workbench/utils/metrics_utils.py:97-255 and
  * endpoint_core.py:1150-1250 compute these in pandas/sklearn; here they
  * are one `agg` — a single scan at any scale).
  */
object Metrics {

  /** RMSE / MAE / MedAE / R² for a regression prediction column — one
    * aggregate pass (R² via the sum-of-squares identity, no second scan).
    */
  def regressionMetrics(df: DataFrame, target: String, pred: String): DataFrame = {
    val y = col(target); val err = y - col(pred)
    df.agg(
      round(sqrt(avg(err * err)), 6).as("rmse"),
      round(avg(abs(err)), 6).as("mae"),
      round(element_at(graft.functions.ExactPercentiles
        .exactPercentiles(abs(err).cast("double"), Seq(0.5)), 1), 6).as("medae"),
      // try_divide: a constant/single-value target has zero variance —
      // r² is undefined (null), not a divide-by-zero crash under ANSI
      round(lit(1.0) - try_divide(sum(err * err),
        sum(y * y) - count(lit(1)) * avg(y) * avg(y)), 6).as("r2"))
  }

  /** Confusion matrix as (label, prediction, count), long format —
    * groupBy+count, no driver-side sklearn
    * (reference: endpoint_core.py:1210-1250). */
  def confusionMatrix(df: DataFrame, label: String, pred: String): DataFrame =
    df.groupBy(col(label).as("label"), col(pred).as("prediction"))
      .agg(count(lit(1)).as("count"))
      .orderBy("label", "prediction")

  /** Per-class precision / recall / F1 from the long confusion matrix —
    * two small aggregates over the (label, prediction, count) table. */
  def classificationReport(df: DataFrame, label: String, pred: String): DataFrame = {
    val cm = confusionMatrix(df, label, pred)
    val tp = cm.filter(col("label") === col("prediction"))
      .select(col("label").as("class"), col("count").as("tp"))
    val actual = cm.groupBy(col("label").as("class")).agg(sum("count").as("support"))
    val predicted = cm.groupBy(col("prediction").as("class")).agg(sum("count").as("n_pred"))
    actual.join(predicted, Seq("class"), "left").join(tp, Seq("class"), "left")
      .na.fill(0, Seq("tp", "n_pred"))
      .withColumn("precision", round(col("tp") / greatest(col("n_pred"), lit(1)), 6))
      .withColumn("recall", round(col("tp") / greatest(col("support"), lit(1)), 6))
      .withColumn("f1", round(
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))), 6))
      .select("class", "support", "precision", "recall", "f1")
      .orderBy("class")
  }

  /** Residuals: y − ŷ and |y − ŷ| appended
    * (reference: endpoint_core.py:1165-1191). */
  def withResiduals(df: DataFrame, target: String, pred: String): DataFrame =
    df.withColumn("residuals", col(target) - col(pred))
      .withColumn("residuals_abs", abs(col(target) - col(pred)))

  /** Wide confusion matrix with explicit model-label ordering — the
    * reference's sklearn `confusion_matrix(labels=...)` shape
    * (endpoint_core.py:1210-1250): one row per actual label, one column
    * per predicted label, zero-filled. */
  def confusionMatrixPivot(df: DataFrame, label: String, pred: String,
                           labels: Seq[String]): DataFrame = {
    val cm = confusionMatrix(df, label, pred)
    val rows = df.sparkSession
      .createDataFrame(labels.map(l => (l, 0L))).toDF("label", "__zero")
    // backtick-quote: label values may contain dots (col("v1.2") would
    // parse as a nested-field reference)
    rows.join(cm.groupBy("label").pivot("prediction", labels).sum("count"),
        Seq("label"), "left")
      .na.fill(0L, labels)
      .select((col("label") +: labels.map(l => col(s"`$l`"))).toIndexedSeq: _*)
  }

  /** ROC-AUC via the tie-aware rank-sum (Mann-Whitney) identity —
    * equivalent to sklearn's roc_auc_score used in the reference's
    * metrics pack (utils/metrics_utils.py:97-255), but computed as
    * aggregates: AUC = (Σ_{pos} avgRank − P(P+1)/2) / (P·N).
    *
    * Scale shape: the cumulative rank prefix is a DISTRIBUTED prefix
    * sum, not a global window — distinct scores are range-bucketed
    * (fixed-width over [min, max]), the per-bucket totals (metadata:
    * ≤`buckets` rows) become driver-side offsets, and the within-bucket
    * window is PARTITIONED by bucket. No single-partition sort at any
    * cardinality — a continuous score column (distinct ≈ N) flows
    * through an ordinary hash+range shuffle. Same exact result as the
    * global-window form. */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String,
             buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = df
      .select(col(scoreCol).cast("double").as("score"),
        col(labelCol).cast("int").as("pos"))
      .filter(col("score").isNotNull && col("pos").isNotNull)
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
    // two-phase range bounds (literals, like the outlier bounds) so the
    // bucket id is a plain codegen'd expression
    val mm = grouped.agg(min("score"), max("score")).head()
    if (mm.isNullAt(0))
      return df.sparkSession.range(1)
        .select(lit(null).cast("double").as("roc_auc"))
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / buckets
    val bucket =
      if (width == 0) lit(0)
      else least(floor((col("score") - lit(lo)) / lit(width)),
        lit(buckets - 1)).cast("int")
    val bucketed = grouped.withColumn("bucket", bucket)
    // per-bucket totals → cumulative offsets on the driver (≤`buckets`
    // rows), broadcast back as a literal map
    val totals = bucketed.groupBy("bucket").agg(sum("n").as("bn"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsetByBucket: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (b, bn) => val o = b -> acc; acc += bn; o }.toMap
    }
    val offCol = element_at(typedlit(offsetByBucket), col("bucket"))
    val w = Window.partitionBy("bucket").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed
      .withColumn("before", offCol + coalesce(sum("n").over(w), lit(0L)))
      .withColumn("avg_rank", col("before") + (col("n") + 1) / 2.0)
    ranked.agg(
      sum(col("n_pos") * col("avg_rank")).as("__rank_sum"),
      sum("n_pos").as("__p"), sum(col("n") - col("n_pos")).as("__n"))
      .select(round(
        (col("__rank_sum") - col("__p") * (col("__p") + 1) / 2.0) /
          (col("__p") * col("__n")), 6).as("roc_auc"))
  }

  /** Full classification metrics table — the reference's
    * `compute_classification_metrics` (utils/metrics_utils.py:97-196):
    * per-class precision/recall/f1/support, one-vs-rest ROC-AUC per
    * class when every `{label}_proba` column is present (null column
    * otherwise), plus the support-weighted 'all' row. NaN/null
    * predictions are dropped like the reference. */
  def classificationMetricsFull(df: DataFrame, target: String, pred: String,
                                labels: Seq[String]): DataFrame = {
    // the reference's pandas isnull drop removes NaN as well as null for
    // numeric prediction columns; isnan on a non-numeric cast would null
    // out every row, so gate on the column's type
    val predNumeric = df.schema(pred).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val clean0 =
      if (predNumeric) df.filter(col(pred).isNotNull && !isnan(col(pred).cast("double")))
      else df.filter(col(pred).isNotNull)
    // class labels are strings throughout (the `labels` arg, the 'all'
    // row) — numeric target/pred columns would otherwise give the output
    // `class` column a numeric type the 'all' row can't inhabit
    val clean = clean0
      .withColumn(target, col(target).cast("string"))
      .withColumn(pred, col(pred).cast("string"))
    val report = classificationReport(clean, target, pred)
    val probaCols = labels.map(l => s"${l}_proba")
    val withAuc =
      if (probaCols.forall(df.columns.contains)) {
        val aucs = labels.map { l =>
          rocAuc(clean.withColumn("__pos", (col(target) === l).cast("int")),
            "__pos", s"${l}_proba").withColumn("class", lit(l))
        }.reduce(_ unionByName _)
        report.join(aucs, Seq("class"), "left")
      } else report.withColumn("roc_auc", lit(null).cast("double"))
    // the per-class table is metadata-sized — collect ONCE and build the
    // support-weighted 'all' row on the driver (a unionByName with a
    // second reference to withAuc would re-execute every per-class
    // aggregate a second time)
    val perClass = withAuc
      .select("class", "support", "precision", "recall", "f1", "roc_auc")
      .collect().toSeq
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val total = perClass.map(_.getLong(1)).sum
    def weighted(idx: Int): Any =
      if (perClass.exists(_.isNullAt(idx))) null
      else java.lang.Double.valueOf(r6(
        perClass.map(r => r.getDouble(idx) * r.getLong(1)).sum / total))
    val allRow = org.apache.spark.sql.Row("all", total,
      weighted(2), weighted(3), weighted(4), weighted(5))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList((perClass :+ allRow): _*)),
      withAuc.select("class", "support", "precision", "recall", "f1", "roc_auc").schema)
  }

  /** Classifier residuals: class_index(ŷ) − class_index(y) in the given
    * label order, plus the absolute form — the inference-view residual
    * rule for classifiers
    * (reference: core/views/inference_view.py:60-72). Unknown labels map
    * to null like pandas' map. */
  def withClassifierResiduals(df: DataFrame, target: String, pred: String,
                              labels: Seq[String]): DataFrame = {
    def idx(c: String) = labels.zipWithIndex
      .map { case (l, i) => when(col(c) === l, i) }
      .reduceRight((a, b) => a.otherwise(b))
    df.withColumn("residuals", idx(pred) - idx(target))
      .withColumn("residuals_abs", abs(col("residuals")))
  }

  /** Binary accuracy: collapse a multi-class problem to positive-vs-rest
    * and score agreement (reference: utils/pandas_utils.py:213-243 —
    * (TP+TN)/(all); over rows this is exactly the fraction where both
    * sides land on the same side of the positive set). */
  def binaryAccuracy(df: DataFrame, target: String, pred: String,
                     positiveClasses: Seq[String]): DataFrame = {
    val t = col(target).isInCollection(positiveClasses)
    val p = col(pred).isInCollection(positiveClasses)
    df.agg(round(avg(when(t === p, 1.0).otherwise(0.0)), 6).as("binary_accuracy"))
  }

  /** Binary accuracy per confidence quantile
    * (reference: utils/pandas_utils.py:354-397): bucket rows by the
    * max-probability column into n quantiles (range-bucketed exact
    * percentile edges — no global-sort window, see
    * Transforms.quantileSplitRanged) and score each bucket. */
  def confidenceProfile(df: DataFrame, target: String, pred: String,
                        maxProbaCol: String, positiveClasses: Seq[String],
                        quantiles: Int = 10): DataFrame = {
    val bucketed = graft.transforms.Transforms
      .quantileSplitRanged(df, maxProbaCol, quantiles, exact = true)
    val t = col(target).isInCollection(positiveClasses)
    val p = col(pred).isInCollection(positiveClasses)
    bucketed.groupBy(col("quantile"))
      .agg(round(avg(when(t === p, 1.0).otherwise(0.0)), 6).as("binary_accuracy"))
      .orderBy("quantile")
  }

  /** Merge missing meta columns from the FeatureSet into out-of-fold
    * predictions by id, so cross-fold captures match the live-inference
    * column set (reference: endpoint_core.py:640-656). Only columns
    * absent from `oof` and present in `fs` are pulled; the projection is
    * pruned to exactly those, and the (narrow) meta table broadcasts
    * under AQE when small. */
  def mergeMetaColumns(oof: DataFrame, fs: DataFrame, idCol: String,
                       metaCols: Seq[String]): DataFrame = {
    val toMerge = metaCols.distinct
      .filterNot(oof.columns.contains).filter(fs.columns.contains)
    if (toMerge.isEmpty) oof
    else oof.join(fs.select((idCol +: toMerge).map(col).toIndexedSeq: _*),
      Seq(idCol), "left")
  }
}
