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
      round(lit(1.0) - sum(err * err) /
        (sum(y * y) - count(lit(1)) * avg(y) * avg(y)), 6).as("r2"))
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
}
