package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-segment model-fairness report — the group-metrics read-out an
  * ML-ops deployment runs next to its confusion matrix (generalizes the
  * reference's per-model metrics in utils/metrics_utils.py:97-196 to
  * slice-level monitoring).
  *
  * Per segment: support, acceptance rate P(ŷ=1), TPR and FPR, plus the
  * deltas against the GLOBAL rates — demographic-parity gap (acceptance
  * delta) and the two equalized-odds gaps (TPR/FPR deltas). One grouped
  * aggregate over the scored frame + a broadcast one-row global frame;
  * degenerate segments (no positives / no negatives) get null rates via
  * try_divide, never a division error. */
object Fairness {

  def fairnessReport(df: DataFrame, segmentCol: String, labelCol: String,
                     predCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    val p = col(predCol).cast("int")
    def rates(grouped: DataFrame): DataFrame = grouped
      .withColumn("acceptance_rate",
        round(try_divide(col("__np"), col("n")), 6))
      .withColumn("tpr", round(try_divide(col("__tp"), col("__pos")), 6))
      .withColumn("fpr",
        round(try_divide(col("__fp"), col("n") - col("__pos")), 6))
    val per = rates(df.groupBy(col(segmentCol).as("segment")).agg(
      count(lit(1)).as("n"), sum(p).as("__np"), sum(y).as("__pos"),
      sum(p * y).as("__tp"), sum(p * (lit(1) - y)).as("__fp")))
    val global = rates(df.agg(
      count(lit(1)).as("n"), sum(p).as("__np"), sum(y).as("__pos"),
      sum(p * y).as("__tp"), sum(p * (lit(1) - y)).as("__fp")))
      .select(col("acceptance_rate").as("__gar"),
        col("tpr").as("__gtpr"), col("fpr").as("__gfpr"))
    per.join(broadcast(global))
      .select(col("segment"), col("n"),
        col("acceptance_rate"), col("tpr"), col("fpr"),
        round(col("acceptance_rate") - col("__gar"), 6).as("parity_gap"),
        round(col("tpr") - col("__gtpr"), 6).as("tpr_gap"),
        round(col("fpr") - col("__gfpr"), 6).as("fpr_gap"))
  }
}
