package graft.eda

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audit over a quasi-identifier combination: k-anonymity
  * (how many rows live in an equivalence class smaller than k — each
  * such row is re-identifiable to within its class) and l-diversity
  * (the minimum number of distinct sensitive values inside any class —
  * a class can be k-anonymous yet reveal the sensitive attribute
  * outright when l = 1). The reference profiles columns individually
  * (value_counts / column_stats,
  * reference: src/workbench/core/views/column_subset_view.py); the
  * joint-identifiability audit is the release-gate a training-data
  * export needs before leaving the platform.
  *
  * Scale design: ONE groupBy on the quasi-identifier tuple produces
  * the class-size/diversity frame (map-side combinable; classes ≪
  * rows), and each requested k is a conditional aggregate over that
  * frame — the k list adds zero extra passes.
  */
object Privacy {

  /** One row per k in `ks`: (k, n_classes, classes_below, rows_at_risk,
    * risk_frac 6dp, min_l_diversity) — n_classes and min_l_diversity
    * are k-independent context columns repeated per row.
    */
  def kAnonymityAudit(df: DataFrame, quasiIdCols: Seq[String],
                      sensitiveCol: String, ks: Seq[Int]): DataFrame = {
    require(quasiIdCols.nonEmpty && ks.nonEmpty)
    require(ks.forall(_ >= 1), s"ks must be positive: $ks")
    val classes = df.groupBy(quasiIdCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__l"))
    val aggs = Seq(
      count(lit(1)).as("n_classes"),
      sum("__n").as("__rows"),
      min("__l").as("min_l_diversity")) ++
      ks.flatMap(k => Seq(
        sum(when(col("__n") < k, 1L).otherwise(0L)).as(s"__cb_$k"),
        sum(when(col("__n") < k, col("__n")).otherwise(lit(0L))).as(s"__rr_$k")))
    val total = classes.agg(aggs.head, aggs.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val kFrame = ks.toDF("k")
    kFrame.crossJoin(broadcast(total))
      .select(col("k"), col("n_classes"),
        ks.map(k => when(col("k") === k, col(s"__cb_$k")))
          .reduce(coalesce(_, _)).as("classes_below"),
        ks.map(k => when(col("k") === k, col(s"__rr_$k")))
          .reduce(coalesce(_, _)).as("rows_at_risk"),
        round(ks.map(k => when(col("k") === k, col(s"__rr_$k")))
          .reduce(coalesce(_, _)).cast("double") / col("__rows"), 6)
          .as("risk_frac"),
        col("min_l_diversity"))
      .orderBy("k")
  }
}
