package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group exact quantiles in long format — the grouped companion of
  * the descriptive-stats surface (eda/Eda.scala q03 computes global
  * quartiles; this emits them per group key).
  *
  * Scale shape: ONE groupBy with Spark's exact `percentile` aggregate
  * (linear interpolation, same convention as quantile_cont) producing
  * the whole quantile array per group, then a metadata-sized explode —
  * no window, no global sort, one shuffle on the group key.
  */
object GroupStats {

  /** (groupCol, p, value 6dp) — one row per group × requested quantile. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val qs = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol).cast("double"),
        lit(ps.toArray)).as("__qs"))
    val pairs = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("p"), round(element_at(col("__qs"), i + 1), 6).as("value"))
    }
    qs.select(col(groupCol), explode(array(pairs: _*)).as("r"))
      .select(col(groupCol), col("r.p"), col("r.value"))
  }
}
