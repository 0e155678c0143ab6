package graft.transforms

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature imputation with quality tagging — the reference's
  * `impute_dataframe` contract (reference:
  * src/workbench/utils/pandas_utils.py:639-721): ±INF values are
  * demoted to missing, every missing cell is filled with the chosen
  * strategy's statistic (mean / median / zero, computed EXCLUDING the
  * bad cells), and each row carries a `feature_quality_tags` marker
  * naming what was repaired. Non-missing cells pass through UNTOUCHED
  * — only the fill statistic is 6dp-rounded (for cross-engine fill
  * parity). Deliberate deviation from the reference: the reference
  * emits a LIST column of tags; this emits the same tags as one
  * comma-joined string ('nan,inf' when a row has both across columns)
  * so the column stays a flat, oracle-comparable string.
  *
  * Scale shape: ONE statistics aggregate over the clean cells (all
  * columns in a single pass — the descriptive-stats shape), fills
  * injected as plan constants into a codegen projection; no window,
  * no join, one scan for stats + one for the rewrite. */
object Impute {

  def imputeFeatures(df: DataFrame, cols: Seq[String],
                     strategy: String = "median"): DataFrame = {
    require(Seq("mean", "median", "zero").contains(strategy),
      s"unsupported imputation strategy: $strategy")
    require(cols.nonEmpty)
    def cleanCol(c: String): Column = {
      val d = col(c).cast("double")
      when(d.isNull || isnan(d) || d === Double.PositiveInfinity ||
        d === Double.NegativeInfinity, lit(null)).otherwise(d)
    }
    val fills: Map[String, Double] =
      if (strategy == "zero") cols.map(_ -> 0.0).toMap
      else {
        val aggs = cols.map { c =>
          if (strategy == "mean") avg(cleanCol(c)).as(s"__f_$c")
          else graft.functions.ExactPercentiles
            .exactPercentiles(cleanCol(c), Seq(0.5)).getItem(0).as(s"__f_$c")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        cols.map { c =>
          val i = row.fieldIndex(s"__f_$c")
          // an all-bad column has no statistic: fill 0, matching the
          // reference's behavior of never leaving NaN behind
          c -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i))
        }.toMap
      }
    val tagged = cols.foldLeft(df) { (acc, c) =>
      val d = col(c).cast("double")
      // tag FIRST: the rewrite below replaces the column, so a tag
      // computed after it would always see the repaired value
      acc.withColumn(s"__tag_$c",
          when(d.isNull || isnan(d), "nan")
            .when(d === Double.PositiveInfinity ||
              d === Double.NegativeInfinity, "inf"))
        .withColumn(c,
          coalesce(cleanCol(c), round(lit(fills(c)), 6)))
    }
    tagged
      .withColumn("feature_quality_tags",
        concat_ws(",", array_distinct(array_compact(
          array(cols.map(c => col(s"__tag_$c")): _*)))))
      .drop(cols.map(c => s"__tag_$c"): _*)
  }
}
