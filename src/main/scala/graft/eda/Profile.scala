package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dataset-profiling operators: snapshot-vs-snapshot column drift and
  * candidate-key / functional-dependency discovery — the data-contract
  * checks that sit next to the reference's health/drift layer
  * (target_health / detect_drift in
  * src/workbench/core/artifacts/data_quality — here generalized to
  * whole-profile and key-shape assertions).
  */
object Profile {

  /** Side-by-side numeric profile of two snapshots of the same table.
    * For every shared numeric column: row count, null count, mean,
    * sample stddev, min, max — emitted LONG ((column, metric,
    * base_value, curr_value, abs_change)) so downstream gates can
    * threshold per metric.
    *
    * Scale shape: ONE wide aggregate per side (every column's six
    * stats in a single map-side-combined pass — the descriptive_stats
    * kernel), reshaped on the driver from the two single-row results;
    * no per-column jobs, no joins of data-sized frames. */
  def profileCompare(base: DataFrame, current: DataFrame): DataFrame = {
    val cols = Tables.numericCols(base).toSet
      .intersect(Tables.numericCols(current).toSet).toSeq.sorted
    require(cols.nonEmpty, "profileCompare: no shared numeric columns")
    val metrics = Seq("n", "n_null", "mean", "stddev", "min", "max")
    def wide(df: DataFrame) = df.agg(
      count(lit(1)).as("__rows"),
      cols.flatMap { c =>
        val d = col(c).cast("double")
        Seq(count(d).as(s"__n_$c"),
          avg(d).as(s"__mean_$c"), stddev_samp(d).as(s"__std_$c"),
          min(d).as(s"__min_$c"), max(d).as(s"__max_$c"))
      }: _*).head()
    val (b, u) = (wide(base), wide(current))
    def stats(r: org.apache.spark.sql.Row, c: String): Seq[Double] = {
      val rows = r.getLong(r.fieldIndex("__rows")).toDouble
      val n = r.getLong(r.fieldIndex(s"__n_$c")).toDouble
      def g(p: String): Double = {
        val i = r.fieldIndex(s"__${p}_$c")
        if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
      }
      Seq(n, rows - n, g("mean"), g("std"), g("min"), g("max"))
    }
    val spark = base.sparkSession
    import spark.implicits._
    cols.flatMap { c =>
      metrics.zip(stats(b, c)).zip(stats(u, c)).map {
        case ((m, bv), uv) =>
          def r6(x: Double) =
            if (x.isNaN) None
            else Some(BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          (c, m, r6(bv), r6(uv),
            if (bv.isNaN || uv.isNaN) None else r6(uv - bv).map(math.abs))
      }
    }.toDF("column_name", "metric", "base_value", "curr_value", "abs_change")
  }

  /** Candidate-key scan: for each column, distinct count vs row count
    * (is_key when equal, null rows counted as a value). Exact distincts
    * for oracle parity — the 100 TB screening pass would swap in
    * approx_count_distinct sketches (one pass, mergeable) and confirm
    * only the survivors exactly. Returns (column, n_rows, n_distinct,
    * n_null, is_key). */
  def keyCandidates(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agg = df.agg(
      count(lit(1)).as("__rows"),
      cols.flatMap { c =>
        // coalesce: sum over ZERO rows is null — an empty table must
        // report zero nulls, not NPE the driver read-back
        Seq(count_distinct(col(c)).as(s"__d_$c"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .as(s"__nn_$c"))
      }: _*).head()
    val rows = agg.getLong(agg.fieldIndex("__rows"))
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      val d = agg.getLong(agg.fieldIndex(s"__d_$c"))
      val nn = agg.getLong(agg.fieldIndex(s"__nn_$c"))
      (c, rows, d, nn, nn == 0L && d == rows)
    }.toDF("column_name", "n_rows", "n_distinct", "n_null", "is_key")
  }

  /** Row-level snapshot diff (CDC-style): full-outer-join two keyed
    * snapshots and count added / removed / changed / unchanged rows,
    * plus a per-compare-column change count — the audit before
    * promoting a refreshed table. ONE key-shuffled full outer join;
    * classification is a codegen projection (null-safe equality so
    * NULL→value transitions count as changes); all counts come from a
    * single aggregate. Returns long rows (metric, n). */
  def snapshotDiff(base: DataFrame, current: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty)
    val b = base.select(col(keyCol).as("__k") +: lit(1).as("__in_b") +:
      compareCols.map(c => col(c).as(s"__b_$c")): _*)
    val u = current.select(col(keyCol).as("__k") +: lit(1).as("__in_u") +:
      compareCols.map(c => col(c).as(s"__u_$c")): _*)
    val changedCol = compareCols.map(c =>
      !(col(s"__b_$c") <=> col(s"__u_$c"))).reduce(_ || _)
    val j = b.join(u, Seq("__k"), "full_outer")
    // coalesce: sum over an EMPTY joined frame is null, and two empty
    // snapshots must report zeros, not NPE on the driver read-back
    val aggs = Seq(
      coalesce(sum(when(col("__in_b").isNull, 1L).otherwise(0L)), lit(0L))
        .as("added"),
      coalesce(sum(when(col("__in_u").isNull, 1L).otherwise(0L)), lit(0L))
        .as("removed"),
      coalesce(sum(when(col("__in_b").isNotNull && col("__in_u").isNotNull &&
        changedCol, 1L).otherwise(0L)), lit(0L)).as("changed"),
      coalesce(sum(when(col("__in_b").isNotNull && col("__in_u").isNotNull &&
        !changedCol, 1L).otherwise(0L)), lit(0L)).as("unchanged")) ++
      compareCols.map(c =>
        coalesce(sum(when(col("__in_b").isNotNull && col("__in_u").isNotNull &&
          !(col(s"__b_$c") <=> col(s"__u_$c")), 1L).otherwise(0L)), lit(0L))
          .as(s"changed_$c"))
    val r = j.agg(aggs.head, aggs.tail: _*).head()
    val spark = base.sparkSession
    import spark.implicits._
    (Seq("added", "removed", "changed", "unchanged") ++
      compareCols.map(c => s"changed_$c"))
      .map(m => (m, r.getLong(r.fieldIndex(m))))
      .toDF("metric", "n")
  }

  /** Functional-dependency check lhs → rhs: a dependency holds when no
    * lhs group maps to two distinct rhs values. One groupBy(lhs) with a
    * distinct-count aggregate, then one metadata-sized rollup per pair.
    * Returns (lhs, rhs, n_groups, n_violating, holds). */
  def functionalDeps(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (lhs, rhs) =>
      df.groupBy(col(lhs))
        .agg(count_distinct(col(rhs)).as("__d"))
        .agg(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          count(lit(1)).as("n_groups"),
          sum(when(col("__d") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(col("lhs"), col("rhs"), col("n_groups"), col("n_violating"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionByName(_))
}
