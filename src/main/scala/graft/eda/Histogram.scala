package graft.eda

import graft.functions.ExactPercentiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Histogram kernels for the EDA surface — the binned view the
  * reference's dashboard renders next to descriptive stats
  * (reference: src/workbench/web_interface/components/plugins/ use
  * Plotly histograms over pulled samples; here the binning runs IN the
  * engine so it works at full scale, no sample pull).
  *
  * Scale shape: equi-width is two aggregates (min/max, then bucketed
  * counts — both map-side combined, no sort); equi-depth computes its
  * bin edges with the exact-percentile aggregate kernel (one pass, no
  * global sort) and then buckets with plan-constant edges. Neither path
  * shuffles more than bucket-cardinality rows.
  */
object Histogram {

  /** Empty-but-schema-correct result (no non-null rows to bin). */
  private def emptyHistogram(df: DataFrame): DataFrame =
    df.sparkSession.range(0).select(
      lit(0).as("bucket"), lit(0.0).as("lo"), lit(0.0).as("hi"),
      lit(0L).as("n"))

  /** Equi-width histogram: `bins` equal-width buckets spanning
    * [min, max]. Returns one row per NON-EMPTY bucket:
    * (bucket 0-based, lo, hi, n). The max value lands in the last
    * bucket (right edge closed there, open elsewhere). Edges are
    * rounded to 6dp for engine-stable output; bucket assignment uses
    * the unrounded width.
    */
  def equiWidth(df: DataFrame, colName: String, bins: Int): DataFrame = {
    require(bins >= 1)
    val c = col(colName).cast("double")
    val mm = df.filter(c.isNotNull).agg(min(c).as("lo"), max(c).as("hi")).head()
    if (mm.isNullAt(0)) return emptyHistogram(df)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val w = (hi - lo) / bins
    val bucket =
      if (w == 0.0) lit(0) // degenerate: all values equal → one bucket
      else least(floor((c - lo) / w).cast("int"), lit(bins - 1))
    df.filter(c.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * w, 6).as("lo"),
        round(lit(lo) + (col("bucket") + 1) * w, 6).as("hi"),
        col("n"))
  }

  /** Equi-depth histogram: buckets hold ~equal row counts. Bin edges
    * are the exact i/bins percentiles (linear interpolation — same
    * kernel the descriptive-stats quartiles use), computed in ONE
    * aggregate pass; assignment is a chain of plan-constant
    * comparisons, right-closed: bucket b covers (edge[b-1], edge[b]].
    * Duplicate-heavy columns give unequal depths by nature (ties can't
    * split). Edges are QUANTIZED at 6dp before assignment — the
    * interpolated percentile is float-order-sensitive in its last ulp,
    * and a data value sitting on an edge would otherwise flip buckets
    * between engines; the 6dp grid is where percentile kernels agree.
    */
  def equiDepth(df: DataFrame, colName: String, bins: Int): DataFrame = {
    require(bins >= 1)
    val c = col(colName).cast("double")
    val nn = df.filter(c.isNotNull)
    val ps = (0 to bins).map(_.toDouble / bins)
    val edgeRow = nn.agg(ExactPercentiles.exactPercentiles(c, ps).as("e")).head()
    if (edgeRow.isNullAt(0)) return emptyHistogram(df)
    val edges = edgeRow.getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // interior edges only; min/max bound the outer buckets
    val bucket = (1 until bins).foldLeft(lit(0)) { (acc, i) =>
      acc + when(c > edges(i), 1).otherwise(0)
    }
    nn.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        element_at(lit(edges.toArray), col("bucket") + 1).as("lo"),
        element_at(lit(edges.toArray), col("bucket") + 2).as("hi"),
        col("n"))
  }
}
