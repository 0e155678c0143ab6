package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Information-gain ranking of numeric features against a binary
  * label — the split-gain screen a feature-selection pass runs before
  * training (the numeric-feature counterpart of the q155/q156
  * MI/χ² contingency kernels, and of the reference's feature-quality
  * metrics surface).
  *
  * Scale shape: ONE wide exact-percentile aggregate computes every
  * feature's equi-depth bin edges in a single pass (the
  * descriptive-stats pattern; 6dp-quantized edges so edge-sitting
  * values bin identically in every engine); binning is a codegen
  * comparison chain; ONE explode + groupBy collapses the corpus to
  * (feature, bin, label-count) cells; entropies are aggregates OF THE
  * CELLS (metadata). Natural-log entropies. */
object InfoGain {

  def infoGain(df: DataFrame, features: Seq[String], labelCol: String,
               bins: Int = 5): DataFrame = {
    require(bins >= 2 && features.nonEmpty)
    val ps = (1 until bins).map(_.toDouble / bins)
    val base = df.filter(col(labelCol).isNotNull)
      .withColumn("__y", col(labelCol).cast("int"))
    val edgeRow = base.agg(
      graft.functions.ExactPercentiles
        .exactPercentiles(col(features.head).cast("double"), ps)
        .as(s"__e_${features.head}"),
      features.tail.map(c => graft.functions.ExactPercentiles
        .exactPercentiles(col(c).cast("double"), ps).as(s"__e_$c")): _*)
      .head()
    def edges(c: String): Seq[Double] = {
      val i = edgeRow.fieldIndex(s"__e_$c")
      if (edgeRow.isNullAt(i)) Seq.empty
      else edgeRow.getSeq[Double](i)
        .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    def binOf(c: String): Column =
      edges(c).foldLeft(lit(0))((acc, e) =>
        acc + when(col(c).cast("double") > e, 1).otherwise(0))
    val long = base.select(col("__y"),
      explode(array(features.map(c =>
        struct(lit(c).as("f"), binOf(c).as("b"))): _*)).as("p"))
    val cells = long.groupBy(col("p.f").as("__f"), col("p.b").as("__b"))
      .agg(count(lit(1)).as("__n"), sum("__y").as("__pos"))
    // binary entropy of a (pos, n) cell, 0·ln0 := 0 — the same guarded
    // form the oracle SQL uses, so engines agree exactly at 6dp
    def h(pos: Column, n: Column): Column = {
      val p = pos / n.cast("double")
      val q = lit(1.0) - p
      when(p > 0, -p * log(p)).otherwise(0.0) +
        when(q > 0, -q * log(q)).otherwise(0.0)
    }
    val totals = cells.groupBy("__f")
      .agg(sum("__n").as("__nt"), sum("__pos").as("__post"),
        count(lit(1)).as("n_bins"))
    cells.join(totals, "__f")
      .groupBy(col("__f").as("feature"))
      .agg(first("n_bins").as("n_bins"),
        round(h(first("__post"), first("__nt")) -
          sum(col("__n") / col("__nt").cast("double") *
            h(col("__pos"), col("__n"))), 6).as("info_gain"))
  }
}
