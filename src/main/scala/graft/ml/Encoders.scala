package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised categorical encoders — the feature-engineering step
  * between the raw FeatureSet and a model fit (the reference one-hots
  * low-cardinality categoricals, transforms/Transforms.scala q17; these
  * are the high-cardinality answers: a category becomes one informative
  * number instead of a dummy column per level).
  *
  * Scale shape: each encoder is ONE groupBy on the category collapsing
  * the corpus to category cardinality, a broadcast join of that tiny
  * table back onto the rows, and nothing else. No window, no per-row
  * state.
  */
object Encoders {

  /** Weight-of-evidence table per category level of `catCol` against a
    * binary `labelCol` (values 0/1):
    *   woe = ln( ((pos_c + 0.5)/pos_tot) / ((neg_c + 0.5)/neg_tot) )
    * (0.5 Laplace smoothing keeps empty cells finite), plus each
    * level's contribution to information value:
    *   iv_term = (pos_share − neg_share) · woe.
    * Returns (category, n, n_pos, n_neg, woe 6dp, iv_term 6dp).
    */
  def woeTable(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    val cells = df.groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col(labelCol) === 0, 1L).otherwise(0L)).as("n_neg"))
    val tot = cells.agg(sum("n_pos").as("__p"), sum("n_neg").as("__ng"))
    val posShare = (col("n_pos") + 0.5) / col("__p")
    val negShare = (col("n_neg") + 0.5) / col("__ng")
    cells.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("n_pos"), col("n_neg"),
        round(log(posShare / negShare), 6).as("woe"),
        round((posShare - negShare) * log(posShare / negShare), 6).as("iv_term"))
  }

  /** WOE over a NUMERIC feature: quantile-bin it (exact equi-depth
    * edges, 6dp-quantized — the Histogram.equiDepth convention) and
    * score each bin against the binary label. The credit-scoring
    * binning step composed from kernels this engine already has:
    * one percentile aggregate + the [[woeTable]] pass. Returns the
    * woeTable shape with `category` = bin index as a string.
    */
  def binnedWoe(df: DataFrame, numCol: String, labelCol: String,
                bins: Int): DataFrame = {
    require(bins >= 2)
    val c = col(numCol).cast("double")
    val ps = (1 until bins).map(_.toDouble / bins)
    val edgeRow = df.filter(c.isNotNull)
      .agg(graft.functions.ExactPercentiles.exactPercentiles(c, ps)).head()
    if (edgeRow.isNullAt(0))
      return woeTable(df.filter(lit(false))
        .withColumn("__bin", lit("")), "__bin", labelCol)
    val edges = edgeRow.getSeq[Double](0)
      .map(e => BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val bin = edges.foldLeft(lit(0))((acc, e) =>
      acc + when(c > e, 1).otherwise(0))
    woeTable(df.filter(c.isNotNull)
      .withColumn("__bin", bin.cast("string")), "__bin", labelCol)
  }

  /** Smoothed target (mean) encoding: each level maps to
    *   (sum_c + m·globalMean) / (n_c + m)
    * — the empirical-Bayes shrink toward the global mean that keeps
    * rare levels from memorizing their few rows (m = pseudo-count
    * `smoothing`). Returns the input rows with an added `encCol`
    * (6dp). The encoding table itself is category-cardinality and
    * broadcast back onto the rows.
    */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
                   encCol: String, smoothing: Double = 20.0): DataFrame = {
    // sums accumulate in DECIMAL(18,2): order-independent addition, so a
    // 1000-executor run and the single-node oracle agree bit-for-bit
    val dec = col(targetCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val stats = df.groupBy(col(catCol))
      .agg(count(col(targetCol)).as("__n"), sum(dec).cast("double").as("__s"))
    val g = df.agg((sum(dec).cast("double") / count(col(targetCol))).as("__gm"))
    val enc = stats.crossJoin(broadcast(g))
      .select(col(catCol),
        round((col("__s") + lit(smoothing) * col("__gm")) /
          (col("__n") + smoothing), 6).as(encCol))
    df.join(broadcast(enc), Seq(catCol))
  }

  /** Out-of-fold target encoding — the leakage-controlled variant: a
    * row's encoding uses every OTHER fold's statistics, so its own
    * target never leaks into its feature (the k-fold trick training
    * pipelines use before fitting on encoded columns). `foldCol` must
    * hold the row's fold id (e.g. a deterministic hash bucket —
    * [[graft.ml.GroupSplit]]'s draw).
    *
    * Scale shape: ONE (category, fold) groupBy collapses the corpus to
    * category×folds rows; per-row leave-fold-out statistics come from
    * the category totals minus the row's own fold — a broadcast join
    * of two metadata-sized frames, no per-fold re-aggregation, no
    * window. Sums ride DECIMAL(18,2) so every engine agrees
    * bit-for-bit. Categories unseen outside a row's fold fall back to
    * the global leave-fold-out mean via `smoothing`. */
  def targetEncodeOof(df: DataFrame, catCol: String, targetCol: String,
                      foldCol: String, encCol: String,
                      smoothing: Double = 20.0): DataFrame = {
    val dec = col(targetCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val cf = df.groupBy(col(catCol), col(foldCol))
      .agg(count(col(targetCol)).as("__nf"), sum(dec).as("__sf"))
    val cat = cf.groupBy(col(catCol))
      .agg(sum("__nf").as("__nc"), sum("__sf").as("__sc"))
    val fold = cf.groupBy(col(foldCol))
      .agg(sum("__nf").as("__ngf"), sum("__sf").as("__sgf"))
    val tot = cf.agg(sum("__nf").as("__ng"), sum("__sf").as("__sg"))
    // leave-fold-out global mean per fold (for the smoothing prior)
    val gm = fold.crossJoin(broadcast(tot))
      .select(col(foldCol),
        ((col("__sg") - col("__sgf")).cast("double") /
          (col("__ng") - col("__ngf"))).as("__gmo"))
    val enc = cf.join(cat, Seq(catCol)).join(broadcast(gm), Seq(foldCol))
      .select(col(catCol), col(foldCol),
        round(((col("__sc") - col("__sf")).cast("double") +
            lit(smoothing) * col("__gmo")) /
          (col("__nc") - col("__nf") + smoothing), 6).as(encCol))
    df.join(broadcast(enc), Seq(catCol, foldCol))
  }
}
