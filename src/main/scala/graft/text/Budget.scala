package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget planning for training-mix assembly: given per-domain
  * available token counts, target mixture weights, and a total token
  * budget, compute each domain's token allocation and epoch count,
  * capping data-constrained domains at a maximum repeat count (the
  * Muennighoff et al. 2022 "Scaling Data-Constrained Language Models"
  * regime — repeats beyond ~4 epochs stop helping) and re-spreading
  * the freed budget over the uncapped domains (beyond the reference's
  * operator set — north-star scope).
  *
  * Scale shape: domains are metadata-cardinality (tens), so every
  * aggregate here is over a tiny frame regardless of corpus size — the
  * only corpus-sized work is the token count the caller feeds in
  * (one map-side-combined groupBy). The cap redistribution is a SINGLE
  * waterfill pass (cap, pool the surplus, re-spread proportionally,
  * re-clamp): re-spreading can push another domain over its own cap
  * only when almost everything is data-constrained, and the final
  * clamp keeps the plan valid (total ≤ budget) rather than looping to
  * exhaust the last tokens.
  */
object Budget {

  /** Plan from an explicit weights frame (source, weight), weights
    * summing to ~1: returns (source, n_tokens_avail, weight,
    * alloc_tokens, epochs 4dp, capped). `alloc_tokens` is the
    * post-redistribution, cap-clamped allocation. */
  def plan(tokenCounts: DataFrame, weights: DataFrame,
           totalBudget: Long, maxEpochs: Double = 4.0): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive, got $totalBudget")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val base = tokenCounts.join(weights, Seq("source"))
      .select(col("source"), col("n_tokens_avail"), col("weight"),
        (col("weight") * totalBudget).as("__raw"),
        (col("n_tokens_avail") * maxEpochs).as("__cap"))
      .withColumn("__capped", col("__raw") > col("__cap"))
    // surplus from capped domains + the weight mass still uncapped:
    // one metadata-sized aggregate, broadcast back via crossJoin
    val pools = base.agg(
      sum(when(col("__capped"), col("__raw") - col("__cap")).otherwise(0.0)).as("__surplus"),
      sum(when(!col("__capped"), col("weight")).otherwise(0.0)).as("__free_w"))
    base.crossJoin(broadcast(pools))
      .select(col("source"), col("n_tokens_avail"), col("weight"),
        floor(when(col("__capped"), col("__cap"))
          .otherwise(least(
            col("__raw") + when(col("__free_w") > 0,
              col("__surplus") * col("weight") / col("__free_w")).otherwise(0.0),
            col("__cap")))).cast("long").as("alloc_tokens"),
        col("__capped").as("capped"))
      .withColumn("epochs", round(
        col("alloc_tokens").cast("double") / col("n_tokens_avail"), 4))
      .select("source", "n_tokens_avail", "weight", "alloc_tokens",
        "epochs", "capped")
  }

  /** Plan with temperature-derived weights: counts tokens per source
    * with [[Text.tokens]] (one map-side-combined aggregate over the
    * corpus), weights ∝ n_tokens^T normalized (the [[Mixing]] rule on
    * token mass instead of doc count), then [[plan]]. */
  def planFromCorpus(corpus: DataFrame, sourceCol: String, textCol: String,
                     totalBudget: Long, temperature: Double = 0.7,
                     maxEpochs: Double = 4.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val counts = corpus.groupBy(col(sourceCol).as("source"))
      .agg(sum(size(Text.tokens(col(textCol)))).cast("long").as("n_tokens_avail"))
    val weights = counts
      .withColumn("__wt", pow(col("n_tokens_avail").cast("double"), temperature))
      .crossJoin(broadcast(
        counts.select(pow(col("n_tokens_avail").cast("double"), temperature).as("__w"))
          .agg(sum("__w").as("__tot"))))
      .select(col("source"), round(col("__wt") / col("__tot"), 6).as("weight"))
    plan(counts, weights, totalBudget, maxEpochs)
  }
}
