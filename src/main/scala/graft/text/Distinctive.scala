package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source distinctive vocabulary via log-odds with a Dirichlet
  * prior (Monroe, Colaresi & Quinn 2008, "Fightin' Words") — the
  * corpus-comparison read-out a curation pipeline uses to see WHAT a
  * source over-represents before weighting it (complements the DSIR
  * importance weights, which hash terms into buckets and can't name
  * them).
  *
  * Scale shape: token counts are the [[Text.vocabulary]] two-stage
  * groupBy (per-doc combine first, so the wide shuffle carries
  * (source, term) rows, not tokens); per-source totals and the vocab
  * size are metadata aggregates broadcast back; z-scores are a pure
  * projection over the (source, term) count table; the final top-k is
  * a window PARTITIONED by source. Nothing all-pairs, nothing
  * single-partition.
  */
object Distinctive {

  /** Returns the `topK` highest-z terms per source:
    * (source, term, n_source, n_rest, log_odds, z). Terms with fewer
    * than `minCount` in-source occurrences are gated out before
    * ranking. `priorWeight` is the per-term pseudo-count α. */
  def distinctiveTerms(docs: DataFrame, sourceCol: String, textCol: String,
                       topK: Int = 5, minCount: Long = 5L,
                       priorWeight: Double = 0.5): DataFrame = {
    val perSource = docs
      .select(col(sourceCol).as("source"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("y_sw"))
      .localCheckpoint(true)
    val perTerm = perSource.groupBy("term").agg(sum("y_sw").as("y_w"))
    val totals = perSource.groupBy("source").agg(sum("y_sw").as("n_s"))
    val corpus = perSource.agg(sum("y_sw").as("n"),
      count_distinct(col("term")).as("v"))
    val a = lit(priorWeight)
    val scored = perSource
      .join(perTerm, "term")
      .join(broadcast(totals), "source")
      .crossJoin(broadcast(corpus))
      .withColumn("__a0", col("v") * a)
      .withColumn("__yr", col("y_w") - col("y_sw"))
      .withColumn("__nr", col("n") - col("n_s"))
      .withColumn("__lo",
        log((col("y_sw") + a) /
            (col("n_s") + col("__a0") - col("y_sw") - a)) -
        log((col("__yr") + a) /
            (col("__nr") + col("__a0") - col("__yr") - a)))
      // rank on the 6dp-ROUNDED z with a term tiebreak: a last-ulp
      // float divergence between engines cannot reorder the cut
      .withColumn("__z", round(col("__lo") /
        sqrt(lit(1.0) / (col("y_sw") + a) + lit(1.0) / (col("__yr") + a)), 6))
    val w = Window.partitionBy("source")
      .orderBy(col("__z").desc, col("term"))
    val out = scored
      .filter(col("y_sw") >= minCount)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("source"), col("term"), col("y_sw").as("n_source"),
        col("__yr").as("n_rest"), round(col("__lo"), 6).as("log_odds"),
        col("__z").as("z"))
      .localCheckpoint(true)
    perSource.unpersist()
    out
  }

  /** Per-source lexical-richness profile: token volume, vocabulary
    * size, type-token ratio, hapax-legomenon share, and length-weighted
    * mean token length — the vocabulary-health cut of the corpus
    * report (a source whose TTR collapses is template spam; one whose
    * hapax share explodes is OCR noise). Same two-stage vocabulary
    * groupBy as [[distinctiveTerms]]; the profile is one aggregate of
    * the (source, term) count table plus a doc-count join. Returns
    * (source, n_docs, n_tokens, n_types, ttr, hapax_frac,
    * mean_token_len). */
  def lexicalRichness(docs: DataFrame, sourceCol: String,
                      textCol: String): DataFrame = {
    val perSource = docs
      .select(col(sourceCol).as("source"),
        explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    val nDocs = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    perSource.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("__hapax"),
        sum(length(col("term")) * col("c")).as("__len"))
      .join(broadcast(nDocs), "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_types"),
        round(col("n_types") / col("n_tokens").cast("double"), 6)
          .as("ttr"),
        round(col("__hapax") / col("n_types").cast("double"), 6)
          .as("hapax_frac"),
        round(col("__len") / col("n_tokens").cast("double"), 6)
          .as("mean_token_len"))
  }
}
