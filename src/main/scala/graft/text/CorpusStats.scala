package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-composition statistics beyond per-document signals (beyond
  * the reference's operator set — north-star scope): n-gram novelty
  * per document and the Zipf rank-frequency slope per corpus slice —
  * the two diagnostics a data team reads before deciding what another
  * crawl increment is worth.
  */
object CorpusStats {

  /** Per-document n-gram NOVELTY under first-seen attribution: a
    * document's distinct shingles are "novel" iff no earlier document
    * (lower id) contains them. Returns (idCol, n_shingles, n_novel,
    * novelty = n_novel / n_shingles, 4dp). The head of a crawl scores
    * ~1; a late near-copy scores ~0 — the marginal-value curve of a
    * data source is the novelty trend over ingest order.
    *
    * Scale shape: one explode to DISTINCT (id, shingle), one groupBy
    * per shingle for its first-seen id (map-side-combined min), one
    * equi-join back on the shingle, one groupBy per document. No
    * all-pairs anything; the shingle frequency table is the shuffle
    * unit, exactly like [[Text.vocabulary]]. */
  def ngramNovelty(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
        explode(graft.functions.Signatures.wordShingles(col(textCol), n)).as("__sh"))
      .distinct()
    val firstSeen = sh.groupBy("__sh").agg(min(col(idCol)).as("__first"))
    sh.join(firstSeen, Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col(idCol) === col("__first")).cast("long")).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
  }

  /** Zipf rank-frequency diagnostics per corpus slice: fit
    * log(freq) = a + b·log(rank) by least squares over the term
    * frequency table and report the slope b (natural text ≈ −1;
    * template/boilerplate-heavy slices flatten, synthetic word soup
    * steepens), plus vocab size and token count.
    * Returns (groupCol, n_terms, n_tokens, zipf_slope 4dp).
    *
    * Scale shape: term frequencies are one map-side-combined groupBy;
    * ranks come from a window PARTITIONED BY the slice (each slice's
    * vocabulary is bounded — the window never sees the corpus, only
    * a slice's term table); the regression is a closed-form aggregate.
    * Rank ties break by term for determinism. */
  def zipfSlope(docs: DataFrame, groupCol: String, textCol: String,
                minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(groupCol), explode(Text.tokens(col(textCol))).as("__t"))
      .groupBy(col(groupCol), col("__t")).agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= minCount)
    val ranked = tf.withColumn("__r",
      row_number().over(Window.partitionBy(col(groupCol))
        .orderBy(desc("__f"), asc("__t"))))
    val x = log(col("__r").cast("double"))
    val y = log(col("__f").cast("double"))
    ranked.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__f")).as("n_tokens"),
        // slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        round(
          (count(lit(1)) * sum(x * y) - sum(x) * sum(y)) /
            (count(lit(1)) * sum(x * x) - sum(x) * sum(x)), 4)
          .as("zipf_slope"))
  }
}
