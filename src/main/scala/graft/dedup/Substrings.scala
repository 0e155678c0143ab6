package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring duplication detection — the ExactSubstr modality of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), which finds long verbatim overlaps that MinHash/SimHash
  * document-level signatures dilute away (a 200-token license block in
  * a 10k-token doc barely moves Jaccard but is exactly what a trainer
  * wants removed). The paper builds a corpus-wide suffix array; that is
  * a single-machine structure, so here the same guarantee comes from
  * anchor n-grams: any common substring of ≥ `minTokens` tokens
  * contains a full aligned `minTokens`-gram, so two documents sharing
  * one MUST share an anchor — detection is exact, not probabilistic.
  *
  * Scale shape: one staged tokenization (the HOF-lambda trap — see
  * Text.chunkDocuments), one posexplode to (doc, pos, md5(gram)) rows
  * (linear in corpus tokens; md5 keeps the join key fixed-width AND
  * engine-portable for the oracle), a document-frequency guard that
  * drops boilerplate grams before they can quadratically blow a join
  * bucket (the maxBucket analogue of the LSH paths), then one
  * hash-partitioned self-join on the gram key + a pair-level aggregate.
  * No suffix array, no driver state, no all-pairs product.
  */
object Substrings {

  /** Document pairs sharing at least `minShared` distinct exact
    * `minTokens`-token substrings: (id_a < id_b, n_shared, a_start,
    * a_end, b_start, b_end) where the spans are the 0-based token
    * positions covering every matched anchor in each document.
    *
    * `maxDocFreq` drops anchors present in more than that many documents
    * (licenses, headers): corpus-wide boilerplate is curation's job
    * (Curation/LineDedup), not pairwise dedup's, and keeping it would
    * make the hottest gram bucket O(corpus²). */
  def exactSubstringPairs(df: DataFrame, idCol: String, textCol: String,
                          minTokens: Int = 20, maxDocFreq: Int = 1000,
                          minShared: Long = 1L): DataFrame = {
    require(minTokens > 0, s"minTokens must be positive, got $minTokens")
    val k = minTokens
    val grams = df
      .select(col(idCol).as("id"), graft.text.Text.tokens(col(textCol)).as("__toks"))
      .select(col("id"), when(size(col("__toks")) >= k,
          transform(sequence(lit(0), size(col("__toks")) - k),
            i => md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))))
        .otherwise(array().cast("array<string>")).as("__g"))
      .select(col("id"), posexplode(col("__g")).as(Seq("pos", "g")))
    val keep = grams.groupBy("g").agg(countDistinct("id").as("__df"))
      .filter(col("__df") <= maxDocFreq).select("g")
    val kept = grams.join(keep, Seq("g"))
    val a = kept.select(col("g"), col("id").as("id_a"), col("pos").as("__pa"))
    val b = kept.select(col("g"), col("id").as("id_b"), col("pos").as("__pb"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct("g").as("n_shared"),
        min("__pa").cast("long").as("a_start"),
        (max("__pa") + k - 1).cast("long").as("a_end"),
        min("__pb").cast("long").as("b_start"),
        (max("__pb") + k - 1).cast("long").as("b_end"))
      .filter(col("n_shared") >= minShared)
  }

  /** Deduplicate by exact-substring clusters: pairs → connected
    * components → keep the canonical (min-id) document per cluster —
    * the same keep rule as every other dedup modality here. */
  def exactSubstringDedup(df: DataFrame, idCol: String, textCol: String,
                          minTokens: Int = 20, maxDocFreq: Int = 1000,
                          minShared: Long = 1L): DataFrame =
    Components.dedupByPairs(df, idCol,
      exactSubstringPairs(df, idCol, textCol, minTokens, maxDocFreq, minShared))
}
