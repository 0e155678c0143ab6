package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * one MUST share an anchor — detection is exact, not probabilistic
  * (anchor keys are 128-bit hashes; collision odds are 2⁻¹²⁸ per pair).
  *
  * Scale shape: one codegen'd pass emits position-ordered anchor hashes
  * (functions/Signatures.positionalGramHashes — no interpreted HOF
  * re-slicing), posexplode to (doc, pos, anchor) rows (linear in corpus
  * tokens), then a document-frequency gate that keeps ONLY anchors with
  * 2 ≤ df ≤ `maxDocFreq`: df=1 anchors (the overwhelming majority of a
  * real corpus) cannot form a pair and never reach the join, and
  * df > maxDocFreq boilerplate (licenses, headers) is dropped before it
  * can quadratically blow a join bucket — the maxBucket analogue of the
  * LSH paths. What remains is one hash-partitioned self-join on the
  * anchor key + a pair-level aggregate. No suffix array, no driver
  * state, no all-pairs product.
  */
object Substrings {

  /** (id, pos, g) anchor occurrences for anchors passing the
    * 2 ≤ doc-frequency ≤ maxDocFreq gate. */
  private def sharedAnchors(df: DataFrame, idCol: String, textCol: String,
                            minTokens: Int, maxDocFreq: Int): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"),
        posexplode(graft.functions.Signatures
          .positionalGramHashes(col(textCol), minTokens)).as(Seq("pos", "g")))
    val keep = grams.groupBy("g").agg(countDistinct("id").as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDocFreq).select("g")
    grams.join(keep, Seq("g"))
  }

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
    val kept = sharedAnchors(df, idCol, textCol, minTokens, maxDocFreq)
    val a = kept.select(col("g"), col("id").as("id_a"), col("pos").as("__pa"))
    val b = kept.select(col("g"), col("id").as("id_b"), col("pos").as("__pb"))
    a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct("g").as("n_shared"),
        min("__pa").cast("long").as("a_start"),
        (max("__pa") + minTokens - 1).cast("long").as("a_end"),
        min("__pb").cast("long").as("b_start"),
        (max("__pb") + minTokens - 1).cast("long").as("b_end"))
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

  /** Span-level removal — the half of Lee et al.'s ExactSubstr that CUTS
    * the duplicated run instead of dropping the whole document (their
    * actual procedure: keep one occurrence, excise the rest). The
    * canonical (lowest-id) occurrence of every shared anchor keeps its
    * text; every other document drops the tokens its shared anchors
    * cover. Output: (idCol, textCol, n_removed_tokens) for EVERY input
    * document — untouched docs pass through with their original text and
    * n_removed_tokens = 0; cleaned docs are rebuilt from the surviving
    * tokens (whitespace normalized to single spaces, the same
    * normalization tokenization itself applies).
    *
    * Scale shape: anchor spans per victim doc aggregate through a
    * per-doc interval merge (a window over each doc's own spans —
    * partition-local, spans-per-doc sized, never corpus-wide), and token
    * filtering is a posexplode + per-doc range anti-join + re-aggregate:
    * every step is keyed by doc id, so it shuffles linearly in corpus
    * tokens with no all-pairs stage. */
  def removeSharedSpans(df: DataFrame, idCol: String, textCol: String,
                        minTokens: Int = 20, maxDocFreq: Int = 1000): DataFrame = {
    val anchors = sharedAnchors(df, idCol, textCol, minTokens, maxDocFreq)
    // canonical occurrence per anchor = min doc id; every LATER doc's
    // occurrence is a span to cut
    val canon = Window.partitionBy("g")
    val spans = anchors
      .withColumn("__min_id", min("id").over(canon))
      .filter(col("id") =!= col("__min_id"))
      .select(col("id"), col("pos").as("s"),
        (col("pos") + minTokens - 1).as("e"))
    // merge overlapping/adjacent intervals per doc: running max of e over
    // the doc's spans in start order; a gap (s > maxE of everything
    // before) starts a new island
    val byDoc = Window.partitionBy("id").orderBy("s", "e")
    val prevMax = max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val merged = spans
      .withColumn("__new", when(prevMax.isNull || col("s") > prevMax + 1, 1).otherwise(0))
      .withColumn("__island", sum("__new").over(byDoc))
      .groupBy("id", "__island")
      .agg(min("s").as("s"), max("e").as("e"))
      .select("id", "s", "e")
    // per-token verdict: posexplode the doc's tokens, anti-join positions
    // covered by a merged interval of the SAME doc (equi-key id + range
    // predicate — each doc meets only its own intervals)
    val toks = df.select(col(idCol).as("id"),
      posexplode(graft.text.Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    val survivors = toks.join(merged,
        toks("id") === merged("id") &&
          col("pos") >= col("s") && col("pos") <= col("e"), "left_anti")
    val rebuilt = survivors.groupBy("id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("tok"))))
          .getField("tok")).as("__clean"),
        count(lit(1)).as("__kept"))
    val nToks = df.select(col(idCol).as("id"),
      size(graft.text.Text.tokens(col(textCol))).cast("long").as("__n"))
    df.join(nToks, df(idCol) === nToks("id"))
      .join(rebuilt, df(idCol) === rebuilt("id"), "left")
      .select(df(idCol),
        when(col("__n") - coalesce(col("__kept"), lit(0L)) > 0,
            coalesce(col("__clean"), lit("")))
          .otherwise(df(textCol)).as(textCol),
        (col("__n") - coalesce(col("__kept"), lit(0L))).as("n_removed_tokens"))
  }
}
