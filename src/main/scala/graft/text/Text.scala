package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operator pack for large-scale training-data pipelines
  * (beyond the reference's operator set — north-star scope).
  *
  * Everything is built from codegen'd built-in functions (split,
  * regexp_extract_all, higher-order array functions) — no UDFs — so all
  * operators stay inside whole-stage codegen and scale linearly with a
  * single scan per table.
  */
object Text {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** BPE-ish token count: word pieces + standalone punctuation
    * (regex `\w+|[^\w\s]`), the usual pre-tokenizer shape.
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Whitespace word count. */
  def wordCount(text: Column): Column = size(tokens(text))

  /** Corpus vocabulary: one row per distinct term with its total count
    * (`tf`) and document frequency (`df`) — the vocab-building pre-pass
    * of a tokenizer-training pipeline. ONE explode + two stacked
    * groupBys: the per-(doc, term) aggregate map-side-combines the
    * explosion, so the wide shuffle carries one row per distinct
    * (doc, term), not one per token. `minCount` prunes the long tail
    * before it reaches the caller. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 1L): DataFrame =
    df.select(col(idCol).as("__doc"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("__doc", "term").agg(count(lit(1)).as("__c"))
      .groupBy("term")
      .agg(sum("__c").as("tf"), count(lit(1)).as("df"))
      .filter(col("tf") >= minCount)

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Small fixed lists — become array literals in the plan.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "que", "por", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "zu", "von", "mit"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(toks: Column, lang: String): Column = {
    val sw = array(stopwords(lang).map(lit): _*)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
  }

  /** Language-ID heuristic: argmax of per-language stopword-hit ratio,
    * "und" (undetermined) when no list hits. Deterministic tiebreak by
    * language code order.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(stopwordRatio(toks, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality metrics: char len, word count, mean word length, punctuation
    * ratio, uppercase ratio, stopword(en) ratio — the usual cheap document
    * quality signals, one row per document, one scan.
    */
  def qualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len",
        round(when(size(toks) === 0, 0.0)
          .otherwise(aggregate(toks, lit(0.0), (a, x) => a + length(x)) / size(toks)), 4))
      .withColumn("punct_ratio",
        round(length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
          greatest(length(t), lit(1)), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(toks, "en"), 4))
      .drop(textCol)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text.
    * Stable across engines (md5 is md5) → usable as an exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles (n consecutive tokens joined by space,
    * duplicates kept). Single-pass codegen expression — the
    * transform(sequence(…)) HOF form re-ran the tokenizer inside its
    * lambda once per emitted shingle (O(tokens²), the Dsir/q134
    * lesson). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Signatures.wordNgrams(text, n)

  /** Fixed-width character chunks of `text` (last chunk ragged) — the
    * generic "lines" splitter when a corpus has no newlines, and the
    * unit for line-level repetition/dedup below. Empty text → one
    * empty chunk (so downstream `size` is never 0-ambiguous). */
  def charChunks(text: Column, width: Int): Column = {
    require(width > 0, s"charChunks width must be positive, got $width")
    transform(
      sequence(lit(1), greatest(ceil(length(text).cast("double") / width), lit(1)).cast("int")),
      i => text.substr((i - 1) * width + 1, lit(width)))
  }

  /** Fraction of lines that are repeats of an earlier line within the
    * SAME document (Gopher/MassiveText `duplicate_line_fraction`):
    * `(n_lines - n_distinct_lines) / n_lines`. Pure array math — one
    * codegen'd projection. */
  def dupLineFraction(lines: Column): Column =
    when(size(lines) <= 0, 0.0)
      .otherwise((size(lines) - size(array_distinct(lines))).cast("double") / size(lines))

  /** Fraction of a document's word n-grams accounted for by its single
    * most frequent n-gram (Gopher `top_ngram_fraction`) — high values
    * flag boilerplate/keyword-stuffed pages. A document with fewer
    * than n tokens HAS no n-gram to repeat → 0.0 (shingles degenerates
    * to one whole-text shingle there, which would read as 1.0 and make
    * any threshold gate silently drop every short document). Per-row
    * HOF scan: O(distinct × total) comparisons within the row, no
    * shuffle. */
  def topNgramFraction(text: Column, n: Int): Column = {
    val sh = shingles(text, n)
    val top = array_max(transform(array_distinct(sh),
      s => size(filter(sh, x => x === s))))
    when(size(tokens(text)) < n, 0.0)
      .otherwise(top.cast("double") / size(sh))
  }

  /** Per-document repetition signals (the Gopher repetition-filter
    * family): duplicate-line fraction over `lineWidth`-char chunks,
    * top 2-gram and top 3-gram fractions. One codegen'd scan. */
  def repetitionSignals(df: DataFrame, textCol: String,
                        lineWidth: Int = 32): DataFrame = {
    val t = col(textCol)
    df.withColumn("dup_line_frac",
        round(dupLineFraction(charChunks(t, lineWidth)), 4))
      .withColumn("top_2gram_frac", round(topNgramFraction(t, 2), 4))
      .withColumn("top_3gram_frac", round(topNgramFraction(t, 3), 4))
  }

  /** Sliding token windows of `size` tokens advancing by `stride`
    * (stride < size ⇒ overlap) — the retrieval-chunking shape: each
    * window rejoined with spaces. The last window is ragged; a doc
    * shorter than `size` yields one window (its whole text). Pure
    * array math on the staged token array. */
  def slidingWindows(toks: Column, size: Int, stride: Int): Column = {
    require(size > 0 && stride > 0,
      s"window size and stride must be positive, got size=$size stride=$stride")
    val n = org.apache.spark.sql.functions.size(toks)
    // number of windows: 1 + ceil(max(0, n - size) / stride)
    val extra = greatest(n - size, lit(0))
    val count = lit(1) + ceil(extra.cast("double") / stride).cast("int")
    transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(size))))
  }

  /** One row per chunk with provenance — the RAG-indexing explode:
    * (idCol, chunk_id, chunk_text, n_chunk_tokens). The token array is
    * STAGED as its own projection before [[slidingWindows]] consumes it
    * — the window lambda references its input per element, and an
    * inlined `tokens(text)` would re-tokenize the document once per
    * window (the HOF-lambda trap; the multi-reference keeps
    * CollapseProject from undoing the staging). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     size: Int, stride: Int): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), slidingWindows(col("__toks"), size, stride).as("__w"))
      .select(col(idCol), posexplode(col("__w")).as(Seq("chunk_id", "chunk_text")))
      .withColumn("n_chunk_tokens", org.apache.spark.sql.functions.size(tokens(col("chunk_text"))))

  /** Unigram language model from a REFERENCE corpus: one row per term
    * with its log-probability `logp = ln(tf / total_tokens)` — the
    * frequency table behind the CCNet-style "perplexity against a
    * trusted corpus" quality filter. Built on [[vocabulary]] (one
    * explode, map-side-combined); `minCount` prunes the long tail,
    * which both shrinks the scoring join AND acts as the OOV floor.
    * Returns (term, tf, logp). */
  def unigramLm(ref: DataFrame, idCol: String, textCol: String,
                minCount: Long = 1L): DataFrame = {
    val vocab = vocabulary(ref, idCol, textCol, minCount)
    vocab.crossJoin(broadcast(vocab.agg(sum("tf").as("__total"))))
      .select(col("term"), col("tf"),
        log(col("tf").cast("double") / col("__total")).as("logp"))
  }

  /** Score every document by its mean token log-probability under `lm`
    * (higher = more like the reference corpus; the usual keep-threshold
    * filter). Tokens absent from the LM contribute `oovLogp` — set it
    * near the LM's own floor, or harsher to punish gibberish. One
    * explode + one equi-join on term (the LM side prunes with its
    * minCount; AQE broadcasts it when small) + one groupBy.
    * Returns (idCol, n_tokens, avg_logp rounded to 4dp). */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              lm: DataFrame, oovLogp: Double = -20.0): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .join(lm.select(col("term"), col("logp")), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(coalesce(col("logp"), lit(oovLogp))), 4).as("avg_logp"))
}
