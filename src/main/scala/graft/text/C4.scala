package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the Limits
  * of Transfer Learning…" §2.2 — the Colossal Clean Crawled Corpus rules).
  * Beyond-reference training-data operator (SURVEY §2.12): the classic
  * line- and page-level English web-text filters, distinct from the
  * Gopher repetition gates ([[Curation]]) and the stopword/punct quality
  * signals ([[Text.qualitySignals]]) already in the pack.
  *
  * Every rule is a pure codegen'd column expression (split / filter /
  * rlike / length) — one projection over the corpus, no shuffle, no UDF —
  * and is expressible in ANSI-ish SQL, so the whole operator is
  * oracle-checked cell-exact (q120), not rows-only.
  *
  * Scale shape at 100 TB: embarrassingly parallel per-document work; the
  * only cost is the scan. Filters on the RESULT (`c4_pass`) stay pushable
  * because the flags are plain boolean columns.
  */
object C4 {

  /** Line-level C4 rules: keep only lines that (a) end in a terminal
    * punctuation mark (period/!/?/closing quote — the paper's rule),
    * (b) carry at least `minLineWords` words, and (c) do not mention
    * "javascript" (the paper's boilerplate tell). Returns the cleaned
    * page text (kept lines re-joined with newlines). */
  def cleanLines(text: Column, minLineWords: Int = 5): Column =
    array_join(
      filter(split(text, "\n"), l =>
        trim(l).rlike("[.!?\"']$") &&
          size(split(trim(l), "\\s+")) >= minLineWords &&
          !lower(l).contains("javascript")),
      "\n")

  /** Terminal-punctuation count of `text` — the deterministic
    * cross-engine sentence proxy (true sentence splitting is
    * tokenizer-specific; counting [.!?] is exact on every engine). */
  def sentenceCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?]", "")).cast("long")

  /** Page-level verdicts over the line-cleaned text: at least
    * `minSentences` sentences survive, no "lorem ipsum" placeholder, no
    * curly brace (the paper's code-page tell — "{" almost never appears
    * in prose). Returns (idCol, c4_text, n_sentences, c4_pass). */
  def pageFilters(df: DataFrame, idCol: String, textCol: String,
                  minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val cleaned = cleanLines(col(textCol), minLineWords)
    df.select(
      col(idCol),
      cleaned.as("c4_text"),
      sentenceCount(cleaned).as("n_sentences"),
      (sentenceCount(cleaned) >= minSentences &&
        !lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{")).as("c4_pass"))
  }
}
