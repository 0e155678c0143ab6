package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flesch-style readability signals — the classic document-quality
  * lens alongside the Gopher/C4 heuristics already in
  * [[Text]]/[[Curation]]: reading-ease correlates with boilerplate and
  * generated slop, so curation pipelines gate or stratify on it.
  *
  * Syllables use the standard vowel-group approximation
  * (count of `[aeiouy]+` runs in the lowercased text): vowel runs never
  * span whitespace, so ONE regexp_count over the whole text equals the
  * per-word sum without tokenizing. Sentences count `[.!?]+` runs
  * (floored at 1). Everything is a codegen'd projection —
  * RE2-compatible patterns, the PII-scrub portability rule — and the
  * per-source rollup is one map-side-combined groupBy.
  */
object Readability {

  private def words(text: Column): Column =
    greatest(size(Text.tokens(text)), lit(1)).cast("double")

  private def sentences(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("double")

  private def syllables(text: Column): Column =
    greatest(regexp_count(lower(text), lit("[aeiouy]+")), lit(1))
      .cast("double")

  /** Per-document Flesch reading ease
    * (206.835 − 1.015·words/sentences − 84.6·syllables/words). */
  def fleschReadingEase(text: Column): Column =
    lit(206.835) - lit(1.015) * (words(text) / sentences(text)) -
      lit(84.6) * (syllables(text) / words(text))

  /** Per-source readability profile: doc count, mean words/sentence,
    * mean syllables/word, mean and min reading ease (6dp). */
  def readabilityProfile(docs: DataFrame, sourceCol: String,
                         textCol: String): DataFrame = {
    val t = col(textCol)
    docs.filter(t.isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(words(t) / sentences(t)), 6).as("mean_words_per_sentence"),
        round(avg(syllables(t) / words(t)), 6).as("mean_syllables_per_word"),
        round(avg(fleschReadingEase(t)), 6).as("mean_reading_ease"),
        round(min(fleschReadingEase(t)), 6).as("min_reading_ease"))
  }
}
