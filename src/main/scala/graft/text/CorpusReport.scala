package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-call corpus health report, per source: the numbers a pipeline
  * owner tracks on every ingest (beyond the reference's operator set —
  * north-star scope; the corpus-level sibling of the per-artifact
  * `column_stats` pack).
  *
  * Columns: n_docs, n_tokens (whitespace words), n_null (null/empty
  * text), n_en (language-ID hits), n_dup (docs beyond the first per
  * exact fingerprint WITHIN the source), n_pii (docs with any PII
  * match), avg_words (2dp).
  *
  * Scale shape: one codegen'd projection computes every per-document
  * signal in a single scan; ONE groupBy(source) aggregate produces the
  * report, with the dup count folded in as countDistinct(fingerprint)
  * — no join, no second pass. Null-text docs count 0 tokens, never
  * null-poison the sums.
  */
object CorpusReport {

  def report(docs: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val t = col(textCol)
    val flagged = docs.select(
      col(sourceCol).as("source"),
      coalesce(Text.wordCount(t).cast("long"), lit(0L)).as("__w"),
      (t.isNull || length(t) === 0).cast("long").as("__null"),
      (Text.langId(t) === "en").cast("long").as("__en"),
      // null text → "" fingerprint, so null/empty docs dedup against
      // each other instead of vanishing from countDistinct
      coalesce(Text.fingerprint(t), lit("")).as("__fp"),
      Scrub.hasPii(t).cast("long").as("__pii"))
    flagged.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__w").as("n_tokens"),
        sum("__null").as("n_null"),
        sum("__en").as("n_en"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("n_dup"),
        sum("__pii").as("n_pii"),
        round(avg("__w"), 2).as("avg_words"))
  }
}
