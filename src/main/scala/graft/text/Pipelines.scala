package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FineWeb-style curation preset (Penedo et al. 2024, "The FineWeb
  * Datasets" — the published recipe: URL/boilerplate gates → C4 line
  * rules → quality heuristics → language ID → dedup → PII scrub),
  * composed from the operators already in the pack the way the
  * published pipeline chains them. [[Curation]] is the generic
  * funnel; this preset fixes the stage ORDER and hands every stage
  * after C4 the line-CLEANED text — the detail that makes the recipe
  * work (quality ratios over boilerplate-stripped text, dedup on the
  * canonical form).
  *
  * Scale shape: stages 1–4 are ONE codegen'd projection over the scan
  * (C4 rules, word/punct gates, stopword lang-ID, fingerprint all
  * compute per-row); the only shuffles are the fingerprint keeper
  * groupBy + id semi-join (exact-dedup's two-shuffle budget), and the
  * funnel is one aggregate on top. PII redaction is a projection on
  * the survivors.
  */
object Pipelines {

  /** Stage thresholds — defaults match the component operators'. */
  case class FinewebConfig(c4MinLineWords: Int = 5, c4MinSentences: Int = 3,
                           minWords: Int = 5, maxPunctRatio: Double = 0.3,
                           langs: Seq[String] = Seq("en"))

  private def punctRatio(t: Column): Column =
    length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
      greatest(length(t), lit(1))

  /** Every document (original columns intact) with its sequential stage
    * verdicts appended: c4_text, n_sentences, c4_pass, quality_pass,
    * lang_pred, lang_pass, fingerprint, pii_hit, kept. Later flags imply
    * earlier ones (funnel semantics); `kept` additionally requires being
    * the lowest-id keeper of the c4_text fingerprint among full passes.
    * `pii_hit` is informational (the recipe redacts, not drops). */
  def finewebAnnotate(docs: DataFrame, idCol: String, textCol: String,
                      cfg: FinewebConfig = FinewebConfig()): DataFrame = {
    val working = Seq("c4_text", "n_sentences", "c4_pass", "quality_pass",
      "lang_pred", "lang_pass", "fingerprint", "pii_hit", "kept", "__k")
    val clash = docs.columns.filter(working.contains)
    require(clash.isEmpty,
      s"input frame already has fineweb working column(s) ${clash.mkString(", ")} — rename or drop them first")
    // the [[C4.pageFilters]] rules inlined so the caller's OTHER columns
    // (source, metadata) ride through to the funnel's groupBy
    val c4 = docs
      .withColumn("c4_text", C4.cleanLines(col(textCol), cfg.c4MinLineWords))
      .withColumn("n_sentences", C4.sentenceCount(col("c4_text")))
      .withColumn("c4_pass",
        col("n_sentences") >= cfg.c4MinSentences &&
          !lower(col(textCol)).contains("lorem ipsum") &&
          !col(textCol).contains("{"))
    val t = col("c4_text")
    val flagged = c4
      .withColumn("quality_pass", col("c4_pass") &&
        size(Text.tokens(t)) >= cfg.minWords &&
        punctRatio(t) <= cfg.maxPunctRatio)
      .withColumn("lang_pred", Text.langId(t))
      .withColumn("lang_pass",
        col("quality_pass") && col("lang_pred").isin(cfg.langs: _*))
      .withColumn("fingerprint", Text.fingerprint(t))
      .withColumn("pii_hit", Scrub.hasPii(t))
    val keepers = flagged.filter(col("lang_pass"))
      .groupBy("fingerprint").agg(min(col(idCol)).as("__keeper"))
    flagged
      .join(keepers.select(col("__keeper").as(idCol), lit(true).as("__k")),
        Seq(idCol), "left")
      .withColumn("kept", col("lang_pass") && coalesce(col("__k"), lit(false)))
      .drop("__k")
  }

  /** The curated corpus: survivors of every stage, with `text` = the
    * line-cleaned, PII-REDACTED form (the recipe ships redacted text,
    * it does not drop PII documents). Returns (idCol, text). */
  def fineweb(docs: DataFrame, idCol: String, textCol: String,
              cfg: FinewebConfig = FinewebConfig()): DataFrame =
    finewebAnnotate(docs, idCol, textCol, cfg)
      .filter(col("kept"))
      .select(col(idCol), Scrub.redact(col("c4_text")).as("text"))

  /** Per-group funnel accounting — the per-source numbers the recipe's
    * paper reports at each stage: input, C4 survivors, quality
    * survivors, language survivors, final kept, and PII hits among
    * kept. One aggregate over [[finewebAnnotate]]. */
  def finewebFunnel(docs: DataFrame, idCol: String, textCol: String,
                    groupCol: String,
                    cfg: FinewebConfig = FinewebConfig()): DataFrame =
    finewebAnnotate(docs, idCol, textCol, cfg)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_input"),
        sum(col("c4_pass").cast("long")).as("n_c4"),
        sum(col("quality_pass").cast("long")).as("n_quality"),
        sum(col("lang_pass").cast("long")).as("n_lang"),
        sum(col("kept").cast("long")).as("n_kept"),
        sum((col("kept") && col("pii_hit")).cast("long")).as("n_pii_kept"))
}
