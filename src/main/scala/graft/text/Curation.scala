package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end document-curation funnel for training-data pipelines
  * (beyond the reference's operator set — north-star scope; the per-
  * stage pieces are the q29-q31/q27 operators, this composes them the
  * way a corpus-ingest job actually runs them).
  *
  * Stages, applied sequentially (a document must pass every earlier
  * stage to be considered by the next, like a real ingest funnel):
  *   1. quality gate — minimum word count + maximum punctuation ratio
  *   2. language gate — [[Text.langId]] ∈ the allowed set
  *   3. exact dedup   — first occurrence (lowest id) per normalized-
  *      text fingerprint AMONG gate survivors
  *
  * Scale shape: [[annotate]] is one codegen'd projection (all text
  * signals in a single scan) + one fingerprint groupBy + one join on
  * the id — the same two-shuffle budget as exact dedup alone; the
  * funnel report is one aggregate on top. No windows, no UDFs.
  */
object Curation {

  /** Gate thresholds; defaults are the usual cheap-corpus settings.
    * The Gopher-style repetition gates (`maxDupLineFrac`,
    * `maxTopNgramFrac` over 2-grams) are OPT-IN: at their default 1.0
    * they are compiled out entirely, leaving the original two-signal
    * quality gate (and its plan) untouched. */
  case class Config(minWords: Int = 5, maxPunctRatio: Double = 0.3,
                    langs: Seq[String] = Seq("en"),
                    maxDupLineFrac: Double = 1.0,
                    maxTopNgramFrac: Double = 1.0,
                    lineWidth: Int = 32)

  private def punctRatio(t: Column): Column =
    length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") /
      greatest(length(t), lit(1))

  /** The STATELESS stage flags — one codegen'd projection appending
    * `quality_pass`, `lang_pred`, `lang_pass`, `fingerprint`. Works on
    * batch and streaming frames alike (no shuffle, no state); the
    * keeper election on top is [[annotate]]'s batch-only join. */
  def gateFlags(docs: DataFrame, textCol: String,
                cfg: Config = Config()): DataFrame = {
    // same guard CrossFold.run puts on its 'fold' column: a pre-existing
    // working column would be silently overwritten and returned to the
    // caller holding the funnel's internals instead of their data
    val working = Seq("quality_pass", "lang_pred", "lang_pass",
      "fingerprint", "kept", "__k")
    val clash = docs.columns.filter(working.contains)
    require(clash.isEmpty,
      s"input frame already has curation working column(s) ${clash.mkString(", ")} — rename or drop them first")
    val t = col(textCol)
    // each repetition gate compiles in INDEPENDENTLY — enabling only the
    // dup-line gate must not pay the O(distinct×total) top-ngram scan
    // for a vacuous `<= 1.0` predicate (and vice versa)
    val gates = Seq(
      Some(size(Text.tokens(t)) >= cfg.minWords &&
        punctRatio(t) <= cfg.maxPunctRatio),
      if (cfg.maxDupLineFrac < 1.0)
        Some(Text.dupLineFraction(Text.charChunks(t, cfg.lineWidth)) <= cfg.maxDupLineFrac)
      else None,
      if (cfg.maxTopNgramFrac < 1.0)
        Some(Text.topNgramFraction(t, 2) <= cfg.maxTopNgramFrac)
      else None).flatten
    docs
      .withColumn("quality_pass", gates.reduce(_ && _))
      .withColumn("lang_pred", Text.langId(t))
      .withColumn("lang_pass",
        col("quality_pass") && col("lang_pred").isin(cfg.langs: _*))
      .withColumn("fingerprint", Text.fingerprint(t))
  }

  /** Every input row with its stage verdicts:
    * `quality_pass`, `lang_pred`, `lang_pass` (quality AND language),
    * `fingerprint`, and `kept` (passed every gate and is its
    * fingerprint group's keeper). */
  def annotate(docs: DataFrame, idCol: String, textCol: String,
               cfg: Config = Config()): DataFrame = {
    val flagged = gateFlags(docs, textCol, cfg)
    val keepers = flagged.filter(col("lang_pass"))
      .groupBy("fingerprint").agg(min(col(idCol)).as("__keeper"))
    flagged
      .join(keepers.select(col("__keeper").as(idCol), lit(true).as("__k")),
        Seq(idCol), "left")
      .withColumn("kept", col("lang_pass") && coalesce(col("__k"), lit(false)))
      .drop("__k")
  }

  /** The curated corpus: rows that pass every gate, original columns. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol, cfg)
      .filter(col("kept"))
      .select(docs.columns.map(col): _*)

  /** Per-group funnel report: input rows, survivors of each gate, and
    * the final kept count — the numbers a pipeline owner tracks per
    * source/shard. One aggregate over [[annotate]]. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             groupCol: String, cfg: Config = Config()): DataFrame =
    annotate(docs, idCol, textCol, cfg)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_input"),
        sum(col("quality_pass").cast("long")).as("n_quality"),
        sum(col("lang_pass").cast("long")).as("n_lang"),
        sum(col("kept").cast("long")).as("n_kept"))
}
