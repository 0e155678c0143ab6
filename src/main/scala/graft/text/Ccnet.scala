package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.transforms.Transforms

/** CCNet-style perplexity partitioning (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"
  * §3): score every document against a trusted-corpus language model,
  * split the corpus into head / middle / tail by perplexity, and keep
  * each band at its own rate — the standard quality ladder a web-crawl
  * training pipeline applies after URL and heuristic gates (beyond the
  * reference's operator set — north-star scope).
  *
  * Composition, not new machinery: the LM is [[Text.unigramLm]], the
  * score is [[Text.lmScore]], the band edges are ONE exact-percentile
  * aggregate ([[Transforms.quantileSplitRanged]] — no global sort, no
  * single-partition window), and the keep-decision is the same
  * deterministic md5 draw as [[Mixing.hashKeep]]. At 100 TB the whole
  * operator is: one scoring join + one metadata-sized edge aggregate +
  * one codegen'd filter scan.
  *
  * Band cuts are QUARTILES (head = best 25%, middle = 50%, tail =
  * worst 25%) rather than the paper's terciles: quartile probabilities
  * are exact binary fractions, so the interpolated edges are
  * bit-identical across engines — tercile rank arithmetic (0.333…)
  * is not, and a document sitting exactly on an edge could flip bands
  * between engines. Same ladder, deterministic everywhere.
  */
object Ccnet {

  /** Perplexity proxy from a mean-log-prob column: exp(−avg_logp),
    * rounded to 4dp (lower = closer to the reference corpus). */
  def perplexity(avgLogp: Column): Column =
    round(exp(-avgLogp), 4)

  /** Band assignment over a scored frame (the output shape of
    * [[Text.lmScore]]): adds `perplexity` and `band` ∈
    * head | middle | tail. Head is the LOW-perplexity quartile. */
  def perplexityBands(scored: DataFrame, logpCol: String = "avg_logp",
                      exact: Boolean = true): DataFrame = {
    val pp = scored.withColumn("perplexity", perplexity(col(logpCol)))
    Transforms.quantileSplitRanged(pp, "perplexity", 4, exact = exact)
      .withColumn("band",
        when(col("quantile") === 1, "head")
          .when(col("quantile") === 4, "tail")
          .otherwise("middle"))
      .drop("quantile")
  }

  /** Banded corpus sampled at per-band rates (CCNet keeps the head,
    * thins the middle, mostly drops the tail). The draw is
    * [[Mixing.hashKeep]] on `idCol` — deterministic, engine-portable,
    * re-run-stable. Fractions outside [0,1] are clamped by hashKeep's
    * ≥1 short-circuit. */
  def sampleBands(banded: DataFrame, idCol: String,
                  headFrac: Double = 1.0, middleFrac: Double = 0.5,
                  tailFrac: Double = 0.1): DataFrame = {
    val frac = when(col("band") === "head", headFrac)
      .when(col("band") === "tail", tailFrac)
      .otherwise(middleFrac)
    banded.filter(Mixing.hashKeep(col(idCol), frac))
  }

  /** The full ladder in one call: train the LM on `ref`, score `docs`,
    * band, sample. Returns (idCol, n_tokens, avg_logp, perplexity,
    * band) for the surviving documents. */
  def curate(docs: DataFrame, ref: DataFrame, idCol: String,
             textCol: String, minCount: Long = 1L, oovLogp: Double = -20.0,
             headFrac: Double = 1.0, middleFrac: Double = 0.5,
             tailFrac: Double = 0.1): DataFrame = {
    val lm = Text.unigramLm(ref, idCol, textCol, minCount)
    val scored = Text.lmScore(docs, idCol, textCol, lm, oovLogp)
    sampleBands(perplexityBands(scored), idCol, headFrac, middleFrac, tailFrac)
  }
}
