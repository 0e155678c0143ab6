package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents sharing
  * word n-grams with an evaluation/benchmark set (the GPT-3/PaLM-style
  * 13-gram decontamination check; beyond the reference's operator set
  * — north-star scope).
  *
  * Scale shape: both sides reduce to DISTINCT shingles before the
  * match, so the join is an equi-join on the shingle string — and the
  * benchmark side (eval suites are thousands of documents, not
  * billions) is explicitly broadcast, making the whole check one scan
  * + one broadcast-hash join over the corpus. No crossJoin at any
  * size; a corpus document's hit count is bounded by its own distinct
  * shingle count.
  */
object Contamination {

  /** One row per CONTAMINATED corpus document:
    * (idCol, n_hit_shingles — distinct shingles shared with any
    * benchmark doc, n_bench_docs — distinct benchmark docs hit,
    * n_shingles — the document's own distinct-shingle count,
    * hit_frac = n_hit_shingles / n_shingles, 4dp). Clean documents
    * don't appear — callers left-join when they need zeros. */
  def contaminated(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 13): DataFrame = {
    // single-pass codegen'd shingle expression (Signatures.wordShingles
    // ≡ array_distinct ∘ Text.shingles) — the HOF form re-tokenizes per
    // shingle inside its lambda, an O(tokens²) interpreted-mode trap the
    // MinHash path already dodged the same way. The distinct-shingle
    // count rides along from the same projection that feeds the explode.
    val docSh = corpus.select(col(idCol),
        graft.functions.Signatures.wordShingles(col(textCol), n).as("__shs"))
      .select(col(idCol), size(col("__shs")).cast("long").as("__n_sh"),
        explode(col("__shs")).as("__sh"))
    val benchSh = bench.select(col(benchIdCol).as("__bid"),
      explode(graft.functions.Signatures.wordShingles(col(benchTextCol), n)).as("__sh"))
    docSh.join(broadcast(benchSh), Seq("__sh"))
      .groupBy(col(idCol))
      // DISTINCT shingles: a shingle present in many bench docs is still
      // ONE shared shingle — counting join rows would let hit_frac
      // exceed 1.0 and break the maxHitFrac threshold
      .agg(countDistinct(col("__sh")).as("n_hit_shingles"),
        countDistinct(col("__bid")).as("n_bench_docs"),
        max(col("__n_sh")).as("n_shingles"))
      .withColumn("hit_frac",
        round(col("n_hit_shingles").cast("double") / col("n_shingles"), 4))
  }

  /** Decontaminated corpus: drop documents whose shared-shingle
    * fraction with the benchmark set reaches `maxHitFrac` — at or
    * above the threshold is dropped (0 = drop on ANY overlap).
    * Anti-join against [[contaminated]]. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchIdCol: String, benchTextCol: String,
                    n: Int = 13, maxHitFrac: Double = 0.0): DataFrame =
    corpus.join(
      contaminated(corpus, idCol, textCol, bench, benchIdCol, benchTextCol, n)
        .filter(col("hit_frac") >= maxHitFrac).select(col(idCol)),
      Seq(idCol), "left_anti")
}
