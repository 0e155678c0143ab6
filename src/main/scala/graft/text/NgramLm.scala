package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language model with Jelinek–Mercer interpolation — one rung
  * up from [[Text.unigramLm]] toward the 5-gram KenLM the CCNet recipe
  * scores with (Wenzek et al. 2020 use KenLM perplexity; the unigram/
  * bigram ladder is the engine-portable core of it; beyond the
  * reference's operator set — north-star scope).
  *
  *   P(w₂ | w₁) = λ · c(w₁w₂)/c(w₁)  +  (1−λ) · c(w₂)/N
  *
  * Scale shape: both count tables are one map-side-combined groupBy
  * over an explode of the REFERENCE corpus (bigrams are the n=2
  * shingle strings — the same staged-projection trick as MinHash);
  * scoring is two equi-joins on (bigram, then second word) + one
  * groupBy per document. The model side prunes with minCount, so the
  * joins broadcast when the reference vocabulary is small.
  */
object NgramLm {

  /** The interpolated bigram model from a reference corpus:
    * (bigram, w1, w2, c12, c1, p_big) with p_big = c12/c1, pruned to
    * bigrams seen ≥ minCount times. */
  def bigramLm(ref: DataFrame, textCol: String,
               minCount: Long = 2L): DataFrame = {
    val bg = ref
      .select(explode(Text.shingles(col(textCol), 2)).as("bigram"))
      // a sub-2-token document's "bigram" is its whole text (the
      // shingle fallback) — not a pair, drop it
      .filter(col("bigram").contains(" "))
      .groupBy("bigram").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val c1 = ref.select(explode(Text.tokens(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(c1, Seq("w1"))
      .select(col("bigram"), col("w1"), col("w2"), col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1")).as("p_big"))
  }

  /** Score every document by its mean interpolated bigram
    * log-probability under a model built from `ref` (higher = more
    * like the reference). Documents with fewer than two tokens have no
    * bigrams and are absent from the output. A position whose bigram
    * AND second word are both unseen scores `oovLogp`.
    * Returns (idCol, n_bigrams, avg_logp 4dp). */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  ref: DataFrame, minCount: Long = 2L,
                  lambda: Double = 0.7, oovLogp: Double = -20.0): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    val lm = bigramLm(ref, textCol, minCount)
      .select(col("bigram"), col("p_big"))
    // unigram probabilities as raw tf/N ratios (not ln-then-exp — the
    // interpolation sum wants probabilities, and a round-tripped exp
    // would cost cross-engine ulps); N totals the PRUNED vocabulary,
    // matching unigramLm's convention
    val vocab = ref.select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= minCount)
    val uni = vocab
      .crossJoin(broadcast(vocab.agg(sum("tf").as("__n"))))
      .select(col("term").as("w2"),
        (col("tf").cast("double") / col("__n")).as("p_uni"))
    docs
      .filter(size(Text.tokens(col(textCol))) >= 2)
      .select(col(idCol), explode(Text.shingles(col(textCol), 2)).as("bigram"))
      .join(lm, Seq("bigram"), "left")
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(uni, Seq("w2"), "left")
      .withColumn("__p",
        lit(lambda) * coalesce(col("p_big"), lit(0.0)) +
          lit(1.0 - lambda) * coalesce(col("p_uni"), lit(0.0)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(when(col("__p") > 0.0, log(col("__p")))
          .otherwise(lit(oovLogp))), 4).as("avg_logp"))
  }
}
