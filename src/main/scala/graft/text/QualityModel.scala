package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the GPT-3 /
  * LLaMA data pipelines (Brown et al. 2020 appendix A; Touvron et al.
  * 2023): train a linear classifier to separate a trusted "reference"
  * corpus (wiki/books) from raw crawl, score every document, and keep a
  * document when a Pareto draw exceeds 1 − score, so high-quality docs
  * are kept almost surely while low-quality docs retain a long-tail
  * chance (preserving distributional coverage instead of hard
  * thresholding).
  *
  * Spark-first shape: features are a hashed bag of tokens (HashingTF —
  * the hashing trick, no vocabulary state, executor-local), the
  * estimator is MLlib LogisticRegression (distributed L-BFGS), scoring
  * is one `PipelineModel.transform` (narrow, no shuffle), and the
  * Pareto draw derives from a murmur hash of the document id — the
  * repo-wide "no RNG at runtime" rule, so a keep decision is
  * reproducible row-by-row at any parallelism (same property as
  * Mixing.hashKeep).
  */
object QualityModel {

  /** Train the quality classifier on a labeled frame: `labelCol` is 1
    * for reference-corpus ("high quality") docs, 0 for raw-crawl docs.
    * `numFeatures` is the hashing-trick width (2^18 default — collisions
    * are part of the method; the classifier trains against them). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 20,
            regParam: Double = 1e-4): PipelineModel = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val prepped = labeled
      .withColumn("__tokens", Text.tokens(col(textCol)))
      .withColumn("__label", col(labelCol).cast("double"))
    val pipeline = new Pipeline().setStages(Array(
      new HashingTF().setInputCol("__tokens").setOutputCol("__features")
        .setNumFeatures(numFeatures),
      new LogisticRegression().setFeaturesCol("__features")
        .setLabelCol("__label").setPredictionCol("__pred")
        .setProbabilityCol("__proba").setRawPredictionCol("__raw")
        .setMaxIter(maxIter).setRegParam(regParam)))
    pipeline.fit(prepped)
  }

  /** Score a corpus: input columns + `quality_prob` (P(reference-like)
    * in [0,1]). One narrow transform — the model broadcast is the only
    * data movement. */
  def score(model: PipelineModel, df: DataFrame, textCol: String): DataFrame = {
    val scored = model.transform(df.withColumn("__tokens", Text.tokens(col(textCol))))
    val prob = org.apache.spark.ml.functions.vector_to_array(col("__proba")).getItem(1)
    scored.withColumn("quality_prob", round(prob, 6))
      .drop("__tokens", "__features", "__pred", "__proba", "__raw", "__label")
  }

  /** Deterministic standard-Pareto(α) draw in [0, ∞) from a hash of
    * `id`: u ~ U(0,1) via murmur3, pareto = u^(−1/α) − 1 (numpy's
    * `random.pareto` parameterization, the one the GPT-3 filter used). */
  private[text] def hashPareto(id: Column, alpha: Double, seed: Int): Column = {
    val u = (pmod(hash(id, lit(seed)).cast("long"), lit(1000000L))
      .cast("double") + 0.5) / 1000000.0
    pow(u, -1.0 / alpha) - 1.0
  }

  /** The GPT-3 keep rule: retain a row when
    * `pareto(α) > 1 − quality_prob`. α=9 (their setting) keeps a
    * prob-0.9 doc with ~61% odds and a prob-0.0 doc with ~0.009% —
    * soft thresholding with a deterministic draw. */
  def paretoKeep(scored: DataFrame, idCol: String,
                 probCol: String = "quality_prob", alpha: Double = 9.0,
                 seed: Int = 42): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    scored.filter(hashPareto(col(idCol), alpha, seed) > lit(1.0) - col(probCol))
  }
}
