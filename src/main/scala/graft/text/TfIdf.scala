package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF document vectors and all-pairs lexical cosine similarity —
  * the sparse-vector cousin of the embedding near-dup path: finds
  * documents that share weighted vocabulary without any model.
  *
  * Scale shape (100 TB): the vector table is one explode + two
  * map-side-combined groupBys. The pair pass is an inverted-index
  * self-join ON THE TERM, so fan-out is Σ_t df(t)² over terms both
  * docs share — and the `maxDocFreq` gate removes the stop-word terms
  * that would make that quadratic (a term in half the corpus pairs
  * n²/4 docs; a df-capped term pairs ≤ maxDocFreq²). Dropping
  * ubiquitous terms barely moves cosine ordering (their idf ≈ 0
  * anyway) but turns the join corpus-linear. Same anchor-df trick as
  * the exact-substring dedup kernel (dedup/Substrings.scala).
  */
object TfIdf {

  /** Sparse tf-idf rows (id, term, weight) with L2-normalized weights:
    * w = tf·ln(N/df) / ‖doc‖. Dot products of these rows ARE cosines.
    */
  def vectors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val n = docs.count().toDouble
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"), log(lit(n) / col("df")).as("idf"))
    val w = tf.join(idf, Seq("term"))
      .select(col(idCol), col("term"), (col("tf") * col("idf")).as("__w"))
    val norms = w.groupBy(idCol).agg(sqrt(sum(col("__w") * col("__w"))).as("__norm"))
    w.join(norms, Seq(idCol))
      .select(col(idCol), col("term"),
        when(col("__norm") > 0, col("__w") / col("__norm")).otherwise(0.0).as("weight"))
  }

  /** Document pairs with tf-idf cosine ≥ `minSim` (a_id < b_id,
    * similarity rounded to 6dp). Terms with df > `maxDocFreq` are
    * excluded from pairing (≈0 idf, quadratic fan-out); their weight
    * still shapes the norms, so the reported cosine is exact over the
    * full vocabulary MINUS the capped terms' cross-contribution — at
    * the default cap this is the standard prefix-filter approximation.
    * Pass maxDocFreq ≥ N for the exact all-vocabulary answer.
    */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   minSim: Double, maxDocFreq: Long = 10000): DataFrame = {
    val vecs = vectors(docs, idCol, textCol)
    val kept = vecs.join(
      vecs.groupBy("term").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxDocFreq)
        .select("term"),
      Seq("term"))
    val a = kept.select(col("term"), col(idCol).as("a_id"), col("weight").as("__wa"))
    val b = kept.select(col("term"), col(idCol).as("b_id"), col("weight").as("__wb"))
    a.join(b, Seq("term"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(round(sum(col("__wa") * col("__wb")), 6).as("similarity"))
      .filter(col("similarity") >= minSim)
  }
}
