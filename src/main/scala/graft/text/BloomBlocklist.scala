package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned anti-join against a large blocklist — removing known
  * content (opt-outs, takedowns, previously-served training docs) from
  * a corpus when the blocklist is too big to broadcast as strings but
  * fits as a Bloom filter (billions of keys ≈ a few GB of bits).
  *
  * Two phases, EXACT result:
  *   1. prune — `bloom_filter_agg` builds the filter in one aggregate
  *      (codegen, no driver loop); `might_contain` splits the corpus.
  *      Definite non-members (the overwhelming majority) pass straight
  *      through WITHOUT shuffling — the Bloom has no false negatives.
  *   2. confirm — only the candidate sliver (true hits + fpp noise)
  *      anti-joins the real blocklist, removing false positives.
  * The full-corpus shuffle of a naive anti-join never happens; the
  * only shuffled rows are candidates.
  */
object BloomBlocklist {

  /** Corpus rows whose STRING `keyCol` does NOT appear in
    * `block[blockKeyCol]`. Exact anti-join semantics at Bloom-prune
    * cost. The filter is built distributed (`stat.bloomFilter` runs a
    * treeAggregate over the blocklist) and broadcast; the probe is the
    * one deliberate UDF in this codebase — a boolean test against
    * broadcast bits with no SQL-function equivalent (Spark's
    * `might_contain` is internal, injected only by its own runtime
    * bloom-join rewrite).
    */
  def antiJoinPruned(corpus: DataFrame, keyCol: String,
                     block: DataFrame, blockKeyCol: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val bf = block.stat.bloomFilter(blockKeyCol, expectedItems, fpp)
    val bfB = corpus.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) => s != null && bfB.value.mightContainString(s))
    val tagged = corpus.withColumn("__cand", mightContain(col(keyCol)))
    val clean = tagged.filter(!col("__cand")).drop("__cand")
    val confirmed = tagged.filter(col("__cand")).drop("__cand")
      .join(block.select(col(blockKeyCol).as(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    clean.unionByName(confirmed)
  }
}
