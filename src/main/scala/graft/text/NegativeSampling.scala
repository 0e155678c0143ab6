package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for contrastive / retrieval
  * training pairs: every anchor document draws K pseudo-random
  * negatives from the corpus, excluding itself and its own source
  * (in-source "negatives" are frequently near-positives). The draw is
  * an md5 ORDER, not an RNG, so any engine — and any rerun — produces
  * the identical pair table (the q56/q105 portable-hash discipline).
  *
  * Scale design: anchors never meet the whole corpus. Candidates are
  * sharded into B hex buckets by md5(id); each anchor probes exactly
  * ONE bucket (chosen by its own salted hash), so the join is a plain
  * equi-join with fan-out n_anchors × corpus/B, and K-of-bucket
  * selection is a bucket-local row_number window — partitioned by
  * anchor, never global. B trades negative-pool coverage for join
  * width the same way an IVF probe count does.
  */
object NegativeSampling {

  private def hex1(c: Column, salt: String): Column =
    substring(md5(concat(c.cast("string"), lit(salt))), 1, 1)

  /** (anchor_id, neg_rank, neg_id, neg_source) with `k` rows per
    * anchor — fewer only if the probed bucket runs dry after the
    * self/source exclusions. 16 buckets (one hex digit).
    */
  def sampleNegatives(docs: DataFrame, idCol: String, sourceCol: String,
                      anchors: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k $k out of range")
    val cand = docs.select(col(idCol).as("__cid"),
      col(sourceCol).as("neg_source"),
      hex1(col(idCol), "").as("__b"))
    val anc = anchors.select(col(idCol).as("anchor_id"),
      col(sourceCol).as("__asrc"),
      hex1(col(idCol), ":probe").as("__b"))
    import org.apache.spark.sql.expressions.Window
    anc.join(cand, "__b")
      .filter(col("__cid") =!= col("anchor_id") &&
        col("neg_source") =!= col("__asrc"))
      .withColumn("__draw",
        md5(concat(col("anchor_id").cast("string"), lit(":"),
          col("__cid").cast("string"))))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy(col("__draw"), col("__cid"))))
      .filter(col("neg_rank") <= k)
      .select(col("anchor_id"), col("neg_rank"), col("__cid").as("neg_id"),
        col("neg_source"))
  }
}
