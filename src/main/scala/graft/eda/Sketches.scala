package graft.eda

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark) — the 100 TB answer to "distinct users per shard AND
  * overall": sketch each shard once, persist the binary sketches
  * (shard-count rows), and answer any union of shards later WITHOUT
  * rescanning the corpus. An exact global countDistinct is one full
  * shuffle of the key universe; the sketch union moves kilobytes.
  */
object Sketches {

  /** Per-shard sketch table: (shardCol, n_rows, sketch binary).
    * Persist this next to the data; it is the incremental unit — new
    * shards append, nothing recomputes.
    */
  def shardSketches(df: DataFrame, shardCol: String, valueCol: String,
                    lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Fold a sketch table to one global row:
    * (n_shards, n_rows, distinct_estimate). Input is shard-cardinality,
    * so this is driver-trivial at any corpus size.
    */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      count(lit(1)).as("n_shards"),
      sum("n_rows").as("n_rows"),
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .cast("long").as("distinct_estimate"))

  /** Per-shard estimates read back from the persisted sketches. */
  def shardEstimates(sketches: DataFrame, shardCol: String): DataFrame =
    sketches.select(col(shardCol), col("n_rows"),
      hll_sketch_estimate(col("sketch")).cast("long").as("distinct_estimate"))

  /** Per-shard QUANTILE sketch table (DataSketches KLL): the quantile
    * counterpart of [[shardSketches]] — kilobyte mergeable state per
    * shard vs the O(rows) exact buffer, with provable rank-error
    * bounds from `k`. Returns (shardCol, n_rows, qsketch binary). */
  def quantileShardSketches(df: DataFrame, shardCol: String,
                            valueCol: String, k: Int = 200): DataFrame =
    df.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.KllSketch
          .kllSketch(col(valueCol).cast("double"), k).as("qsketch"))

  /** Union a quantile-shard table and read back global quantile
    * estimates — shard-cardinality input, so the merge is metadata at
    * any corpus size. Returns one row per prob:
    * (prob, quantile_estimate, n_rows, n_shards). */
  def mergedQuantiles(sketches: DataFrame, probs: Seq[Double],
                      k: Int = 200): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    val row = sketches.agg(
      count(lit(1)).as("n_shards"), sum("n_rows").as("n"),
      graft.functions.KllSketch.kllMerge(col("qsketch"), k).as("m")).head()
    if (row.isNullAt(2))
      return Seq.empty[(Double, Double, Long, Long)]
        .toDF("prob", "quantile_estimate", "n_rows", "n_shards")
    val qs = graft.functions.KllSketch
      .quantiles(row.getAs[Array[Byte]](2), probs)
    probs.zip(qs).map { case (p, q) =>
      (p, BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        row.getLong(1), row.getLong(0))
    }.toDF("prob", "quantile_estimate", "n_rows", "n_shards")
  }
}
