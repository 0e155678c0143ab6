package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing manifest for LLM pre-training (concat-and-chunk:
  * documents are concatenated in id order into one token stream that
  * is cut every `maxLen` tokens) — the bookkeeping a trainer needs to
  * shard a corpus into fixed-length context windows (beyond the
  * reference's operator set — north-star scope).
  *
  * Scale shape: the running token offset is a DISTRIBUTED prefix sum
  * in the style of the ROC-AUC rank kernel (ml/Metrics.scala) — ids
  * are range-bucketed (fixed-width over [min, max]), per-bucket token
  * totals (metadata: ≤`buckets` rows) turn into bucket offsets via a
  * window over that tiny frame, and the within-bucket cumsum window is
  * PARTITIONED by bucket. No single-partition sort at any corpus size.
  */
object Packing {

  /** One row per document: its token count, the global token offset of
    * its first token in the concatenated stream (documents ordered by
    * `idCol`, which must be unique numeric — ties would make the order,
    * and therefore every offset, nondeterministic), and the ids of the
    * first/last `maxLen`-token chunk it lands in. Returns
    * (idCol, n_tokens, token_offset, start_chunk, end_chunk); an empty
    * (0-token) document occupies no chunk — its start==end at the
    * boundary it sits on. */
  def packingManifest(df: DataFrame, idCol: String, textCol: String,
                      maxLen: Int, buckets: Int = 256): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    // null text counts as 0 tokens — a null row must not poison the
    // running offset of every document after it. A null id (or one the
    // long cast nulls out, e.g. a UUID string) fails fast per row:
    // null ids would all collapse into one bucket and tie-order
    // arbitrarily, making every offset silently nondeterministic.
    val base = df.select(
      coalesce(expr(s"try_cast(`$idCol` AS BIGINT)"), raise_error(lit(
        s"packingManifest: $idCol must be non-null and castable to long")))
        .as("__id"),
      coalesce(Text.tokenCount(col(textCol)).cast("long"), lit(0L)).as("n_tokens"))
    // metadata aggregate: id range → fixed-width bucket bounds
    val bounds = base.agg(min("__id").as("__lo"), max("__id").as("__hi"))
    val bucketed = base.crossJoin(broadcast(bounds))
      .withColumn("__w", greatest(
        (col("__hi") - col("__lo") + 1).cast("double") / buckets, lit(1.0)))
      .withColumn("__b", least(
        floor((col("__id") - col("__lo")) / col("__w")).cast("int"),
        lit(buckets - 1)))
      .drop("__lo", "__hi", "__w")
    // ≤buckets rows: per-bucket totals → exclusive running offsets.
    // The window IS single-partition — over a metadata-sized frame.
    val offsets = bucketed.groupBy("__b").agg(sum("n_tokens").as("__bt"))
      .withColumn("__boff", coalesce(
        sum("__bt").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__b", "__boff")
    val local = Window.partitionBy("__b").orderBy("__id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("__b"))
      .withColumn("token_offset",
        col("__boff") + coalesce(sum("n_tokens").over(local), lit(0L)))
      .withColumn("start_chunk", floor(col("token_offset") / maxLen))
      .withColumn("end_chunk",
        floor((col("token_offset") + greatest(col("n_tokens"), lit(1L)) - 1) / maxLen))
      .select(col("__id").as(idCol), col("n_tokens"), col("token_offset"),
        col("start_chunk"), col("end_chunk"))
  }

  /** Corpus-level packing summary: total tokens, number of `maxLen`
    * chunks, number of documents that straddle a chunk boundary (a
    * proxy for attention-mask fragmentation). One aggregate over the
    * manifest. */
  def packingSummary(manifest: DataFrame, maxLen: Int): DataFrame =
    manifest.agg(
      sum("n_tokens").as("total_tokens"),
      ceil(sum("n_tokens").cast("double") / maxLen).cast("long").as("n_chunks"),
      sum(when(col("end_chunk") > col("start_chunk"), 1L).otherwise(0L))
        .as("n_straddling"))
}
