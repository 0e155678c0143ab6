package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clustering-quality read-out: the SIMPLIFIED silhouette (Hruschka et
  * al. 2004 — centroid distances instead of the O(n²) mean pairwise
  * form), the variant that scales: a(i) is the distance to the OWN
  * cluster centroid, b(i) the minimum distance to any OTHER centroid,
  * s(i) = (b−a)/max(a,b). The reference's clustering surface
  * (smart_aggregator / Projection2D,
  * reference: src/workbench/algorithms/dataframe/projection_2d.py)
  * reports no quality number at all; this is the missing evaluation
  * step every clustering decision needs.
  *
  * Scale design: two passes, both linear. Pass 1: posexplode →
  * (cluster, dim) mean — one combinable shuffle of n·d cells; the
  * k×d centroid table is metadata-sized and BROADCAST back. Pass 2:
  * each row meets only the k centroid rows (broadcast nested-loop,
  * k ≤ 64) and folds the distance with one zip_with/aggregate — no
  * per-dim shuffle, no pairwise join. Cross-engine stability: centroid
  * coordinates and the two distances are rounded at 6dp, and the
  * per-cluster means sum those 6dp values as DECIMAL before the one
  * double division — no summation-order term survives.
  */
object Silhouette {

  /** Per-cluster simplified-silhouette summary:
    * (cluster, n, mean_a, mean_b, mean_silhouette), 6dp. `clusterOf`
    * must be a deterministic expression over the row (a label column,
    * or a portable hash bucket for a fixture-free evaluation).
    */
  def simplifiedSilhouette(df: DataFrame, idCol: String, vecCol: String,
                           clusterOf: Column): DataFrame = {
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        transform(col(vecCol), v => v.cast("double")).as("__v"),
        clusterOf.as("__c"))
    // pass 1: per-(cluster, dim) mean → k centroid arrays, 6dp-pinned
    val cells = base.select(col("__c"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy("__c", "__p").agg(avg("__x").as("__m"))
    val centroids = cells
      .groupBy(col("__c").as("__cc"))
      .agg(transform(array_sort(collect_list(struct(col("__p"), col("__m")))),
        s => round(s.getField("__m"), 6)).as("__cv"))
    // pass 2: rows × k broadcast — per-pair squared distance in one fold
    val d2 = base.join(broadcast(centroids))
      .select(col("__id"), col("__c"), col("__cc"),
        round(sqrt(aggregate(zip_with(col("__v"), col("__cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, e) => acc + e)), 6)
          .as("__d"))
    val ab = d2.groupBy("__id", "__c")
      .agg(min(when(col("__c") === col("__cc"), col("__d"))).as("__a"),
        min(when(col("__c") =!= col("__cc"), col("__d"))).as("__b"))
    // Means are decimal-exact (Bootstrap.subsampleCi pattern): the 6dp
    // inputs sum exactly as DECIMAL(28,6), so the single cast-to-double
    // + divide is summation-order-free — r9's mean_b differed from the
    // oracle by exactly 1e-6 on a .5 rounding boundary that Spark and
    // DuckDB reached through different summation orders.
    def decMean(c: Column): Column =
      round(sum(c.cast("decimal(28,6)")).cast("double") / count(lit(1)), 6)
    ab.select(col("__c"), col("__a"), col("__b"),
        when(greatest(col("__a"), col("__b")) === 0, lit(0.0))
          .otherwise(round((col("__b") - col("__a")) /
            greatest(col("__a"), col("__b")), 6))
          .as("__s"))
      .groupBy(col("__c").as("cluster"))
      .agg(count(lit(1)).as("n"),
        decMean(col("__a")).as("mean_a"),
        decMean(col("__b")).as("mean_b"),
        decMean(col("__s")).as("mean_silhouette"))
      .orderBy("cluster")
  }
}
