package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-aware canonical selection within near-duplicate clusters:
  * `dedupByPairs` keeps the MINIMUM-id row of each cluster, but a real
  * curation pipeline keeps the BEST one (longest, highest quality
  * score, freshest) and records why every other copy was dropped — the
  * keep-policy manifest downstream audits need (the reference's dedup
  * keeps first occurrence only:
  * src/workbench/core/transforms/pandas_transforms/data_to_features.py
  * drop_duplicates; RefinedWeb/FineWeb-style curation keeps by
  * quality).
  *
  * Scale design: components come from the O(log n) star algorithm; the
  * winner is ONE row_number window PARTITIONED by component (clusters
  * are small by construction, no global ordering anywhere), and
  * singletons bypass the window entirely via the left-anti/union
  * shape, so the windowed frame is only the clustered minority.
  */
object Canonical {

  /** Keep-policy manifest: one row per input row, with its cluster id
    * (its own id for singletons), the chosen canonical id of the
    * cluster, whether THIS row is kept, and the cluster size. Winner =
    * max `qualityOf` value, ties to the smaller id.
    *
    * @return (idCol, cluster_id, keep_id, kept, cluster_size)
    */
  def keepPolicyManifest(df: DataFrame, idCol: String, pairs: DataFrame,
                         qualityOf: Column): DataFrame = {
    // rename the component frame's id up front: an idCol literally named
    // "id" would otherwise be ambiguous after the join
    val comps = Components.connectedComponentsStar(pairs)
      .select(col("id").as("__cmp_id"), col("component"))
    val scored = df.select(col(idCol), qualityOf.as("__q"))
    val clustered = scored.join(comps, col(idCol) === col("__cmp_id"))
      .select(col(idCol), col("component").as("cluster_id"), col("__q"))
    val w = Window.partitionBy("cluster_id")
    val decided = clustered
      .withColumn("__rk", row_number().over(
        w.orderBy(col("__q").desc, col(idCol))))
      .withColumn("keep_id", first(col(idCol)).over(
        w.orderBy(col("__q").desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .select(col(idCol), col("cluster_id"), col("keep_id"),
        (col("__rk") === 1).as("kept"), col("cluster_size"))
    val singletons = scored.join(comps, col(idCol) === col("__cmp_id"), "left_anti")
      .select(col(idCol), col(idCol).as("cluster_id"), col(idCol).as("keep_id"),
        lit(true).as("kept"), lit(1L).as("cluster_size"))
    decided.unionByName(singletons)
  }
}
