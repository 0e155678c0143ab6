package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists: turns the output
  * of minhashLsh/simhashPairs/jaccardPairs into dedup clusters with a
  * canonical representative (minimum id) per cluster.
  *
  * Iterative min-label propagation (each vertex takes the smallest label
  * in its neighborhood until fixpoint) — every step is a join + groupBy,
  * fully distributed; iteration count is bounded by the graph diameter,
  * which for near-dup clusters is small. Labels are persisted per
  * iteration and the previous generation unpersisted.
  */
object Components {

  /** @param pairs (id_a, id_b) undirected edges (id_a < id_b by convention)
    * @return (id, component) — component = min id reachable from `id`;
    *         singleton vertices are not present (no edges → no dedup).
    */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 25): DataFrame = {
    // localCheckpoint (not persist) per generation: it TRUNCATES lineage,
    // without which the iterated join plan doubles every round and the
    // driver OOMs building plan strings long before the data is large.
    // At cluster scale swap for reliable checkpoint() with a checkpoint dir.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min("dst"), first("src")).as("component"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIterations) {
      // neighbor's current label, propagated across each edge
      val viaNeighbor = edges
        .join(labels.select(col("id").as("dst"), col("component").as("__nc")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("__nc").as("__minNeighbor"))
      val next = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__minNeighbor"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("component", "__old"), Seq("id"))
        .filter(col("component") =!= col("__old")).count()
      labels = next
      iter += 1
    }
    // non-convergence must be loud — silently returning partial
    // components would under-deduplicate downstream
    if (changed > 0) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations iterations " +
          s"($changed labels still changing) — raise maxIterations for " +
          "large-diameter graphs")
    }
    labels
  }

  /** Deduplicate `df` by near-dup clusters: keep one canonical row
    * (minimum id) per component, plus every row not in any component.
    */
  def dedupByPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                   maxIterations: Int = 25): DataFrame = {
    val comps = connectedComponents(pairs, maxIterations)
    val losers = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
