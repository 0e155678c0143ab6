package graft.proximity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the companion to
  * [[Analytics.proximityGraph]] (which builds the KNN graph) and
  * [[graft.dedup.Components]] (connected components). PageRank is the
  * standard "which nodes anchor the corpus" centrality used to pick
  * representative documents from a similarity graph.
  *
  * Scale shape: per iteration, ONE shuffle to join ranks onto edges by
  * src and ONE map-side-combined groupBy on dst — the canonical
  * distributed PageRank. Rank state lives in a DataFrame (persisted per
  * round, previous round unpersisted), never on the driver; the only
  * driver scalars are node count and per-round dangling mass (two tiny
  * aggregates). Deterministic: fixed iteration count, no RNG.
  */
object Graph {

  /** Standard damped PageRank with dangling-mass redistribution.
    * @param edges directed (src, dst) edge list; parallel edges count once
    *              per row in the out-degree (keep it deduped upstream).
    * @return (id, pagerank) over src ∪ dst, summing to 1. */
  def pageRank(edges0: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping >= 0 && damping < 1)
    // localCheckpoint per round (the Components precedent): persist alone
    // keeps the whole nested-join lineage, and ~10 rounds of plan nesting
    // OOMs the driver during analysis — checkpoint TRUNCATES it.
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    val n = nodes.count().toDouble
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("__deg")).localCheckpoint(true)
    var pr = nodes.withColumn("pr", lit(1.0 / n)).localCheckpoint(true)
    var t = 0
    while (t < iters) {
      // mass parked on dangling nodes (no out-edges) spreads uniformly
      val dangling = pr.join(outDeg, pr("id") === outDeg("src"), "left_anti")
        .agg(sum("pr")).first() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
      val contrib = edges.join(outDeg, "src")
        .join(pr, edges("src") === pr("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("__deg")).as("__c"))
      val next = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) + lit(dangling / n))).as("pr"))
        .localCheckpoint(true) // eager: materialized, lineage cut
      pr.unpersist()
      pr = next
      t += 1
    }
    edges.unpersist(); outDeg.unpersist(); nodes.unpersist()
    pr
  }

  /** Unrolled ANSI-SQL equivalent of [[pageRank]] for a fixed iteration
    * count — the oracle form. `edgesCte` must yield (src, dst). */
  def pageRankOracleSql(edgesCte: String, iters: Int, damping: Double): String = {
    val d = damping
    val n = "(SELECT COUNT(*) FROM nodes)"
    val rounds = (1 to iters).map { t =>
      s"""c$t AS (SELECT e.dst AS id, SUM(p.pr / o.deg) AS c
            FROM eg e JOIN pr${t - 1} p ON e.src = p.id
            JOIN odeg o ON e.src = o.src GROUP BY e.dst),
          d$t AS (SELECT COALESCE(SUM(pr), 0) AS m FROM pr${t - 1}
            WHERE id NOT IN (SELECT src FROM eg)),
          pr$t AS (SELECT nodes.id,
            (1 - $d) / $n + $d * (COALESCE(c.c, 0) + (SELECT m FROM d$t) / $n) AS pr
            FROM nodes LEFT JOIN c$t c USING (id))"""
    }.mkString(",\n")
    s"""WITH eg AS ($edgesCte),
        nodes AS (SELECT src AS id FROM eg UNION SELECT dst FROM eg),
        odeg AS (SELECT src, COUNT(*) AS deg FROM eg GROUP BY src),
        pr0 AS (SELECT id, 1.0 / $n AS pr FROM nodes),
        $rounds
        SELECT id, ROUND(pr, 6) AS pagerank FROM pr$iters"""
  }
}
