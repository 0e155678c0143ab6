package graft.proximity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-support / k-truss analytics over an undirected edge list —
  * the edge-strength refinement of q146's triangle count: an edge's
  * SUPPORT is how many triangles contain it, and the k-truss is the
  * subgraph where every edge has support ≥ k−2 (communities that
  * survive when weak bridges are cut).
  *
  * Scale shape: support comes from one wedge join (adjacency ⋈
  * adjacency on the shared endpoint, then a semi-join against the
  * edge set) — the same plan family as triangle counting; the
  * histogram rides the distinct-support frame. Directed canonical
  * edges (src < dst) keep every triangle counted once per edge.
  */
object Truss {

  /** Support histogram: (support, n_edges), plus each edge counted in
    * the max-support row first. `edges` must be (src, dst) undirected
    * (either orientation; dedup happens here). */
  def supportHistogram(edges: DataFrame): DataFrame = {
    val canon = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // adjacency in both directions for the wedge walk
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
    // wedges through w: (u, w), (w, v) with u < v, then the closing
    // edge (u, v) must exist
    val wedges = adj.select(col("u").as("x"), col("v").as("__w"))
      .join(adj.select(col("u").as("__w"), col("v").as("y")), "__w")
      .filter(col("x") < col("y"))
      .select(col("x").as("a"), col("y").as("b"))
    val support = wedges.join(canon, Seq("a", "b"))
      .groupBy("a", "b").agg(count(lit(1)).as("__s"))
    canon.join(support, Seq("a", "b"), "left")
      .select(coalesce(col("__s"), lit(0L)).as("support"))
      .groupBy("support").agg(count(lit(1)).as("n_edges"))
      .orderBy("support")
  }

  /** DuckDB twin of [[supportHistogram]]; `edgesCte` is a WITH body
    * whose final CTE yields (src, dst). */
  def supportHistogramOracleSql(edgesCte: String,
                                finalCte: String): String =
    s"""WITH $edgesCte,
        canon AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM $finalCte WHERE src <> dst),
        adj AS (SELECT a AS u, b AS v FROM canon
          UNION ALL SELECT b, a FROM canon),
        wedges AS (SELECT l.u AS a, r.v AS b
          FROM adj l JOIN adj r ON l.v = r.u WHERE l.u < r.v),
        sup AS (SELECT w.a, w.b, COUNT(*) AS s
          FROM wedges w JOIN canon c ON w.a = c.a AND w.b = c.b
          GROUP BY w.a, w.b)
        SELECT COALESCE(sup.s, 0) AS support, COUNT(*) AS n_edges
        FROM canon LEFT JOIN sup ON canon.a = sup.a AND canon.b = sup.b
        GROUP BY COALESCE(sup.s, 0) ORDER BY support"""
}
