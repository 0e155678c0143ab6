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
      // mass parked on dangling nodes (no out-edges) spreads uniformly.
      // The mass rides a 1-row cross-joined aggregate (the established
      // scalar-frame pattern) instead of a per-iteration .first() driver
      // action: one job per round instead of two, identical arithmetic
      // (same aggregate subtree, same double division by n).
      val dangling = pr.join(outDeg, pr("id") === outDeg("src"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
      val contrib = edges.join(outDeg, "src")
        .join(pr, edges("src") === pr("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("__deg")).as("__c"))
      val next = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .crossJoin(dangling)
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * (coalesce(col("__c"), lit(0.0)) +
              col("__dm") / lit(n.toDouble))).as("pr"))
        .localCheckpoint(true) // eager: materialized, lineage cut
      pr.unpersist()
      pr = next
      t += 1
    }
    edges.unpersist(); outDeg.unpersist(); nodes.unpersist()
    pr
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community; each round it adopts the most frequent
    * label among in-neighbors (ties → smallest label; isolated rounds
    * keep the current label). Deterministic by construction — the
    * classic async LPA is order-dependent, the synchronous form is not.
    * Per round: one src-keyed join + one (dst, label) groupBy + one
    * per-dst argmax — same shuffle budget as a PageRank round.
    */
  def labelPropagation(edges0: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1)
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    var lab = nodes.withColumn("label", col("id")).localCheckpoint(true)
    var t = 0
    while (t < iters) {
      val votes = edges.join(lab, edges("src") === lab("id"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__n"))
      // argmax label per dst: max count, then smallest label
      val best = votes.groupBy(col("dst"))
        .agg(min(struct((-col("__n")).as("negn"), col("label"))).as("__b"))
        .select(col("dst"), col("__b.label").as("__newlab"))
      val next = lab.join(best, lab("id") === best("dst"), "left")
        .select(col("id"), coalesce(col("__newlab"), col("label")).as("label"))
        .localCheckpoint(true)
      lab.unpersist()
      lab = next
      t += 1
    }
    edges.unpersist(); nodes.unpersist()
    lab
  }

  /** Unrolled ANSI-SQL equivalent of [[labelPropagation]]. */
  def labelPropagationOracleSql(edgesCte: String, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""v$t AS (SELECT e.dst, l.label, COUNT(*) AS n
            FROM eg e JOIN lb${t - 1} l ON e.src = l.id GROUP BY e.dst, l.label),
          b$t AS (SELECT dst, label AS newlab FROM v$t
            QUALIFY row_number() OVER (PARTITION BY dst ORDER BY n DESC, label ASC) = 1),
          lb$t AS MATERIALIZED (SELECT l.id, COALESCE(b.newlab, l.label) AS label
            FROM lb${t - 1} l LEFT JOIN b$t b ON l.id = b.dst)"""
    }.mkString(",\n")
    s"""WITH eg AS MATERIALIZED ($edgesCte),
        nodes AS (SELECT src AS id FROM eg UNION SELECT dst FROM eg),
        lb0 AS (SELECT id, id AS label FROM nodes),
        $rounds
        SELECT id, label FROM lb$iters"""
  }

  /** Per-node triangle count on the UNDIRECTED graph induced by the edge
    * list (direction dropped, self-loops dropped, parallel edges
    * deduped). Standard two-path + closing-edge join over the
    * canonical (a < b) edge set: the join fans out on two-paths, never
    * all-pairs; degree-skew is the known hot spot and is bounded here
    * by the proximity graph's per-node edge caps.
    */
  def triangleCount(edges0: DataFrame): DataFrame = {
    val und = edges0.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    // two-path (a<b<c): (a,b) + (b,c) → close with (a,c)
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val nodes = und.select(col("a").as("id")).union(und.select(col("b").as("id"))).distinct()
    val perNode = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    // eager result + release: returning a lazy plan over the checkpointed
    // edge set would pin its cached blocks for the session's lifetime
    val out = nodes.join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
      .localCheckpoint(true)
    und.unpersist()
    out
  }

  /** ANSI-SQL equivalent of [[triangleCount]]. */
  def triangleCountOracleSql(edgesCte: String): String =
    s"""WITH eg AS ($edgesCte),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM eg WHERE src != dst),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1 JOIN und e2 ON e1.b = e2.a
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
        pn AS (SELECT id, COUNT(*) AS triangles
          FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) GROUP BY id)
        SELECT nodes.id, COALESCE(pn.triangles, 0) AS triangles
        FROM nodes LEFT JOIN pn USING (id)"""

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
          pr$t AS MATERIALIZED (SELECT nodes.id,
            (1 - $d) / $n + $d * (COALESCE(c.c, 0) + (SELECT m FROM d$t) / $n) AS pr
            FROM nodes LEFT JOIN c$t c USING (id))"""
    }.mkString(",\n")
    s"""WITH eg AS MATERIALIZED ($edgesCte),
        nodes AS MATERIALIZED (SELECT src AS id FROM eg UNION SELECT dst FROM eg),
        odeg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM eg GROUP BY src),
        pr0 AS (SELECT id, 1.0 / $n AS pr FROM nodes),
        $rounds
        SELECT id, ROUND(pr, 6) AS pagerank FROM pr$iters"""
  }

  /** Personalized PageRank: random walks restart at the SEED set
    * (uniformly) instead of everywhere, so rank concentrates around the
    * seeds — the similarity/recommendation variant of [[pageRank]]
    * (same per-round shuffle budget: one src-keyed join + one dst
    * groupBy; dangling mass returns to the seeds).
    * `seeds` needs column `id`; returns (id, ppr 6dp-unrounded). */
  def personalizedPageRank(edges0: DataFrame, seeds0: DataFrame,
                           iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1 && damping >= 0 && damping < 1)
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    val seeds = seeds0.select(col("id")).distinct()
      .join(nodes, Seq("id")).localCheckpoint(true)
    val s = seeds.count().toDouble
    require(s > 0, "personalizedPageRank needs at least one seed in the graph")
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("__deg")).localCheckpoint(true)
    // e(v): the restart distribution — 1/|S| on seeds, 0 elsewhere
    val e = nodes.join(seeds.withColumn("__e", lit(1.0 / s)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__e"), lit(0.0)).as("__e"))
      .localCheckpoint(true)
    var pr = e.select(col("id"), col("__e").as("pr")).localCheckpoint(true)
    var t = 0
    while (t < iters) {
      // dangling mass as a 1-row cross-joined aggregate, not a per-round
      // .first() action (same rewrite as pageRank: one job per round,
      // identical arithmetic)
      val dangling = pr.join(outDeg, pr("id") === outDeg("src"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
      val contrib = edges.join(outDeg, "src")
        .join(pr, edges("src") === pr("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") / col("__deg")).as("__c"))
      val next = e.join(contrib, e("id") === contrib("dst"), "left")
        .crossJoin(dangling)
        .select(e("id"),
          ((lit(1 - damping) + lit(damping) * col("__dm")) * col("__e") +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      pr.unpersist()
      pr = next
      t += 1
    }
    edges.unpersist(); outDeg.unpersist(); nodes.unpersist(); e.unpersist()
    pr
  }

  /** Unrolled ANSI-SQL equivalent of [[personalizedPageRank]] for a
    * fixed iteration count. `edgesCte` yields (src, dst); `seedsCte`
    * yields (id). */
  def personalizedPageRankOracleSql(edgesCte: String, seedsCte: String,
                                    iters: Int, damping: Double): String = {
    val d = damping
    val rounds = (1 to iters).map { t =>
      s"""c$t AS (SELECT e.dst AS id, SUM(p.pr / o.deg) AS c
            FROM eg e JOIN pr${t - 1} p ON e.src = p.id
            JOIN odeg o ON e.src = o.src GROUP BY e.dst),
          d$t AS (SELECT COALESCE(SUM(pr), 0) AS m FROM pr${t - 1}
            WHERE id NOT IN (SELECT src FROM eg)),
          pr$t AS MATERIALIZED (SELECT ev.id,
            ((1 - $d) + $d * (SELECT m FROM d$t)) * ev.e
              + $d * COALESCE(c.c, 0) AS pr
            FROM ev LEFT JOIN c$t c USING (id))"""
    }.mkString(",\n")
    s"""WITH eg AS MATERIALIZED ($edgesCte),
        nodes AS MATERIALIZED (SELECT src AS id FROM eg UNION SELECT dst FROM eg),
        sd AS (SELECT DISTINCT id FROM ($seedsCte) s
          WHERE id IN (SELECT id FROM nodes)),
        ev AS MATERIALIZED (SELECT nodes.id,
          CASE WHEN nodes.id IN (SELECT id FROM sd)
            THEN 1.0 / (SELECT COUNT(*) FROM sd) ELSE 0 END AS e
          FROM nodes),
        odeg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM eg GROUP BY src),
        pr0 AS (SELECT id, e AS pr FROM ev),
        $rounds
        SELECT id, ROUND(pr, 6) AS ppr FROM pr$iters"""
  }

  /** Multi-source BFS hop distances: minimum number of directed hops
    * from any node in `sources` (column `id`), up to `maxHops`.
    * Unreached nodes are absent from the output.
    *
    * Scale shape: classic frontier expansion — per hop, ONE equi-join
    * of the (shrinking) frontier onto edges by src and one anti-join
    * against the visited set; only the NEW frontier is
    * localCheckpoint'ed per round (lineage would otherwise nest one
    * join per hop — the PageRank/Components lesson), and the visited
    * set stays a lazy union over the cached per-hop frontiers instead
    * of being re-materialized O(V) every round. One real action per
    * hop (the frontier checkpoint; the emptiness probe is a limit-1
    * over the already-cached blocks). The frontier empties early when
    * the reachable set saturates, so the loop is O(diameter) rounds,
    * not O(maxHops) scans.
    */
  def bfsDepths(edges0: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    var frontier = sources.select(col("id")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint(true)
    var visited = frontier // lazy union of cached frontiers
    var hop = 1
    var frontierEmpty = frontier.isEmpty
    while (hop <= maxHops && !frontierEmpty) {
      val next = frontier.join(edges, frontier("id") === edges("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      frontierEmpty = next.isEmpty
      visited = visited.union(next)
      frontier = next
      hop += 1
    }
    edges.unpersist()
    visited
  }

  /** Recursive-CTE equivalent of [[bfsDepths]]. `sourcesCte` must yield
    * a column `id`. */
  def bfsDepthsOracleSql(edgesCte: String, sourcesCte: String, maxHops: Int): String =
    s"""WITH RECURSIVE eg AS ($edgesCte),
        src0 AS ($sourcesCte),
        walk(id, dist) AS (
          SELECT id, 0 FROM src0
          UNION
          SELECT e.dst, w.dist + 1 FROM walk w JOIN eg e ON e.src = w.id
          WHERE w.dist < $maxHops)
        SELECT id, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY id"""

  /** Fixed-round k-core peel: repeatedly drop nodes whose UNDIRECTED
    * degree is below k (and their incident edges), `rounds` times.
    * With enough rounds this converges to the true k-core; the round
    * count is explicit so the semantics — and the oracle — are exact
    * regardless of graph shape. Returns surviving (id, degree).
    *
    * Per round: one degree groupBy + two semi-joins, edge state
    * localCheckpoint'ed (the PageRank lineage discipline). Early-exits
    * when a round removes nothing.
    */
  def kcorePeel(edges0: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val und = edges0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    var edges = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint(true)
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select(col("src").as("__keep"))
        .localCheckpoint(true)
      val next = edges
        .join(keep.withColumnRenamed("__keep", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("__keep", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true)
      stable = next.count() == edges.count()
      edges.unpersist()
      edges = next
      r += 1
    }
    edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("int").as("degree"))
      .filter(col("degree") >= k)
  }

  /** Unrolled-CTE equivalent of [[kcorePeel]] for a fixed round count. */
  def kcorePeelOracleSql(edgesCte: String, k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""d$r AS (SELECT src, COUNT(*) AS d FROM e${r - 1} GROUP BY src),
          k$r AS (SELECT src FROM d$r WHERE d >= $k),
          e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e${r - 1} e
            WHERE e.src IN (SELECT src FROM k$r)
              AND e.dst IN (SELECT src FROM k$r))"""
    }.mkString(",\n")
    s"""WITH eg AS ($edgesCte),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM eg WHERE src != dst),
        e0 AS (SELECT a AS src, b AS dst FROM und
               UNION ALL SELECT b, a FROM und),
        $steps
        SELECT src AS id, CAST(COUNT(*) AS INT) AS degree
        FROM e$rounds GROUP BY src HAVING COUNT(*) >= $k"""
  }

  /** One-row undirected degree summary + degree assortativity (Pearson
    * correlation of endpoint degrees over directed edge instances —
    * each undirected edge counted both ways, the standard Newman form).
    * Aggregates only; the corr is over the edge table.
    */
  def degreeStats(edges0: DataFrame): DataFrame = {
    // checkpoint the symmetrized edge list: deg and the two joins
    // reference it 4x, and each reference would otherwise recompute the
    // full upstream edge construction (for the proximity graph, a KNN
    // self-join) — the q292 lesson applied here
    val und = edges0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    val dir = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = dir.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    dir
      .join(deg.select(col("id").as("src"), col("deg").as("__ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("__dd")), Seq("dst"))
      .agg(
        countDistinct(col("src")).as("n_nodes"),
        (count(lit(1)) / 2).cast("long").as("n_edges"),
        // 2E/N — NOT avg over edge instances (that would be Σd²/Σd)
        round(count(lit(1)) / countDistinct(col("src")), 6).as("avg_degree"),
        max("__ds").as("max_degree"),
        round(corr(col("__ds"), col("__dd")), 6).as("assortativity"))
  }

  /** Neighborhood-overlap link prediction over the undirected graph:
    * for every NON-edge pair (a < c) with at least one common neighbor,
    * common-neighbor count, Jaccard overlap, and Adamic-Adar
    * (Σ 1/ln(deg(b)) over shared neighbors b — the classic
    * link-prediction trio, Liben-Nowell & Kleinberg CIKM'03).
    *
    * Scale shape: exactly the triangle two-path join — candidates fan
    * out on two-paths (adj ⋈ adj on the middle node), never all-pairs;
    * the existing-edge exclusion is one anti-join; degrees are a
    * metadata-sized aggregate broadcast back. A shared neighbor b has
    * deg(b) ≥ 2 by construction, so ln(deg) never hits zero. Returns
    * (src, dst, common_neighbors, jaccard, adamic_adar). */
  def linkPrediction(edges0: DataFrame): DataFrame = {
    val und = edges0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    val deg = adj.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    // two-paths a —b— c with a < c, scored per shared neighbor b
    val paths = adj.as("e1").join(adj.as("e2"),
        col("e1.v") === col("e2.u") && col("e1.u") < col("e2.v"))
      .select(col("e1.u").as("a"), col("e2.v").as("c"), col("e1.v").as("m"))
      .join(broadcast(deg.select(col("id").as("m"), col("deg").as("__dm"))),
        Seq("m"))
      .groupBy("a", "c")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(lit(1.0) / log(col("__dm"))).as("__aa"))
    val out = paths
      // keep only NON-edges: the candidate set minus the graph itself
      .join(und, paths("a") === und("a") && paths("c") === und("b"),
        "left_anti")
      .join(broadcast(deg.select(col("id").as("a"), col("deg").as("__da"))),
        Seq("a"))
      .join(broadcast(deg.select(col("id").as("c"), col("deg").as("__dc"))),
        Seq("c"))
      .select(col("a").as("src"), col("c").as("dst"),
        col("common_neighbors"),
        round(col("common_neighbors") /
          (col("__da") + col("__dc") - col("common_neighbors")), 6)
          .as("jaccard"),
        round(col("__aa"), 6).as("adamic_adar"))
      .localCheckpoint(true)
    und.unpersist()
    out
  }

  /** Local clustering coefficient per node:
    * 2·triangles / (deg·(deg−1)), 0 for degree-1 nodes — how close each
    * node's neighborhood is to a clique. Composes the [[triangleCount]]
    * two-path join with the degree aggregate; one extra metadata join,
    * no new shuffle shape. Returns
    * (id, degree, triangles, clustering_coeff). */
  def clusteringCoefficient(edges0: DataFrame): DataFrame = {
    val tri = triangleCount(edges0)
    // checkpointed for the same reason as degreeStats (deg references
    // it twice; edges0 is expensive for the proximity graph)
    val und = edges0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
      .localCheckpoint(true)
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    tri.join(deg, "id")
      .select(col("id"), col("degree"), col("triangles"),
        round(coalesce(
          try_divide(lit(2.0) * col("triangles"),
            col("degree") * (col("degree") - 1)), lit(0.0)), 6)
          .as("clustering_coeff"))
  }

  /** ANSI-SQL equivalent of [[clusteringCoefficient]]. */
  def clusteringCoefficientOracleSql(edgesCte: String): String =
    s"""WITH eg AS ($edgesCte),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM eg WHERE src != dst),
        tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM und e1 JOIN und e2 ON e1.b = e2.a
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und),
        pn AS (SELECT id, COUNT(*) AS triangles
          FROM (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri) GROUP BY id),
        deg AS (SELECT id, COUNT(*) AS degree FROM
          (SELECT a AS id FROM und UNION ALL SELECT b FROM und) GROUP BY id)
        SELECT d.id, d.degree, COALESCE(pn.triangles, 0) AS triangles,
          ROUND(COALESCE(2.0 * COALESCE(pn.triangles, 0) /
            NULLIF(d.degree * (d.degree - 1), 0), 0.0), 6)
            AS clustering_coeff
        FROM deg d LEFT JOIN pn USING (id)"""

  /** ANSI-SQL equivalent of [[linkPrediction]]. */
  def linkPredictionOracleSql(edgesCte: String): String =
    s"""WITH eg AS ($edgesCte),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM eg WHERE src != dst),
        adj AS (SELECT a AS u, b AS v FROM und
                UNION ALL SELECT b, a FROM und),
        deg AS (SELECT u AS id, COUNT(*) AS deg FROM adj GROUP BY u),
        paths AS (SELECT e1.u AS a, e2.v AS c,
            COUNT(*) AS common_neighbors,
            SUM(1.0 / LN(dm.deg)) AS aa
          FROM adj e1 JOIN adj e2 ON e1.v = e2.u AND e1.u < e2.v
          JOIN deg dm ON dm.id = e1.v
          GROUP BY e1.u, e2.v),
        nonedge AS (SELECT p.* FROM paths p
          WHERE NOT EXISTS (SELECT 1 FROM und
            WHERE und.a = p.a AND und.b = p.c))
        SELECT n.a AS src, n.c AS dst, n.common_neighbors,
          ROUND(CAST(n.common_neighbors AS DOUBLE) /
            (da.deg + dc.deg - n.common_neighbors), 6) AS jaccard,
          ROUND(n.aa, 6) AS adamic_adar
        FROM nonedge n JOIN deg da ON da.id = n.a
        JOIN deg dc ON dc.id = n.c"""

  /** Weighted single-source shortest paths, Bellman-Ford style: per
    * round every reached node relaxes its out-edges
    * (dist' = min(dist, dist[src] + w)), `rounds` rounds — the
    * weighted generalization of [[bfsDepths]] (same fixed-round
    * contract so the oracle is exact regardless of graph shape; with
    * rounds ≥ longest shortest-path hop count this is the true SSSP).
    * Per round: one src-keyed join + one min groupBy — the PageRank
    * shuffle budget, state localCheckpoint'ed. min() is
    * order-independent, so the result is deterministic for any
    * partitioning. `edges` needs (src, dst, w); `sources` a column
    * `id`. Returns reached (id, dist 6dp). */
  def ssspWeighted(edges0: DataFrame, sources: DataFrame,
                   rounds: Int): DataFrame = {
    require(rounds >= 0)
    val edges = edges0.select(col("src"), col("dst"),
      col("w").cast("double").as("w")).localCheckpoint(true)
    var dist = sources.select(col("id")).distinct()
      .withColumn("dist", lit(0.0)).localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val relax = dist.join(edges, dist("id") === edges("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val next = dist.union(relax).groupBy("id")
        .agg(min("dist").as("dist")).localCheckpoint(true)
      dist.unpersist()
      dist = next
      r += 1
    }
    edges.unpersist()
    dist.select(col("id"), round(col("dist"), 6).as("dist"))
  }

  /** Recursive-CTE equivalent of [[ssspWeighted]]: path enumeration up
    * to `rounds` hops, then MIN per node — identical left-to-right
    * accumulation of the path sum, so every candidate distance is
    * bit-equal to the Spark fold. `edgesCte` must yield (src, dst, w);
    * `sourcesCte` a column `id`. */
  def ssspWeightedOracleSql(edgesCte: String, sourcesCte: String,
                            rounds: Int): String =
    s"""WITH RECURSIVE eg AS ($edgesCte),
        src0 AS ($sourcesCte),
        walk(id, dist, hops) AS (
          SELECT id, CAST(0 AS DOUBLE), 0 FROM src0
          UNION ALL
          SELECT e.dst, w.dist + e.w, w.hops + 1
          FROM walk w JOIN eg e ON e.src = w.id
          WHERE w.hops < $rounds)
        SELECT id, ROUND(MIN(dist), 6) AS dist FROM walk GROUP BY id"""

  /** Newman modularity of a community partition, per community:
    * q_c = L_c/m − (D_c/2m)², where L_c counts intra-community
    * undirected edges, D_c sums member degrees, m = #undirected edges
    * (direction dropped, self-loops dropped, parallel edges deduped —
    * the [[triangleCount]] canonicalization). Σ q_c is the partition's
    * modularity Q. `labels` needs (id, label). Two joins of the
    * labels onto the canonical edge set + one degree groupBy — all
    * edge-list-sized. Returns
    * (community, n_nodes, n_intra, deg_sum, q_c 6dp). */
  def modularity(edges0: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges0.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint(true)
    val m = und.count().toDouble
    val lab = labels.select(col("id"), col("label")).localCheckpoint(true)
    val intra = und
      .join(lab.select(col("id").as("a"), col("label").as("__la")), "a")
      .join(lab.select(col("id").as("b"), col("label").as("__lb")), "b")
      .filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("community")).agg(count(lit(1)).as("n_intra"))
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("__d"))
      .join(lab, "id")
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum("__d").as("deg_sum"))
    val out = deg.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("n_intra"), lit(0L)).as("n_intra"), col("deg_sum"),
        round(coalesce(col("n_intra"), lit(0L)) / lit(m) -
          (col("deg_sum") / lit(2.0 * m)) * (col("deg_sum") / lit(2.0 * m)),
          6).as("q_c"))
      .localCheckpoint(true)
    und.unpersist(); lab.unpersist()
    out
  }

  /** DuckDB mirror of [[modularity]] over a labels statement (id,
    * label) — e.g. the [[labelPropagationOracleSql]] output nested as
    * a CTE — and the same edges CTE. */
  def modularityOracleSql(edgesCte: String, labelsStmt: String): String =
    s"""WITH eg AS ($edgesCte),
        lp AS ($labelsStmt),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM eg WHERE src != dst),
        m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM und),
        intra AS (SELECT la.label AS community, COUNT(*) AS n_intra
          FROM und JOIN lp la ON und.a = la.id
          JOIN lp lb ON und.b = lb.id
          WHERE la.label = lb.label GROUP BY la.label),
        deg AS (SELECT l.label AS community, COUNT(*) AS n_nodes,
            CAST(SUM(d.d) AS BIGINT) AS deg_sum
          FROM (SELECT id, COUNT(*) AS d FROM (
              SELECT a AS id FROM und UNION ALL SELECT b FROM und)
            GROUP BY id) d
          JOIN lp l ON d.id = l.id GROUP BY l.label)
        SELECT deg.community, deg.n_nodes,
          COALESCE(intra.n_intra, 0) AS n_intra, deg.deg_sum,
          ROUND(COALESCE(intra.n_intra, 0) / m.m -
            (deg.deg_sum / (2.0 * m.m)) * (deg.deg_sum / (2.0 * m.m)), 6)
            AS q_c
        FROM deg LEFT JOIN intra USING (community) CROSS JOIN m"""

  /** HITS hubs-and-authorities (Kleinberg '99) on the DIRECTED edge
    * list — the fixed-point [[pageRank]] doesn't cover: a node is a
    * good hub if it points at good authorities and vice versa. Each
    * round is the synchronous power iteration a ← Eᵀh, h ← Ea with L1
    * normalization after each half-step (L1 keeps the oracle's
    * arithmetic rational-friendly; the ranking is norm-invariant).
    *
    * Scale shape per round: two src/dst-keyed joins + two groupBys —
    * the PageRank shuffle budget exactly — with the two normalizing
    * sums as driver scalars (the [[pageRank]] dangling-mass precedent)
    * and localCheckpoints truncating lineage per round. Returns
    * (id, hub 6dp, authority 6dp). */
  def hits(edges0: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "hits needs at least one round")
    val edges = edges0.filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct().localCheckpoint(true)
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().localCheckpoint(true)
    // L1 norm as a 1-row cross-joined aggregate instead of a per-round
    // .first() action: the old form both ran an extra driver action AND
    // recomputed the ar/hr join+groupBy a second time inside the
    // normalized frame — in-plan, the repeated subtree is deduped by
    // exchange reuse. null/zero → 1.0 exactly as before.
    def l1(scored: DataFrame): DataFrame = {
      val sm = coalesce(sum("__s"), lit(0.0))
      scored.agg(when(sm === 0.0, lit(1.0)).otherwise(sm).as("__l1"))
    }
    var hub = nodes.withColumn("h", lit(1.0)).localCheckpoint(true)
    var auth: DataFrame = null
    var t = 0
    while (t < iters) {
      val ar = edges.join(hub.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum("h").as("__s"))
      val aNew = nodes.join(ar, Seq("id"), "left")
        .crossJoin(l1(ar))
        .select(col("id"),
          (coalesce(col("__s"), lit(0.0)) / col("__l1")).as("a"))
        .localCheckpoint(true)
      if (auth != null) auth.unpersist()
      auth = aNew
      val hr = edges.join(auth.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum("a").as("__s"))
      val hNew = nodes.join(hr, Seq("id"), "left")
        .crossJoin(l1(hr))
        .select(col("id"),
          (coalesce(col("__s"), lit(0.0)) / col("__l1")).as("h"))
        .localCheckpoint(true)
      hub.unpersist()
      hub = hNew
      t += 1
    }
    val out = hub.join(auth, Seq("id"))
      .select(col("id"), round(col("h"), 6).as("hub"),
        round(col("a"), 6).as("authority"))
      .localCheckpoint(true)
    edges.unpersist(); nodes.unpersist(); hub.unpersist(); auth.unpersist()
    out
  }

  /** DuckDB twin of [[hits]]: the same unrolled power iteration with
    * scalar-subquery L1 norms. */
  def hitsOracleSql(edgesCte: String, iters: Int): String = {
    val rounds = (1 to iters).map { t =>
      s"""ar$t AS (SELECT e.dst AS id, SUM(h.h) AS s
            FROM eg e JOIN h${t - 1} h ON e.src = h.id GROUP BY e.dst),
          a$t AS MATERIALIZED (SELECT n.id,
            COALESCE(r.s, 0) / (SELECT SUM(s) FROM ar$t) AS a
            FROM nodes n LEFT JOIN ar$t r USING (id)),
          hr$t AS (SELECT e.src AS id, SUM(a.a) AS s
            FROM eg e JOIN a$t a ON e.dst = a.id GROUP BY e.src),
          h$t AS MATERIALIZED (SELECT n.id,
            COALESCE(r.s, 0) / (SELECT SUM(s) FROM hr$t) AS h
            FROM nodes n LEFT JOIN hr$t r USING (id))"""
    }.mkString(",\n")
    s"""WITH eg0 AS ($edgesCte),
        eg AS MATERIALIZED (SELECT DISTINCT src, dst FROM eg0 WHERE src != dst),
        nodes AS MATERIALIZED (SELECT src AS id FROM eg UNION SELECT dst FROM eg),
        h0 AS (SELECT id, 1.0 AS h FROM nodes),
        $rounds
        SELECT h$iters.id, ROUND(h$iters.h, 6) AS hub,
          ROUND(a$iters.a, 6) AS authority
        FROM h$iters JOIN a$iters ON h$iters.id = a$iters.id"""
  }

  /** Degree assortativity (Newman '02): the Pearson correlation of
    * endpoint degrees over the UNDIRECTED edge set — positive means
    * hubs attach to hubs (social cores), negative means hub-and-spoke
    * (the shape that decides whether q179's k-core or q180's degree
    * tail is the right robustness lens).
    *
    * One symmetrize + one degree groupBy + two degree joins, then a
    * single moment aggregate over the directed-edge frame (each
    * undirected edge contributes both orientations — the standard
    * convention that makes the correlation symmetric). Returns one
    * row: (n_nodes, n_edges, assortativity 6dp). */
  def assortativity(edges0: DataFrame): DataFrame = {
    // checkpoint the undirected edge list: sym/deg/paired reference it
    // ~6x and each reference recomputed the full KNN-join upstream —
    // the r13 baseline plan had 64 Exchanges for a one-row result
    val und = edges0.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val paired = sym
      .join(deg.select(col("id").as("src"), col("deg").as("__dx")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("__dy")), "dst")
    val x = col("__dx").cast("double")
    val y = col("__dy").cast("double")
    val m = paired.agg(
      count(lit(1)).as("__m2"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
      sum(x * y).as("__sxy"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
    val n = col("__m2").cast("double")
    val cov = col("__sxy") - col("__sx") * col("__sy") / n
    val vx = col("__sxx") - col("__sx") * col("__sx") / n
    val vy = col("__syy") - col("__sy") * col("__sy") / n
    m.select(col("n_nodes"), (col("__m2") / 2).cast("long").as("n_edges"),
      round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 6)
        .as("assortativity"))
  }

  /** DuckDB twin of [[assortativity]]; `edgesCte` must yield
    * (src, dst). */
  def assortativityOracleSql(edgesCte: String): String =
    s"""WITH eg0 AS ($edgesCte),
        und AS (SELECT DISTINCT LEAST(src, dst) AS a,
            GREATEST(src, dst) AS b
          FROM eg0 WHERE src != dst),
        sym AS (SELECT a AS src, b AS dst FROM und
          UNION ALL SELECT b, a FROM und),
        deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
        p AS (SELECT CAST(dx.deg AS DOUBLE) AS x,
            CAST(dy.deg AS DOUBLE) AS y
          FROM sym JOIN deg dx ON sym.src = dx.id
          JOIN deg dy ON sym.dst = dy.id),
        m AS (SELECT COUNT(*) AS m2, SUM(x) AS sx, SUM(y) AS sy,
            SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy FROM p),
        nn AS (SELECT COUNT(*) AS n_nodes FROM deg)
        SELECT nn.n_nodes, CAST(m.m2 / 2 AS BIGINT) AS n_edges,
          ROUND(CASE WHEN sxx - sx*sx/m2 > 0 AND syy - sy*sy/m2 > 0 THEN
            (sxy - sx*sy/m2) /
              SQRT((sxx - sx*sx/m2) * (syy - sy*sy/m2)) END, 6)
            AS assortativity
        FROM m CROSS JOIN nn"""
}
