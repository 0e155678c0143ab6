package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed spectral embedding (Laplacian eigenmaps, Belkin & Niyogi
  * 2003) — the "project EVERYTHING" manifold path that
  * [[Projection.projection2DSampled]]'s driver-side UMAP-family stub
  * deliberately caps at a sample (reference:
  * src/workbench/algorithms/dataframe/projection_2d.py:17-166, whose
  * own UMAP practice tops out at ~100k driver-side rows).
  *
  * Coordinates are the leading non-trivial eigenvectors of the
  * symmetric-normalized affinity S = D^-1/2 W D^-1/2 over a KNN graph,
  * computed by POWER ITERATION with analytic deflation: S's top
  * eigenvector is known in closed form (u1 ∝ sqrt(degree), eigenvalue
  * 1 on a connected graph), so each extra component only deflates
  * against the previously computed frames — no driver-side matrix ever
  * exists. Every iteration is one edge-join + one dst-groupBy (the
  * PageRank shape) plus two scalar aggregates (deflation dot, norm);
  * state lives in (id, value) frames, localCheckpoint-truncated, so the
  * memory and shuffle profile is O(edges) per step at any corpus size.
  *
  * Determinism: the start vector derives from xxhash64(id) — no RNG,
  * bit-stable at any parallelism. Sign is canonicalized (the entry of
  * the smallest id is made non-negative) since eigenvectors are only
  * defined up to sign.
  */
object SpectralEmbedding {

  /** Embed the nodes of an undirected edge list into `k` spectral
    * coordinates. `edges` needs (src, dst[, weight]); it is symmetrized
    * and self-loops are dropped. Returns (id, e1 … ek) with ei the
    * i-th non-trivial eigenvector of S, 6dp-rounded.
    *
    * @param iters power-iteration steps per component (~30 separates
    *              well-clustered graphs; raise for tight eigengaps) */
  def embed(edges: DataFrame, srcCol: String, dstCol: String,
            weightCol: Option[String] = None, k: Int = 2,
            iters: Int = 30): DataFrame = {
    require(k >= 1 && k <= 8, s"k $k out of range [1,8]")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val half = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"), w.as("w"))
      .filter(col("src") =!= col("dst"))
    // symmetrize, keeping the max weight of the two directions
    val sym = half.unionAll(half.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
      .groupBy("src", "dst").agg(max("w").as("w"))
      .localCheckpoint(true)
    val degrees = sym.groupBy(col("src").as("id"))
      .agg(sum("w").as("deg")).localCheckpoint(true)
    // S-edges: w / sqrt(deg_src * deg_dst) — computed once, reused by
    // every iteration of every component
    val dSrc = degrees.select(col("id").as("src"), col("deg").as("__ds"))
    val dDst = degrees.select(col("id").as("dst"), col("deg").as("__dd"))
    val sEdges = sym.join(dSrc, "src").join(dDst, "dst")
      .select(col("src"), col("dst"),
        (col("w") / sqrt(col("__ds") * col("__dd"))).as("s"))
      .localCheckpoint(true)

    def dot(a: DataFrame, b: DataFrame): Double =
      a.join(b.withColumnRenamed("v", "__bv"), "id")
        .agg(sum(col("v") * col("__bv"))).head().getDouble(0)
    def norm(a: DataFrame): Double =
      math.sqrt(a.agg(sum(col("v") * col("v"))).head().getDouble(0))

    // u1 ∝ sqrt(degree): the known top eigenvector, first deflation target
    val u1raw = degrees.select(col("id"), sqrt(col("deg")).as("v"))
    val u1 = {
      val nrm = norm(u1raw)
      u1raw.select(col("id"), (col("v") / nrm).as("v")).localCheckpoint(true)
    }

    var basis = List(u1) // deflation set, u1 first
    val comps = (1 to k).map { _ =>
      // deterministic, parallelism-independent start in [-0.5, 0.5]
      var v = degrees.select(col("id"),
        ((pmod(xxhash64(col("id"), lit(basis.size)), lit(1000000L))
          .cast("double") + 0.5) / 1000000.0 - 0.5).as("v"))
        .localCheckpoint(true)
      for (it <- 1 to iters) {
        // v ← S v (one join + one groupBy over the edge frame); nodes
        // with no surviving mass keep 0 via the degrees left join
        val sv = sEdges.join(v.select(col("id").as("src"), col("v")), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("s") * col("v")).as("v"))
        val full = degrees.select("id").join(sv, Seq("id"), "left")
          .select(col("id"), coalesce(col("v"), lit(0.0)).as("v"))
        // deflate against every converged direction, then renormalize
        var next = full
        basis.foreach { u =>
          val c = dot(next, u)
          next = next.join(u.withColumnRenamed("v", "__uv"), "id")
            .select(col("id"), (col("v") - lit(c) * col("__uv")).as("v"))
        }
        val nrm = norm(next)
        v = next.select(col("id"),
            (col("v") / lit(if (nrm < 1e-15) 1.0 else nrm)).as("v"))
          .localCheckpoint(true)
      }
      // canonical sign: smallest id non-negative
      val sgn = v.orderBy("id").select("v").head().getDouble(0)
      val signed =
        if (sgn < 0) v.select(col("id"), (col("v") * -1).as("v")).localCheckpoint(true)
        else v
      basis = basis :+ signed
      signed
    }

    comps.zipWithIndex
      .map { case (c, i) =>
        c.select(col("id"), round(col("v"), 6).as(s"e${i + 1}")) }
      .reduce(_.join(_, "id"))
  }
}
