package graft.ml

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampled 2D projections beyond the distributed PCA in
  * [[Models.projection2D]] — the UMAP/TSNE/MDS family
  * (reference: src/workbench/algorithms/dataframe/projection_2d.py:17-166).
  *
  * The reference runs these driver-side in pandas/sklearn/umap on the full
  * (interactive-sized) frame. Here the contract is scale-honest: a
  * deterministic hash-ordered sample of ≤ `maxRows` rows is collected to
  * the driver (top-k by xxhash64 — no global sort materialization), the
  * embedding runs on that sample, and the result comes back as a small
  * (id, x, y) DataFrame to join against the source. The 100 TB picture:
  * the sample is the documented cap, exactly like the reference's own
  * ≤100k practice — the distributed path for "project everything" remains
  * PCA.
  *
  * Methods:
  *  - "pca": exact 2-component PCA (covariance + power iteration).
  *  - "mds": classical MDS (PCA of the double-centered squared-distance
  *    matrix) — O(n²) memory, so `maxRows` is clamped to 2000.
  *  - "umap" / "tsne": PCA init + a seeded attract/repel force layout
  *    over the exact kNN graph (n_neighbors = 5, min_dist-style floor).
  *    This is a STUB of the real algorithms in the reference's spirit
  *    (no UMAP/sklearn in this environment): deterministic, neighbor-
  *    preserving, but NOT the published UMAP/t-SNE optimization.
  *
  * Coincident projected points are resolved by seeded jitter at rounding
  * precision 3, mirroring resolve_coincident_points
  * (projection_2d.py:127-166).
  */
object Projection {

  def projection2DSampled(df: DataFrame, idCol: String, features: Seq[String],
                          method: String = "umap", maxRows: Int = 10000,
                          seed: Long = 42L): DataFrame = {
    require(features.size >= 2, "at least two numeric features required")
    val cap = if (method == "mds") math.min(maxRows, 2000) else maxRows
    // deterministic pseudo-random sample: top-k by (hash, id) — a
    // TakeOrderedAndProject, not a global sort
    val sampled = df
      .select((col(idCol) +: features.map(c => col(c).cast("double"))).toIndexedSeq: _*)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(cap)
      .collect()
    val n = sampled.length
    require(n > 0, "projection2DSampled needs a non-empty input")
    val d = features.size

    // standardize with null→mean (projection_2d.py:70-73)
    val x = Array.ofDim[Double](n, d)
    val mean = new Array[Double](d); val m2 = new Array[Double](d)
    val cnt = new Array[Long](d)
    sampled.zipWithIndex.foreach { case (r, i) =>
      var j = 0
      while (j < d) {
        x(i)(j) = if (r.isNullAt(j + 1)) Double.NaN else r.getDouble(j + 1)
        if (!x(i)(j).isNaN) { cnt(j) += 1; mean(j) += x(i)(j); m2(j) += x(i)(j) * x(i)(j) }
        j += 1
      }
    }
    var j = 0
    while (j < d) {
      if (cnt(j) > 0) { mean(j) /= cnt(j); m2(j) = m2(j) / cnt(j) - mean(j) * mean(j) }
      j += 1
    }
    val std = m2.map(v => math.sqrt(math.max(v, 0.0))).map(s => if (s < 1e-12) 1.0 else s)
    for (i <- 0 until n; k <- 0 until d) {
      val v = if (x(i)(k).isNaN) mean(k) else x(i)(k)
      x(i)(k) = (v - mean(k)) / std(k)
    }

    val xy: Array[Array[Double]] = method.toLowerCase match {
      case "pca" => pca2(x)
      case "mds" => mds2(x)
      case _ => forceLayout(x, seed) // "umap" / "tsne" stub
    }
    resolveCoincident(xy, seed)

    val spark = df.sparkSession
    val idField = df.schema(idCol)
    val outSchema = StructType(Seq(idField,
      StructField("x", DoubleType), StructField("y", DoubleType)))
    val rows = sampled.zipWithIndex.map { case (r, i) =>
      Row(r.get(0), xy(i)(0), xy(i)(1))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), outSchema)
  }

  /** Exact top-2 PCA of a standardized matrix: d×d covariance + power
    * iteration with deflation, deterministic start vectors. */
  private[graft] def pca2(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length; val d = x(0).length
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until n; a <- 0 until d; b <- 0 until d)
      cov(a)(b) += x(i)(a) * x(i)(b) / math.max(n - 1, 1)
    def powerIter(m: Array[Array[Double]]): Array[Double] = {
      var v = Array.tabulate(d)(k => 1.0 / math.sqrt(d.toDouble) + 1e-3 * k)
      var it = 0
      while (it < 100) {
        val w = new Array[Double](d)
        for (a <- 0 until d; b <- 0 until d) w(a) += m(a)(b) * v(b)
        val norm = math.sqrt(w.map(t => t * t).sum)
        v = if (norm < 1e-12) v else w.map(_ / norm)
        it += 1
      }
      v
    }
    val v1 = powerIter(cov)
    val l1 = (for (a <- 0 until d; b <- 0 until d) yield v1(a) * cov(a)(b) * v1(b)).sum
    val deflated = Array.tabulate(d, d)((a, b) => cov(a)(b) - l1 * v1(a) * v1(b))
    val v2 = powerIter(deflated)
    x.map(r => Array(
      (0 until d).map(k => r(k) * v1(k)).sum,
      (0 until d).map(k => r(k) * v2(k)).sum))
  }

  /** Classical MDS: PCA of the double-centered −½·D² Gram matrix. */
  private def mds2(x: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    val d2 = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i + 1 until n) {
      var s = 0.0; var k = 0
      while (k < x(0).length) { val t = x(i)(k) - x(j)(k); s += t * t; k += 1 }
      d2(i)(j) = s; d2(j)(i) = s
    }
    val rowMean = d2.map(_.sum / n)
    val grand = rowMean.sum / n
    val gram = Array.tabulate(n, n)((i, j) =>
      -0.5 * (d2(i)(j) - rowMean(i) - rowMean(j) + grand))
    // embed via power iteration on the Gram matrix (top-2 eigenvectors)
    def powerIter(m: Array[Array[Double]], exclude: Option[(Array[Double], Double)]): (Array[Double], Double) = {
      var v = Array.tabulate(n)(k => 1.0 / math.sqrt(n.toDouble) + 1e-3 * (k % 7))
      var lambda = 0.0
      var it = 0
      while (it < 100) {
        val w = new Array[Double](n)
        for (a <- 0 until n; b <- 0 until n) w(a) += m(a)(b) * v(b)
        exclude.foreach { case (u, _) => // orthogonalize against v1
          val proj = (0 until n).map(k => u(k) * w(k)).sum
          for (a <- 0 until n) w(a) -= proj * u(a)
        }
        val norm = math.sqrt(w.map(t => t * t).sum)
        if (norm > 1e-12) { v = w.map(_ / norm); lambda = norm }
        it += 1
      }
      (v, lambda)
    }
    val (v1, l1) = powerIter(gram, None)
    val (v2, l2) = powerIter(gram, Some((v1, l1)))
    Array.tabulate(n)(i => Array(v1(i) * math.sqrt(math.max(l1, 0.0)),
      v2(i) * math.sqrt(math.max(l2, 0.0))))
  }

  /** Seeded attract/repel layout over the exact kNN graph, PCA-initialized
    * — the UMAP/TSNE stand-in. Deterministic for a fixed seed. */
  private def forceLayout(x: Array[Array[Double]], seed: Long,
                          k: Int = 5, epochs: Int = 60): Array[Array[Double]] = {
    val n = x.length
    val xy = pca2(x)
    if (n <= 2) return xy
    val kk = math.min(k, n - 1)
    // exact kNN in feature space (n ≤ maxRows by construction)
    val nbrs = Array.ofDim[Int](n, kk)
    val dists = new Array[(Double, Int)](n - 1)
    for (i <- 0 until n) {
      var m = 0
      for (j2 <- 0 until n if j2 != i) {
        var s = 0.0; var t = 0
        while (t < x(0).length) { val dv = x(i)(t) - x(j2)(t); s += dv * dv; t += 1 }
        dists(m) = (s, j2); m += 1
      }
      java.util.Arrays.sort(dists, Ordering.by((p: (Double, Int)) => p))
      for (q <- 0 until kk) nbrs(i)(q) = dists(q)._2
    }
    val rnd = new scala.util.Random(seed)
    val minDist = 0.05
    for (epoch <- 0 until epochs) {
      val lr = 0.1 * (1.0 - epoch.toDouble / epochs)
      for (i <- 0 until n) {
        // attraction toward kNN neighbors
        for (q <- 0 until kk) {
          val jn = nbrs(i)(q)
          val dx = xy(jn)(0) - xy(i)(0); val dy = xy(jn)(1) - xy(i)(1)
          val dist = math.sqrt(dx * dx + dy * dy) + 1e-9
          val pull = lr * math.max(dist - minDist, 0.0) / dist
          xy(i)(0) += pull * dx; xy(i)(1) += pull * dy
        }
        // repulsion from a few random non-neighbors
        var rcount = 0
        while (rcount < 3) {
          val jn = rnd.nextInt(n)
          if (jn != i) {
            val dx = xy(jn)(0) - xy(i)(0); val dy = xy(jn)(1) - xy(i)(1)
            val d2v = dx * dx + dy * dy + 1e-6
            val push = lr * 0.05 / d2v
            xy(i)(0) -= math.min(push, lr) * dx
            xy(i)(1) -= math.min(push, lr) * dy
          }
          rcount += 1
        }
      }
    }
    xy
  }

  /** Seeded jitter for points that collide at rounding precision 3
    * (projection_2d.py:127-166). Mutates in place. */
  private[graft] def resolveCoincident(xy: Array[Array[Double]], seed: Long): Unit = {
    val precision = 3
    val jitter = math.pow(10, -precision) * 2
    val rnd = new scala.util.Random(seed ^ 0x9e3779b97f4a7c15L)
    val groups = xy.indices.groupBy(i =>
      (math.rint(xy(i)(0) * 1000) / 1000, math.rint(xy(i)(1) * 1000) / 1000))
    groups.toSeq.sortBy(_._1).foreach { case (_, idxs) =>
      if (idxs.size > 1) idxs.foreach { i =>
        xy(i)(0) += jitter * (rnd.nextDouble() * 2 - 1)
        xy(i)(1) += jitter * (rnd.nextDouble() * 2 - 1)
      }
    }
  }
}
