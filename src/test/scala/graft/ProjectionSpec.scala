package graft

import graft.ml.Projection
import org.apache.spark.sql.functions._

/** Sampled 2D projections (VERDICT r1 item 7): determinism, cluster
  * preservation, coincident-point jitter, and the sample cap. */
class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated 5-D gaussian blobs. */
  private def blobs(n: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val c = if (i % 2 == 0) 0.0 else 8.0
      (i.toLong, c + rnd.nextGaussian(), c + rnd.nextGaussian(),
        c + rnd.nextGaussian(), c + rnd.nextGaussian(), c + rnd.nextGaussian())
    }.toDF("id", "f1", "f2", "f3", "f4", "f5")
  }

  private val feats = Seq("f1", "f2", "f3", "f4", "f5")

  test("umap stub: deterministic and separates blobs in 2D") {
    val df = blobs(300, 1L)
    val a = Projection.projection2DSampled(df, "id", feats, "umap")
      .orderBy("id").collect()
    val b = Projection.projection2DSampled(df, "id", feats, "umap")
      .orderBy("id").collect()
    assert(a.toSeq == b.toSeq, "same seed must give identical layout")
    // inter-blob centroid distance must dominate intra-blob spread
    val pts = a.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (even, odd) = pts.partition(_._1 % 2 == 0)
    def centroid(p: Array[(Long, Double, Double)]) =
      (p.map(_._2).sum / p.length, p.map(_._3).sum / p.length)
    val (cx0, cy0) = centroid(even); val (cx1, cy1) = centroid(odd)
    val between = math.hypot(cx1 - cx0, cy1 - cy0)
    val spread = even.map(p => math.hypot(p._2 - cx0, p._3 - cy0)).sum / even.length
    assert(between > 2 * spread,
      s"blobs not separated: between=$between spread=$spread")
  }

  test("pca and mds paths produce finite coordinates for every sampled row") {
    val df = blobs(150, 2L)
    for (m <- Seq("pca", "mds")) {
      val out = Projection.projection2DSampled(df, "id", feats, m).collect()
      assert(out.length == 150, m)
      assert(out.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN), m)
    }
  }

  test("maxRows cap bounds the sample deterministically") {
    val df = blobs(500, 3L)
    val a = Projection.projection2DSampled(df, "id", feats, "pca", maxRows = 100)
    val b = Projection.projection2DSampled(df, "id", feats, "pca", maxRows = 100)
    assert(a.count() == 100)
    assert(a.select("id").collect().map(_.getLong(0)).toSet ==
      b.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("coincident points get jittered apart (projection_2d.py:127-166)") {
    val xy = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(2.0, 3.0))
    Projection.resolveCoincident(xy, 42L)
    assert(xy(0).toSeq != xy(1).toSeq, "coincident pair must be jittered")
    assert(xy(2).toSeq == Seq(2.0, 3.0), "unique point untouched")
  }

  test("null features fall back to column mean; constant column survives") {
    val df = Seq[(Long, java.lang.Double, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 5.0, 1.0), (2L, null, 6.0, 1.0), (3L, 3.0, null, 1.0),
      (4L, 4.0, 8.0, 1.0)).toDF("id", "a", "b", "c")
    val out = Projection.projection2DSampled(df, "id", Seq("a", "b", "c"), "pca")
      .collect()
    assert(out.length == 4)
    assert(out.forall(r => !r.getDouble(1).isNaN && !r.getDouble(2).isNaN))
  }
}
