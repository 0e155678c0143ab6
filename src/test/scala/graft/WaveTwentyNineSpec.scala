package graft

import graft.proximity.EmbedDiagnostics
import org.apache.spark.sql.functions._

/** Wave-29 kernels: anisotropy, hubness, LID, Fisher ratio, centroid
  * distances, norm profile. */
class WaveTwentyNineSpec extends SparkSpec {
  import spark.implicits._

  test("anisotropy: aligned pair = 1, orthogonal pair = 0") {
    val aligned = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(1.0f, 0.0f)))
      .toDF("id", "embedding")
    assert(EmbedDiagnostics.anisotropy(aligned, "embedding")
      .head().getAs[Double]("mean_cosine") === 1.0)
    val ortho = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("id", "embedding")
    assert(EmbedDiagnostics.anisotropy(ortho, "embedding")
      .head().getAs[Double]("mean_cosine") === 0.0)
    val opposed = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(-1.0f, 0.0f)))
      .toDF("id", "embedding")
    assert(EmbedDiagnostics.anisotropy(opposed, "embedding")
      .head().getAs[Double]("mean_cosine") === -1.0)
  }

  test("hubness: 1-D chain in-degrees {1,2,1,0}") {
    val df = Seq((0, Seq(0.0f)), (1, Seq(1.0f)), (2, Seq(2.0f)),
      (3, Seq(3.0f))).toDF("vec_id", "embedding")
    val r = EmbedDiagnostics.hubness(df, "vec_id", "embedding", k = 1)
      .head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("max_indegree") === 2L)
    assert(r.getAs[Long]("n_orphans") === 1L)
    assert(r.getAs[Double]("indegree_skew") === 0.0)
  }

  test("lidByLabel: a 1-D grid reads out near dimension 1") {
    val df = (0 until 10).map(i =>
      (i, Seq(i.toFloat), "a")).toDF("vec_id", "embedding", "label")
    val r = EmbedDiagnostics.lidByLabel(df, "vec_id", "embedding",
      "label", k = 3).head()
    assert(r.getAs[Long]("n_used") === 10L)
    val lid = r.getAs[Double]("mean_lid")
    assert(lid > 1.0 && lid < 2.0)
  }

  test("fisherRatio: the separating dimension tops the scan") {
    val df = (0 until 20).map { i =>
      val l = i % 2
      // dim 0 separates perfectly-ish; dim 1 is label-free noise
      (Seq(l.toFloat + (i % 3) * 0.01f, (i % 5) * 0.1f), l)
    }.toDF("embedding", "label")
    val top = EmbedDiagnostics.fisherRatio(df, "embedding", "label",
      topK = 2).collect()
    assert(top(0).getAs[Int]("dim") === 0)
    assert(top(0).getAs[Double]("fisher_ratio") >
      top(1).getAs[Double]("fisher_ratio"))
  }

  test("centroidDistances: 1-D centroids 0 and 3 sit 3 apart") {
    val df = (Seq(( Seq(0.0f), 0), (Seq(0.0f), 0),
      (Seq(3.0f), 1), (Seq(3.0f), 1))).toDF("embedding", "label")
    val r = EmbedDiagnostics.centroidDistances(df, "embedding",
      "label").head()
    assert(r.getAs[String]("label_a") === "0")
    assert(r.getAs[Double]("dist") === 3.0)
  }

  test("normProfile: the 3-4-5 vector") {
    val df = Seq((Seq(3.0f, 4.0f), "a"), (Seq(3.0f, 4.0f), "a"))
      .toDF("embedding", "label")
    val r = EmbedDiagnostics.normProfile(df, "embedding", "label")
      .head()
    assert(r.getAs[Double]("mean_norm") === 5.0)
    assert(r.getAs[Double]("p50_norm") === 5.0)
    assert(r.getAs[Double]("max_norm") === 5.0)
  }
}
