package graft

import graft.ml.SpectralEmbedding
import org.apache.spark.sql.functions._

/** Distributed Laplacian-eigenmaps embedding: cluster separation on a
  * planted two-clique graph, orthonormality of the returned
  * coordinates, and determinism across runs. */
class SpectralEmbeddingSpec extends SparkSpec {
  import spark.implicits._

  // two 25-cliques joined by a single bridge edge — the classic case
  // where the second eigenvector (first non-trivial) splits components
  private lazy val twoCliques = {
    val intra = for {
      c <- Seq(0, 25); i <- 0 until 25; j <- (i + 1) until 25
    } yield (c + i.toLong, c + j.toLong)
    (intra :+ (24L, 25L)).toDF("src", "dst")
  }

  test("second eigenvector separates planted cliques by sign") {
    val emb = SpectralEmbedding.embed(twoCliques, "src", "dst", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(emb.size == 50)
    val a = (0L to 24L).map(emb)
    val b = (25L to 49L).map(emb)
    // every node of one clique on one side, the other clique opposite
    assert(a.forall(_ > 0) != b.forall(_ > 0) &&
      (a.forall(_ > 0) || a.forall(_ < 0)), s"a=$a b=$b")
    assert(b.forall(_ > 0) || b.forall(_ < 0))
  }

  test("components are unit-norm, mutually orthogonal, deterministic") {
    val out = SpectralEmbedding.embed(twoCliques, "src", "dst", k = 2)
      .orderBy("id").collect()
    val e1 = out.map(_.getDouble(1)); val e2 = out.map(_.getDouble(2))
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    assert(math.abs(dot(e1, e1) - 1.0) < 1e-3)
    assert(math.abs(dot(e2, e2) - 1.0) < 1e-3)
    assert(math.abs(dot(e1, e2)) < 1e-3)
    // trivial direction deflated: weighted by sqrt(deg), e1 sums to ~0
    val again = SpectralEmbedding.embed(twoCliques, "src", "dst", k = 2)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(again.toSeq == e1.toSeq) // bit-identical rerun
  }

  test("weighted edges: heavier within-cluster ties still split first") {
    val e = Seq((1L, 2L, 10.0), (2L, 3L, 10.0), (1L, 3L, 10.0),
      (4L, 5L, 10.0), (5L, 6L, 10.0), (4L, 6L, 10.0),
      (3L, 4L, 0.1)).toDF("src", "dst", "w")
    val emb = SpectralEmbedding.embed(e, "src", "dst", Some("w"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = Seq(1L, 2L, 3L).map(emb); val b = Seq(4L, 5L, 6L).map(emb)
    assert(a.forall(_ > 0) != b.forall(_ > 0) &&
      (a.forall(_ > 0) || a.forall(_ < 0)))
  }
}
