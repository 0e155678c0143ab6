package graft

import graft.dedup.Canonical
import graft.eda.Privacy
import graft.ml.Silhouette
import graft.operators.MarkovAttribution
import graft.text.NegativeSampling
import org.apache.spark.sql.functions._

/** Privacy audit (q250), simplified silhouette (q253), negative
  * sampling (q254), canonical keep-policy (q255) and Markov removal
  * attribution (q249): hand-computed answers on toy fixtures. */
class PrivacyCanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymityAudit: class sizes, at-risk rows, l-diversity floor") {
    // classes: A x3 (sensitive x,x,y -> l=2), B x1 (l=1), C x2 (l=2)
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "z"),
      ("C", "p"), ("C", "q"))
      .toDF("qid", "s")
    val out = Privacy.kAnonymityAudit(df, Seq("qid"), "s", ks = Seq(2, 3))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(2, 3))
    val k2 = out(2); val k3 = out(3)
    assert(k2.getLong(1) == 3)               // n_classes
    assert(k2.getLong(2) == 1 && k2.getLong(3) == 1) // below, at-risk
    assert(k2.getDouble(4) == round6(1.0 / 6))
    assert(k2.getLong(5) == 1)               // min l-diversity (class B)
    assert(k3.getLong(2) == 2 && k3.getLong(3) == 3)
    assert(k3.getDouble(4) == 0.5)
  }

  test("simplifiedSilhouette: two tight, distant clusters score high") {
    // cluster 0: (0,0),(0,1); cluster 1: (10,10),(10,11)
    // centroids (0, .5) and (10, 10.5): a = .5 for every point;
    // b = 14.5 for the near corner, sqrt(190.25) for the far one
    val df = Seq(
      (1L, Seq(0.0, 0.0), 0), (2L, Seq(0.0, 1.0), 0),
      (3L, Seq(10.0, 10.0), 1), (4L, Seq(10.0, 11.0), 1))
      .toDF("id", "vec", "label")
    val out = Silhouette.simplifiedSilhouette(df, "id", "vec", col("label"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == Set(0, 1))
    assert(out(0).getLong(1) == 2)
    val bNear = 14.5
    val bFar = round6(math.sqrt(190.25))
    assert(out(0).getDouble(2) == 0.5)     // mean a
    assert(out(0).getDouble(3) == round6((bNear + bFar) / 2))
    val expSil = round6(((bNear - 0.5) / bNear + (bFar - 0.5) / bFar) / 2)
    assert(out(0).getDouble(4) == expSil)
    assert(out(1).getDouble(4) == expSil)  // symmetric geometry
  }

  test("sampleNegatives: deterministic, excludes self and own source, " +
      "k-capped within the probed bucket") {
    val docs = (0L until 200L).map(i => (i, s"s${i % 4}"))
      .toDF("doc_id", "source")
    val anchors = docs.filter(col("doc_id") < 20)
    val out = NegativeSampling.sampleNegatives(docs, "doc_id", "source",
      anchors, k = 3).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, rk, n, src) = (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))
      assert(n != a)
      assert(src != s"s${a % 4}")
      assert(rk >= 1 && rk <= 3)
    }
    val perAnchor = out.groupBy(_.getLong(0)).values
    assert(perAnchor.forall(_.length <= 3))
    // bit-identical rerun (md5 order, no RNG)
    val again = NegativeSampling.sampleNegatives(docs, "doc_id", "source",
      anchors, k = 3).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("keepPolicyManifest: best-quality row kept, ties to smaller id, " +
      "singletons pass through") {
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 7L))
      .toDF("id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Canonical.keepPolicyManifest(docs, "id", pairs, col("q"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 4)
    // cluster {1,2,3}: component min id 1, winner = max q tie smaller id = 2
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getLong(1) == 1L)      // cluster_id
      assert(out(id).getLong(2) == 2L)      // keep_id
      assert(out(id).getBoolean(3) == (id == 2L))
      assert(out(id).getLong(4) == 3L)      // cluster_size
    }
    assert(out(10L).getLong(1) == 10L && out(10L).getBoolean(3))
    assert(out(10L).getLong(4) == 1L)
  }

  test("removalEffect: hand-evolved two-channel chain") {
    // journeys: A->conv | A (no conv) | B->conv | B->conv
    // p(START)={A:.5,B:.5}; p(A)={CONV:.5,NULL:.5}; p(B)={CONV:1}
    // base conv = .75; remove A -> .5 (effect 1/3); remove B -> .25 (2/3)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-02-01 10:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "A", ts(1)), (1L, 2L, "P", ts(2)),
      (2L, 3L, "A", ts(1)),
      (3L, 4L, "B", ts(1)), (3L, 5L, "P", ts(2)),
      (4L, 6L, "B", ts(1)), (4L, 7L, "P", ts(2)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = MarkovAttribution.removalEffect(ev, "user_id", "ts",
        "event_type", "event_id", convType = "P", steps = 12)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A").getDouble(1) == 0.75 && out("B").getDouble(1) == 0.75)
    assert(out("A").getDouble(2) == 0.5)   // removal conv without A
    assert(out("B").getDouble(2) == 0.25)
    assert(out("A").getDouble(3) == round6(1.0 / 3))
    assert(out("B").getDouble(3) == round6(2.0 / 3))
    assert(out("A").getDouble(4) == round6(1.0 / 3)) // shares normalize
    assert(out("B").getDouble(4) == round6(2.0 / 3))
  }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
