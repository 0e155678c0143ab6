package graft

import graft.dedup.Contamination
import graft.eda.DataAudit
import graft.proximity.Truss
import org.apache.spark.sql.functions._

/** Wave-30 kernels: FD audit, key candidates, HHI, cross-table
  * consistency, k-truss support, contamination audit. */
class WaveThirtySpec extends SparkSpec {
  import spark.implicits._

  test("fdAudit: holding vs violated dependency") {
    val df = Seq(("b1", "m1", "t1"), ("b1", "m1", "t2"),
      ("b2", "m2", "t1")).toDF("brand", "mfgr", "typ")
    val r = DataAudit.fdAudit(df, Seq(("brand", "mfgr"),
      ("typ", "brand"))).collect()
    val byDet = r.map(x => x.getAs[String]("determinant") -> x).toMap
    assert(byDet("brand").getAs[Long]("n_violating") === 0L)
    // t1 appears under both b1 and b2
    assert(byDet("typ").getAs[Long]("n_violating") === 1L)
    assert(byDet("typ").getAs[Double]("violation_rate") === 0.5)
  }

  test("keyCandidates: unique id, dup cat, null column") {
    val df = Seq((1, "x", Some("a")), (2, "x", None),
      (3, "y", Some("b"))).toDF("id", "cat", "opt")
    val r = DataAudit.keyCandidates(df, Seq("id", "cat", "opt"))
      .collect().map(x => x.getAs[String]("column") -> x).toMap
    assert(r("id").getAs[Boolean]("is_unique_key"))
    assert(r("cat").getAs[Long]("n_distinct") === 2L)
    assert(!r("cat").getAs[Boolean]("is_unique_key"))
    assert(r("opt").getAs[Long]("n_null") === 1L)
    assert(r("opt").getAs[Double]("uniqueness") === 1.0)
    assert(!r("opt").getAs[Boolean]("is_unique_key"))
  }

  test("herfindahl: even split = 0.5, monopoly = 1") {
    val df = Seq((1, "a", 50.0), (1, "b", 50.0), (2, "a", 70.0))
      .toDF("g", "e", "v")
    val r = DataAudit.herfindahl(df, "g", "e", "v").collect()
      .map(x => x.getAs[Int]("group") -> x.getAs[Double]("hhi")).toMap
    assert(r(1) === 0.5)
    assert(r(2) === 1.0)
  }

  test("consistencyAudit: one drifted order out of two") {
    val li = Seq((1L, 100.0, 0.1, 0.0), (1L, 50.0, 0.0, 0.1),
      (2L, 200.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    // order 1 true total = 90 + 55 = 145; order 2 = 200 but booked 210
    val o = Seq((1L, 145.0), (2L, 210.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = DataAudit.consistencyAudit(li, o).head()
    assert(r.getAs[Long]("n_orders") === 2L)
    assert(r.getAs[Long]("n_mismatch") === 1L)
    assert(math.abs(r.getAs[Double]("max_rel_diff") - 10.0 / 210) < 1e-6)
  }

  test("supportHistogram: triangle plus pendant") {
    val edges = Seq((1, 2), (2, 3), (3, 1), (3, 4)).toDF("src", "dst")
    val r = Truss.supportHistogram(edges).collect()
      .map(x => x.getAs[Long]("support") -> x.getAs[Long]("n_edges"))
      .toMap
    assert(r(0L) === 1L)
    assert(r(1L) === 3L)
  }

  test("evalOverlap: verbatim copy scores 1, fresh text 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (50L, "the quick brown fox jumps over the lazy dog"),
      (100L, "completely different words in this one here now"))
      .toDF("doc_id", "text")
    val r = Contamination.evalOverlap(docs, "doc_id", "text",
      isEval = col("doc_id") % 50 === 0, n = 3).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("overlap"))
      .toMap
    assert(r(50L) === 1.0)
    assert(r(100L) === 0.0)
  }
}
