package graft

import graft.eda.{Association, Histogram}
import graft.proximity.Hybrid
import graft.text.TfIdf
import org.apache.spark.sql.functions._

/** Wave-6 EDA/retrieval kernels: histograms, tf-idf pairs, RRF fusion,
  * categorical association. */
class HistogramAssocSpec extends SparkSpec {
  import spark.implicits._

  test("equiWidth: buckets partition the rows, edges span min..max") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val h = Histogram.equiWidth(df, "x", 10).orderBy("bucket").collect()
    assert(h.map(_.getLong(3)).sum === 1000L)
    assert(h.head.getDouble(1) === 1.0)   // first lo = min
    assert(h.last.getDouble(2) === 1000.0) // last hi = max
    assert(h.length === 10)
  }

  test("equiWidth: degenerate all-equal column collapses to one bucket") {
    val df = Seq.fill(50)(7.5).toDF("x")
    val h = Histogram.equiWidth(df, "x", 10).collect()
    assert(h.length === 1 && h.head.getInt(0) === 0 && h.head.getLong(3) === 50L)
  }

  test("equiDepth: distinct-valued column gives exactly equal depths") {
    val df = (1 to 800).map(_.toDouble).toDF("x")
    val h = Histogram.equiDepth(df, "x", 8).orderBy("bucket").collect()
    assert(h.length === 8)
    assert(h.forall(_.getLong(3) === 100L))
  }

  test("tfidf similarPairs: identical docs score 1, disjoint docs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    val pairs = TfIdf.similarPairs(docs, "doc_id", "text", 0.5, Long.MaxValue)
      .collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(2) === 1.0)
  }

  test("tfidf similarPairs plan: term equi-join, no cartesian/BNLJ") {
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val plan = TfIdf.similarPairs(docs, "doc_id", "text", 0.1, Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("rrfFuse: presence in both lists beats presence in one") {
    val dense = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "doc", "rank")
    val sparse = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("qid", "doc", "rank")
    val fused = Hybrid.rrfFuse(dense, sparse, "qid", "doc", "rank", 3)
      .orderBy("rank").select("doc", "rrf_score").as[(Long, Double)].collect()
    // doc 11: 1/62 + 1/61; doc 10: 1/61; doc 12: 1/62
    assert(fused.head._1 === 11L)
    assert(math.abs(fused.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(fused.map(_._1) === Array(11L, 10L, 12L))
  }

  test("mutualInformation: independent columns → 0, identical → H") {
    // product distribution: a ∈ {x,y} × b ∈ {u,v}, equal cells
    val ind = Seq.fill(25)(("x", "u")) ++ Seq.fill(25)(("x", "v")) ++
      Seq.fill(25)(("y", "u")) ++ Seq.fill(25)(("y", "v"))
    val mi0 = Association.mutualInformation(ind.toDF("a", "b"), "a", "b").head()
    assert(mi0.getDouble(0) === 0.0)
    assert(mi0.getDouble(3) === 0.0) // normalized
    // identical columns: MI = H(a) = ln 2, normalized = 1
    val same = (Seq.fill(50)(("x", "x")) ++ Seq.fill(50)(("y", "y"))).toDF("a", "b")
    val mi1 = Association.mutualInformation(same, "a", "b").head()
    assert(math.abs(mi1.getDouble(0) - math.log(2)) < 1e-6)
    assert(mi1.getDouble(3) === 1.0)
  }

  test("chiSquare: independence → chi2 0; empty-cell mass included") {
    val ind = Seq.fill(30)(("x", "u")) ++ Seq.fill(30)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(30)(("y", "v"))
    val r0 = Association.chiSquare(ind.toDF("a", "b"), "a", "b").head()
    assert(r0.getDouble(0) === 0.0 && r0.getLong(1) === 1L)
    // perfectly dependent 2×2 with two EMPTY cells: chi2 = n, V = 1
    val dep = (Seq.fill(40)(("x", "u")) ++ Seq.fill(60)(("y", "v"))).toDF("a", "b")
    val r1 = Association.chiSquare(dep, "a", "b").head()
    assert(math.abs(r1.getDouble(0) - 100.0) < 1e-6)
    assert(math.abs(r1.getDouble(2) - 1.0) < 1e-6)
  }
}
