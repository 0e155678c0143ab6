package graft

import graft.core.Tables
import graft.text.{Doremi, Dsir}
import org.apache.spark.sql.functions._

/** DSIR importance weighting/selection and the DoReMi reweighting loop. */
class DsirDoremiSpec extends SparkSpec {
  import spark.implicits._

  test("dsir: target-corpus docs score higher than off-target docs") {
    // two disjoint vocabularies: target-speak vs noise
    val docs = (
      (0 until 20).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta", "tgt")) ++
      (20 until 40).map(i => (i.toLong, "one two three four five six seven", "raw"))
    ).toDF("doc_id", "text", "source")
    val w = Dsir.importanceWeights(docs, docs.filter($"source" === "tgt"), "doc_id", "text")
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(avg("dsir_weight").as("w"))
      .as[(String, Double)].collect().toMap
    assert(w("tgt") > w("raw"))
    assert(w("tgt") > 0 && w("raw") < 0) // LLR sign separates the corpora
  }

  test("dsir: 1-token and empty docs don't break the n-gram expansion") {
    val docs = Seq((1L, "single", "a"), (2L, "", "a"), (3L, "two words", "a"))
      .toDF("doc_id", "text", "source")
    val w = Dsir.importanceWeights(docs, docs, "doc_id", "text")
      .select("doc_id", "n_ngrams").as[(Long, Long)].collect().toMap
    assert(w(1L) === 1L)      // one unigram, no bigram
    assert(!w.contains(2L))   // empty doc has no n-grams → no row
    assert(w(3L) === 3L)      // 2 unigrams + 1 bigram
  }

  test("dsir: selectTopFraction keeps ~fraction, all above threshold") {
    val docs = Tables.load(spark, sf, "documents")
    val target = docs.filter($"source".isin("src0", "src1", "src2"))
    val all = Dsir.importanceWeights(docs, target, "doc_id", "text").count()
    val kept = Dsir.selectTopFraction(docs, target, "doc_id", "text", 0.25)
    val k = kept.count()
    assert(k >= (all * 0.25).toLong - 1 && k <= (all * 0.30).toLong + 2)
    // and the kept docs are the top-weighted ones: min(kept) >= max(dropped)
    val minKept = kept.agg(min("dsir_weight")).first().getDouble(0)
    val w = Dsir.importanceWeights(docs, target, "doc_id", "text")
    val maxDropped = w.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
      .agg(max("dsir_weight")).first().getDouble(0)
    assert(minKept >= maxDropped)
  }

  test("dsir plan: scoring join broadcasts the bucket table, no BNLJ") {
    val docs = Tables.load(spark, sf, "documents")
    val target = docs.filter($"source".isin("src0"))
    val plan = Dsir.importanceWeights(docs, target, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
  }

  test("doremi: higher excess loss ⇒ higher weight; weights sum to 1") {
    val ex = Seq(("a", 0.1), ("b", 0.5), ("c", 0.9)).toDF("domain", "excess")
    val w = Doremi.weights(ex, "domain", "excess", eta = 1.0, steps = 5, smoothing = 0.01)
      .as[(String, Double)].collect().toMap
    assert(w("c") > w("b") && w("b") > w("a"))
    assert(math.abs(w.values.sum - 1.0) < 1e-9)
    // smoothing floors every domain above c/k
    assert(w("a") > 0.01 / 3)
  }

  test("doremi: uniform excess ⇒ uniform mixture regardless of eta/steps") {
    val ex = Seq(("a", 0.7), ("b", 0.7), ("c", 0.7), ("d", 0.7)).toDF("domain", "excess")
    val w = Doremi.weights(ex, "domain", "excess", eta = 2.0, steps = 10, smoothing = 0.05)
      .as[(String, Double)].collect().toMap
    w.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("doremi: more steps concentrate more mass on the hardest domain") {
    val ex = Seq(("a", 0.0), ("b", 1.0)).toDF("domain", "excess")
    def top(steps: Int) =
      Doremi.weights(ex, "domain", "excess", steps = steps)
        .as[(String, Double)].collect().toMap.apply("b")
    assert(top(1) < top(3) && top(3) < (1 to 8).map(_ => top(8)).head)
  }
}
