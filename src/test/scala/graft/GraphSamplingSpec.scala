package graft

import graft.core.Tables
import graft.operators.{Events, Sampling}
import graft.proximity.Graph
import org.apache.spark.sql.functions._

/** PageRank, grid resampling with forward fill, SCD2 intervals,
  * deterministic weighted sampling. */
class GraphSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("pageRank: star graph concentrates rank on the hub; mass sums to 1") {
    // spokes all point at the hub
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // hub dominates (it is dangling, so part of its mass re-spreads
    // each round — it can't hold everything)
    (1L to 9L).foreach(i => assert(pr(0L) > 4 * pr(i)))
    // spokes are symmetric → identical rank
    assert((1L to 9L).map(pr).distinct.size === 1)
  }

  test("pageRank: dangling mass is redistributed, not lost") {
    // 0 → 1, 1 has no out-edges (dangling)
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 20).as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    assert(pr(1L) > pr(0L)) // 1 receives all of 0's mass
  }

  test("labelPropagation: two cliques converge to two communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)))
      .toDF("src", "dst")
    val lab = Graph.labelPropagation(edges, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(Seq(0L, 1L, 2L, 3L).map(lab).distinct.size === 1)
    assert(Seq(10L, 11L, 12L, 13L).map(lab).distinct.size === 1)
    assert(lab(0L) !== lab(10L))
  }

  test("triangleCount: counts exact on a known graph, direction ignored") {
    // triangle 0-1-2 plus a pendant edge 2-3; reversed/parallel edges dedupe
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (2L, 3L))
      .toDF("src", "dst")
    val tc = Graph.triangleCount(edges).as[(Long, Long)].collect().toMap
    assert(tc === Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("resampleFfill: hourly grid carries the last value forward") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      (1L, ts("2024-01-01 02:50:00"), 20.0)
    ).toDF("user_id", "ts", "value")
    val got = Events.resampleFfill(obs, "user_id", "ts", "value", 3600)
      .select("ts", "asof_value")
      .as[(java.sql.Timestamp, Option[Double])].collect()
      .map { case (t, v) => (t.toString.take(19), v) }.toMap
    // grid aligns to hour floors: 00:00 (before first obs → null),
    // 01:00 and 02:00 carry 10.0
    assert(got("2024-01-01 00:00:00").isEmpty)
    assert(got("2024-01-01 01:00:00").contains(10.0))
    assert(got("2024-01-01 02:00:00").contains(10.0))
    assert(got.size === 3) // grid ends at floor(max ts) = 02:00
  }

  test("scd2Intervals: consecutive duplicate states compact; intervals chain") {
    val evs = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-01 01:00:00"), "A"), // duplicate → compacted
      (1L, ts("2024-01-01 02:00:00"), "B"),
      (1L, ts("2024-01-01 03:00:00"), "A")  // back to A → new interval
    ).toDF("user_id", "ts", "state")
    val got = Events.scd2Intervals(evs, "user_id", "ts", "state")
      .orderBy("valid_from")
      .select("state", "valid_from", "valid_to")
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
      .map { case (s, f, t) => (s, f.toString.take(13), t.map(_.toString.take(13))) }
    assert(got.toSeq === Seq(
      ("A", "2024-01-01 00", Some("2024-01-01 02")),
      ("B", "2024-01-01 02", Some("2024-01-01 03")),
      ("A", "2024-01-01 03", None)))
  }

  test("weightedSamplePerGroup: deterministic, k per group, weight-biased") {
    val docs = Tables.load(spark, sf, "documents")
    val s1 = Sampling.weightedSamplePerGroup(docs, "source", "doc_id", "n_chars", 5)
    val s2 = Sampling.weightedSamplePerGroup(docs, "source", "doc_id", "n_chars", 5)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ===
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    val perGroup = s1.groupBy("source").count().as[(String, Long)].collect()
    assert(perGroup.forall(_._2 == 5))
    // weighting bias: across many uniform-ish draws the sampled docs
    // should skew longer than the corpus median
    val med = docs.agg(expr("percentile_approx(n_chars, 0.5)")).first().getLong(0)
    val sampledMean = s1.agg(avg("n_chars")).first().getDouble(0)
    assert(sampledMean > med * 0.9)
  }
}
