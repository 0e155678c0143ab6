package graft

import graft.dedup.SemDedup
import graft.text.C4
import org.apache.spark.sql.functions._

/** C4 heuristic cleaning + SemDeDup semantic dedup (round-7 additions to
  * the training-data pack; SURVEY §2.12). */
class C4SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("C4 line rules: terminal punctuation, min words, javascript tell") {
    val page = Seq(
      "This sentence has enough words and ends well.",
      "No terminal punctuation here so it drops entirely",
      "Too short.",
      "Please enable javascript to view this page.",
      "Another perfectly reasonable line of prose ends here!").mkString("\n")
    val out = Seq((1L, page)).toDF("doc_id", "text")
      .select(C4.cleanLines(col("text")).as("c4"))
      .head.getString(0)
    val kept = out.split("\n")
    assert(kept.length == 2, s"expected 2 surviving lines, got ${kept.toSeq}")
    assert(kept(0).startsWith("This sentence") && kept(1).startsWith("Another"))
  }

  test("C4 page rules: sentence floor, lorem ipsum, curly brace") {
    val good = (1 to 4).map(i => s"Sentence number $i is long enough to pass.").mkString("\n")
    val docs = Seq(
      (1L, good),                                      // passes everything
      (2L, good + "\nlorem ipsum dolor sit amet etc."), // placeholder page
      (3L, good + "\nfunction f() { return 1; }"),      // code page
      (4L, "Just one good sentence lives right here.")  // under sentence floor
    ).toDF("doc_id", "text")
    val out = C4.pageFilters(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(r => r.getLong(0) -> r.getBoolean(3)).toSeq ==
      Seq(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    // doc 1: all four sentences survive the line filter
    assert(out(0).getLong(2) == 4L)
    // doc 4: line is fine, page just has too few sentences
    assert(out(3).getLong(2) == 1L)
  }

  // two well-separated direction groups; within each, a planted
  // near-parallel duplicate pair plus a singleton pointing away
  private def semFixture = Seq(
    (1L, Array(1.0f, 0.0f, 0.01f, 0.0f)),  // A-dup twin 1
    (2L, Array(1.0f, 0.01f, 0.0f, 0.0f)),  // A-dup twin 2
    (3L, Array(0.8f, 0.6f, 0.0f, 0.0f)),   // A singleton (cos ~0.8 vs twins)
    (4L, Array(0.0f, 0.0f, 1.0f, 0.01f)),  // B-dup twin 1
    (5L, Array(0.0f, 0.01f, 1.0f, 0.0f)),  // B-dup twin 2
    (6L, Array(0.0f, 0.6f, 0.8f, 0.0f))    // B singleton
  ).toDF("vec_id", "embedding")

  test("semDedup: one of each planted twin pair drops, singletons survive") {
    val out = SemDedup.semDedup(semFixture, "vec_id", "embedding",
      nClusters = 2, tau = 0.95)
    assert(out.count() == 6, "one verdict row per input row")
    val keep = out.filter(col("keep")).select("id").as[Long].collect().toSet
    assert(keep.contains(3L) && keep.contains(6L), "singletons must survive")
    assert(Set(1L, 2L).intersect(keep).size == 1,
      s"exactly one A-twin survives, kept=$keep")
    assert(Set(4L, 5L).intersect(keep).size == 1,
      s"exactly one B-twin survives, kept=$keep")
    // keep-rule: the surviving twin is the one FARTHER from its centroid
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getBoolean(3))).toMap
    for (pair <- Seq(Set(1L, 2L), Set(4L, 5L))) {
      val (kept, dropped) = (pair.find(rows(_)._3).get, pair.find(!rows(_)._3).get)
      assert(rows(kept)._2 <= rows(dropped)._2,
        s"kept twin $kept must not be closer to centroid than dropped $dropped")
    }
  }

  test("semDedup is deterministic under the seed") {
    def run() = SemDedup.semDedup(semFixture, "vec_id", "embedding",
      nClusters = 2, tau = 0.95).orderBy("id").collect().toSeq
    assert(run() == run())
  }

  test("semDedup validates arguments") {
    intercept[IllegalArgumentException](
      SemDedup.semDedup(semFixture, "vec_id", "embedding", nClusters = 1))
    intercept[IllegalArgumentException](
      SemDedup.semDedup(semFixture, "vec_id", "embedding", tau = 1.5))
    intercept[IllegalArgumentException](
      SemDedup.semDedup(semFixture, "vec_id", "embedding", maxClusterSize = 0))
  }

  test("semDedup cluster cap: bounded sub-blocks, verdict per row, recall-only trade") {
    // cap of 1 forces singleton-ish sub-blocks: work stays bounded, every
    // row still gets a verdict, and capping can only MISS dups (more
    // keeps), never invent drops
    val capped = SemDedup.semDedup(semFixture, "vec_id", "embedding",
      nClusters = 2, tau = 0.95, maxClusterSize = 1)
    assert(capped.count() == 6)
    val keptCapped = capped.filter(col("keep")).count()
    val keptFull = SemDedup.semDedup(semFixture, "vec_id", "embedding",
      nClusters = 2, tau = 0.95).filter(col("keep")).count()
    assert(keptCapped >= keptFull,
      s"capping may only miss dups: capped=$keptCapped full=$keptFull")
  }

  test("semDedup pair compare is a cluster-keyed equi-join, never all-pairs") {
    val plan = SemDedup.semDedup(semFixture, "vec_id", "embedding",
      nClusters = 2, tau = 0.95).queryExecution.toString
    // localCheckpoint hides the logical plan; assert on the physical one
    // of the un-checkpointed core instead: rebuild without materializing
    // is not exposed, so check the executed plan string for join types
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
