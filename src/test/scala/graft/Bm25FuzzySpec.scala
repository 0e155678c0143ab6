package graft

import graft.core.Tables
import graft.operators.FuzzyJoin
import graft.text.Bm25
import org.apache.spark.sql.functions._

/** BM25 retrieval and the PassJoin-blocked edit-distance join. */
class Bm25FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("bm25: unique marker term pins self-retrieval to rank 1") {
    // Each doc carries a token found nowhere else: querying with the
    // doc's own text MUST rank it first — the marker's idf dwarfs the
    // shared filler, which every doc matches equally. (On the driver's
    // synthetic `documents` table every doc shares one tiny vocabulary,
    // so self-at-rank-1 is NOT a theorem there; the q149 oracle covers
    // the real-data ranking cell-exactly instead.)
    val docs = (1L to 40L).map { i =>
      (i, s"marker$i shared words appear in every single document here " * 3)
    }.toDF("doc_id", "text")
    val qs = Seq(3L, 17L, 29L).map { i =>
      (i, s"marker$i shared words appear in every single document here")
    }.toDF("qid", "text")
    val top1 = Bm25.search(docs, "doc_id", "text", qs, "qid", "text", k = 3)
      .filter($"rank" === 1)
      .select("qid", "doc_id").as[(Long, Long)].collect().toMap
    top1.foreach { case (qid, hit) =>
      assert(hit === qid, s"query $qid top hit $hit != self")
    }
  }

  test("bm25: rarer terms dominate ranking (idf ordering)") {
    val docs = Seq(
      (1L, "rareword common common"),
      (2L, "common common common"),
      (3L, "other things entirely")
    ).toDF("doc_id", "text")
    val qs = Seq((1L, "rareword")).toDF("qid", "text")
    val hits = Bm25.search(docs, "doc_id", "text", qs, "qid", "text", k = 3)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(hits.head === 1L)   // only doc containing the rare term
    assert(!hits.contains(3L)) // no term overlap → no score at all
  }

  test("fuzzyJoin equals the naive inequality join on real part names") {
    val names = Tables.load(spark, sf, "part").select("p_name").distinct()
    val a = names.select($"p_name".as("a_id"), $"p_name".as("a_name"))
    val b = names.select($"p_name".as("b_id"), $"p_name".as("b_name"))
    for (k <- Seq(1, 2)) {
      val fast = FuzzyJoin.fuzzyJoin(a, b, "a_name", "b_name", k, "a_id", "b_id")
        .filter($"a_name" < $"b_name").select("a_name", "b_name")
      val naive = names.as("x").join(names.as("y"),
          col("x.p_name") < col("y.p_name") &&
            levenshtein(col("x.p_name"), col("y.p_name")) <= k)
        .select(col("x.p_name").as("a_name"), col("y.p_name").as("b_name"))
      assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
        s"k=$k mismatch")
    }
  }

  test("fuzzyJoin: indel-shifted segments still collide (completeness)") {
    // delete in the middle shifts every later char — positional-only
    // blocking would miss this pair
    val a = Seq(("abcdefghij", "abcdefghij")).toDF("a_id", "a_name")
    val b = Seq(("abcdeghij", "abcdeghij")).toDF("b_id", "b_name") // 'f' deleted
    val got = FuzzyJoin.fuzzyJoin(a, b, "a_name", "b_name", 1, "a_id", "b_id")
    assert(got.count() === 1)
    assert(got.select("edit_dist").as[Int].head() === 1)
  }

  test("fuzzyJoin plan: equi-join on segment keys, no cartesian/BNLJ") {
    val names = Tables.load(spark, sf, "part").select("p_name").distinct()
    val a = names.select($"p_name".as("a_id"), $"p_name".as("a_name"))
    val b = names.select($"p_name".as("b_id"), $"p_name".as("b_name"))
    val plan = FuzzyJoin.fuzzyJoin(a, b, "a_name", "b_name", 2, "a_id", "b_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"))
    assert(plan.contains("__key"))
  }
}
