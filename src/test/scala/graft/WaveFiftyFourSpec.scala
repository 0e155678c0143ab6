package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 54: winnowing fingerprints (density + candidates),
  * C4×Gopher filter agreement, RAKE keyphrases (q503–q506). */
class WaveFiftyFourSpec extends SparkSpec {
  import spark.implicits._

  test("winnowing: density bounds, short-doc drop, shared-run guarantee") {
    val docs = Seq(
      (1L, "s0", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "s0", "prefix words here alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "s0", "too short")
    ).toDF("doc_id", "source", "text")
    val d = graft.dedup.Winnowing
      .densityBySource(docs, "doc_id", "source", "text", k = 3, w = 4)
      .collect()
    assert(d.length == 1)
    val row = d.head
    // doc 3 (2 tokens < k+w-1 = 6) drops; docs 1 and 2 stay
    assert(row.getAs[Long]("n_docs") == 2)
    val dens = row.getAs[Double]("density")
    // each window selects one of w hashes; dedup can only lower it
    assert(dens > 0.0 && dens <= 1.0)
    // winnowing guarantee: a shared run of >= w+k-1 tokens (docs 1 and
    // 2 share all 10 tokens of doc 1) must share >= 1 fingerprint
    val pairs = graft.dedup.Winnowing
      .candidatePairs(docs, "doc_id", "text", k = 3, w = 4,
        minShared = 1, maxDf = 10)
      .collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L &&
      r.getAs[Long]("id_b") == 2L))
  }

  test("winnowing candidates: boilerplate fingerprints df-cap out") {
    // 12 docs all sharing one 8-token run -> every pair shares its
    // fingerprints; with maxDf = 10 < 12 those hashes drop entirely
    val docs = (1L to 12L)
      .map(i => (i, s"unique$i lead$i alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val pairs = graft.dedup.Winnowing
      .candidatePairs(docs, "doc_id", "text", k = 3, w = 4,
        minShared = 1, maxDf = 10)
      .collect()
    assert(pairs.isEmpty)
  }

  test("filterAgreement: hand-built 2x2 cells give kappa 0") {
    val pass5 = "the quick brown dog runs over and over of the small lazy cat"
    val longWords = (pass5 + " ") * 5 // 65 words, stopword-rich
    val docs = Seq(
      // both pass: >= 50 words, sentence-terminal lines of >= 5 words
      ("s0", (longWords.trim + ".\n") * 3),
      // C4 only: 3 clean sentences but 18 words < Gopher's 50 floor
      ("s0", "one two three four five six.\nseven eight nine ten eleven twelve.\na b c d e f."),
      // Gopher only: 65 good words, but no line ends in punctuation
      ("s0", longWords.trim),
      // neither: curly brace kills C4, 4 words kill Gopher
      ("s0", "{ code block here")
    ).toDF("source", "text")
    val r = graft.text.FilterAgreement
      .c4GopherCells(docs, "source", "text").collect()
    assert(r.length == 1)
    val c = r.head
    assert(c.getAs[Long]("n_docs") == 4)
    assert(c.getAs[Long]("n_both") == 1)
    assert(c.getAs[Long]("n_c4_only") == 1)
    assert(c.getAs[Long]("n_gopher_only") == 1)
    assert(c.getAs[Long]("n_neither") == 1)
    assert(c.getAs[Double]("agree_share") == 0.5)
    // chance = 2*2 + 2*2 = 8 = n*agree -> kappa exactly 0
    assert(c.getAs[Double]("kappa") == 0.0)
  }

  test("rake: millionths-lattice phrase scores and ranking") {
    val docs = Seq(
      ("s0", "deep learning of the deep learning"),
      ("s0", "graph")
    ).toDF("source", "text")
    val r = graft.text.Rake
      .keywordsBySource(docs, "source", "text")
      .collect().map(x => x.getAs[String]("phrase") -> x).toMap
    // "deep learning" x2: deg(deep)=4 freq=2 -> ws6 2e6; same for
    // "learning" -> phrase score 4.0
    val dl = r("deep learning")
    assert(dl.getAs[Long]("n_occurrences") == 2)
    assert(dl.getAs[Long]("n_words") == 2)
    assert(dl.getAs[Double]("score") == 4.0)
    assert(dl.getAs[Int]("rank") == 1)
    val g = r("graph")
    assert(g.getAs[Double]("score") == 1.0)
    assert(g.getAs[Int]("rank") == 2)
  }
}
