package graft

import org.apache.spark.sql.functions._

/** Round-12 wave 50: corpus-trained bigram LM scoring + mixture
  * materialization (q486–q487). */
class WaveFiftySpec extends SparkSpec {
  import spark.implicits._

  test("bigramCrossEntropy: repetitive source scores lower than noisy one") {
    // srcA repeats one bigram; srcB is all-unique bigrams
    val docs = Seq(
      ("A", "x y x y x y x y"),
      ("A", "x y x y"),
      ("B", "a b c d e f g h")
    ).toDF("source", "text")
    val r = graft.text.LmScore
      .bigramCrossEntropy(docs, "source", "text").collect()
    val a = r.find(_.getAs[String]("source") == "A").get
    val b = r.find(_.getAs[String]("source") == "B").get
    // A: 7 + 3 bigrams; B: 7
    assert(a.getAs[Long]("n_bigrams") == 10)
    assert(b.getAs[Long]("n_bigrams") == 7)
    assert(a.getAs[Double]("avg_bits") < b.getAs[Double]("avg_bits"))
    // hand-check one term: C(x␁y)=6, C(x)=6, V=10, k=0.5 →
    // P = 6.5/11 for each of A's 6 "x y" instances
    assert(a.getAs[Long]("n_docs") == 2)
  }

  test("bigramCrossEntropy: single-token and null docs drop") {
    val docs = Seq(("A", "solo"), ("A", null), ("A", "p q"))
      .toDF("source", "text")
    val r = graft.text.LmScore
      .bigramCrossEntropy(docs, "source", "text").head()
    assert(r.getAs[Long]("n_docs") == 1)
    assert(r.getAs[Long]("n_bigrams") == 1)
  }

  test("mixtureApply: token budgets cut the hash-rank tail deterministically") {
    // s0: 4 docs × 4 tokens = 16; s1: 2 docs × 2 tokens = 4
    val docs = (
      (0L until 4L).map(i => ("s0", i, "a b c d")) ++
      Seq(("s1", 10L, "e f"), ("s1", 11L, "g h"))
    ).toDF("source", "doc_id", "text")
    // target: s0 25%, s1 75% → s0 weight = .25/.8 = .3125,
    // budget = 5 tokens → 1 doc (cum 4 ≤ 5, next 8 > 5); s1 capped 3.0
    val r = graft.text.CorpusStats.mixtureApply(docs, "source",
      "doc_id", "text", Map("s0" -> 0.25, "s1" -> 0.75), cap = 3.0)
      .collect()
    val s0 = r.find(_.getAs[String]("source") == "s0").get
    val s1 = r.find(_.getAs[String]("source") == "s1").get
    assert(s0.getAs[Long]("n_kept") == 1)
    assert(s0.getAs[Long]("tokens_kept") == 4)
    assert(s1.getAs[Long]("n_kept") == 2) // weight ≥ 1 keeps everything
    assert(s1.getAs[Long]("tokens_kept") == 4)
    assert(s0.getAs[Double]("realized_share") == 0.5)
    // determinism: same input → same kept prefix
    val r2 = graft.text.CorpusStats.mixtureApply(docs, "source",
      "doc_id", "text", Map("s0" -> 0.25, "s1" -> 0.75), cap = 3.0)
      .collect()
    assert(r.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }

  test("mixtureApply: zero-target source keeps nothing") {
    val docs = Seq(("s0", 1L, "a b"), ("s1", 2L, "c d"))
      .toDF("source", "doc_id", "text")
    val r = graft.text.CorpusStats.mixtureApply(docs, "source",
      "doc_id", "text", Map("s1" -> 1.0)).collect()
    val s0 = r.find(_.getAs[String]("source") == "s0").get
    assert(s0.getAs[Long]("n_kept") == 0)
    assert(s0.getAs[Double]("realized_share") == 0.0)
  }
}
