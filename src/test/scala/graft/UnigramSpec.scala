package graft

import graft.core.Tables
import graft.functions.UnigramEncodeExpr
import graft.text.Unigram
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram tokenizer: Viterbi kernel, trained
  * vocabulary invariants, lossless distributed encoding. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi picks the max-probability split, ties → longer piece") {
    val logp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -1.5)
    // "abc": [ab,c] = -2.5 beats [a,b,c] = -5.5
    assert(UnigramEncodeExpr.viterbi("abc", logp, 2, -20.0) === Seq("ab", "c"))
    // unseen char falls back to the unk floor, never fails
    assert(UnigramEncodeExpr.viterbi("axb", logp, 2, -20.0) === Seq("a", "x", "b"))
    // tie: {"ab": -4, "a": -2, "b": -2} → [ab] and [a,b] both -4 → longer wins
    val tied = Map("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    assert(UnigramEncodeExpr.viterbi("ab", tied, 2, -20.0) === Seq("ab"))
  }

  test("trained vocab: ≤ vocabSize, all corpus chars kept, probs normalized") {
    val docs = Tables.load(spark, sf, "documents")
    val v = Unigram.train(docs, "text", vocabSize = 128, emRounds = 2)
    assert(v.pieces.size <= 128)
    val pieceSet = v.pieces.map(_._1).toSet
    val chars = docs.select(explode(graft.text.Text.tokens(col("text"))).as("w"))
      .limit(500).as[String].collect().flatMap(_.map(_.toString)).toSet
    // chars of frequent words are covered (train caps at maxVocab words)
    assert(chars.count(pieceSet.contains) >= (chars.size * 0.95).toInt)
    val mass = v.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(mass - 1.0) < 1e-9)
    assert(v.unkLogProb < v.pieces.map(_._2).min)
  }

  test("frequent multi-char substrings become pieces") {
    val docs = Seq.tabulate(50)(i => (i.toLong, "running jumping swimming walking"))
      .toDF("doc_id", "text")
    val v = Unigram.train(docs, "text", vocabSize = 40, emRounds = 3)
    val multi = v.pieces.map(_._1).filter(_.length > 1)
    assert(multi.exists(_.contains("ing")) || multi.contains("ing"))
  }

  test("encoding is lossless: pieces concatenate back to the words") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val v = Unigram.train(docs, "text", vocabSize = 128, emRounds = 2)
    val bad = docs.select(
        concat_ws("", graft.text.Text.tokens(col("text"))).as("joined"),
        concat_ws("", Unigram.encode(col("text"), v)).as("rejoined"))
      .filter(col("joined") =!= col("rejoined")).count()
    assert(bad === 0L)
  }

  test("training is deterministic across runs") {
    val docs = Tables.load(spark, sf, "documents")
    val v1 = Unigram.train(docs, "text", vocabSize = 96, emRounds = 2)
    val v2 = Unigram.train(docs, "text", vocabSize = 96, emRounds = 2)
    assert(v1.pieces === v2.pieces)
  }

  test("tokenCount: fewer tokens than chars, more than words") {
    val docs = Tables.load(spark, sf, "documents")
    val v = Unigram.train(docs, "text", vocabSize = 256, emRounds = 3)
    val r = docs.select(
        sum(Unigram.tokenCount(col("text"), v)).as("toks"),
        sum(size(graft.text.Text.tokens(col("text")))).as("words"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).as("chars"))
      .as[(Long, Long, Long)].head()
    assert(r._1 > r._2)  // subwords at least split some words
    assert(r._1 < r._3)  // but far better than char-level
  }
}
