package graft.text

import graft.functions.UnigramEncodeExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece unigram
  * model) — the second of the two standard subword vocabularies (BPE is
  * [[Bpe]]); unigram is what most modern pretraining tokenizers
  * (T5/Llama-style SentencePiece) actually run.
  *
  * Same scale split as [[Bpe]]: the corpus-sized work — distinct-word
  * counting — is ONE distributed explode + map-side-combined groupBy
  * pruned to `maxVocab` words; everything after (seeding candidate
  * pieces, EM, pruning) runs over that BOUNDED (word, count) table on
  * the driver, because each EM round is a sequential fixpoint over
  * tokenizer-sized state (100 TB of text collapses to ≤ `maxVocab`
  * distinct-word rows before the loop starts).
  *
  * Hard-EM variant: the E-step Viterbi-segments each word under current
  * piece log-probs (ties → longer piece, deterministic), the M-step
  * re-estimates probs from segment counts, then the vocabulary shrinks
  * toward `vocabSize` keeping all single characters (coverage) plus the
  * highest-count multi-char pieces (ties lexicographic). Deterministic:
  * no RNG anywhere.
  */
object Unigram {

  /** piece → natural-log probability, plus the floor used for unseen
    * single characters at encode time. */
  final case class Vocab(pieces: Seq[(String, Double)], unkLogProb: Double)

  def train(docs: DataFrame, textCol: String, vocabSize: Int = 512,
            maxPieceLen: Int = 6, emRounds: Int = 4,
            maxVocab: Int = 65536, shrinkFactor: Double = 0.75): Vocab = {
    require(vocabSize > 0 && emRounds >= 1 && maxPieceLen >= 1)
    val words: Array[(String, Long)] =
      Bpe.wordCounts(docs, textCol, maxVocab).collect()
        .map(r => (r.getString(0), r.getLong(1)))

    // ── seed: every substring up to maxPieceLen, count-weighted ──
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val p = w.substring(i, j)
          seedCounts(p) = seedCounts.getOrElse(p, 0L) + n
          j += 1
        }
        i += 1
      }
    }
    val chars: Set[String] = words.flatMap(_._1.map(_.toString)).toSet
    // generous seed pool; EM + shrink walk it down to vocabSize
    val seedPool = math.max(vocabSize * 4, chars.size + vocabSize)
    var pieces: Map[String, Double] = toLogProbs(
      (seedCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(seedPool) ++
        chars.toSeq.map(c => c -> seedCounts.getOrElse(c, 1L)))
        .toMap.map { case (p, n) => p -> n.toDouble })

    // ── hard EM + gradual shrink toward vocabSize ──
    var round = 0
    while (round < emRounds) {
      val maxLen = pieces.keysIterator.map(_.length).max
      val unk = unkFloor(pieces)
      val used = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, n) =>
        UnigramEncodeExpr.viterbi(w, pieces, maxLen, unk)
          .foreach(p => used(p) = used.getOrElse(p, 0L) + n)
      }
      // every character survives with a +1 floor (coverage guarantee)
      val withFloor = used.toMap ++ chars.iterator
        .map(c => c -> (used.getOrElse(c, 0L) + 1L)).toMap
      val target = math.max(vocabSize,
        math.ceil(withFloor.size * shrinkFactor).toInt)
      val (singles, multis) = withFloor.toSeq
        .sortBy { case (p, n) => (-n, p) }
        .partition(_._1.length == 1)
      val room = math.max(target - singles.size, 0)
      pieces = toLogProbs((singles ++ multis.take(room))
        .map { case (p, n) => p -> n.toDouble }.toMap)
      round += 1
    }

    // ── final clamp to vocabSize (chars always kept) ──
    val (singles, multis) = pieces.toSeq
      .sortBy { case (p, lp) => (-lp, p) }
      .partition(_._1.length == 1)
    val room = math.max(vocabSize - singles.size, 0)
    val finalPieces = toLogProbs(
      (singles ++ multis.take(room)).map { case (p, lp) => p -> math.exp(lp) }.toMap)
    Vocab(finalPieces.toSeq.sortBy(_._1), unkFloor(finalPieces))
  }

  private def toLogProbs(counts: Map[String, Double]): Map[String, Double] = {
    val total = counts.values.sum
    counts.map { case (p, n) => p -> math.log(n / total) }
  }

  /** Unseen-char floor: 10 nats under the rarest piece — never chosen
    * over a real piece, never −∞ (full coverage). */
  private def unkFloor(pieces: Map[String, Double]): Double =
    (if (pieces.isEmpty) 0.0 else pieces.values.min) - 10.0

  /** Distributed Viterbi encoding of a text column under a trained
    * vocabulary: subword array per document. */
  def encode(text: Column, vocab: Vocab): Column =
    UnigramEncodeExpr(Text.tokens(text), vocab.pieces, vocab.unkLogProb)

  /** Unigram token count — the [[Bpe.tokenCount]] counterpart. */
  def tokenCount(text: Column, vocab: Vocab): Column =
    size(encode(text, vocab))
}
