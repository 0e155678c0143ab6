package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over a corpus — the vocabulary-preparation
  * stage of an LLM data pipeline (beyond the reference's operator set —
  * north-star scope).
  *
  * Architecture mirrors production tokenizer trainers (HF tokenizers,
  * SentencePiece on word counts): the CORPUS-SCALE work — counting
  * distinct words — is one distributed explode + map-side-combined
  * groupBy, pruned to the `maxVocab` most frequent words (distributed
  * top-K, no full sort). BPE merge learning is then inherently
  * sequential (merge i+1 depends on merge i), so it runs on the
  * collected (word, count) table — BOUNDED metadata: 100 TB of text
  * collapses to at most `maxVocab` rows. Re-running the merge loop as
  * N Spark jobs over that tiny table would add scheduler latency per
  * merge and no scalability.
  *
  * Encoding with the learned merges is distributed again:
  * [[encode]] wraps the single-pass
  * [[graft.functions.BpeEncodeExpr]] (greedy rank-priority merging,
  * the standard encode loop) — usable as the REAL token counter for
  * [[Packing.packingManifest]].
  */
object Bpe {

  /** Distributed (word, count), most frequent `maxVocab` words.
    * Deterministic tie-break by word. */
  def wordCounts(docs: DataFrame, textCol: String,
                 maxVocab: Int = 65536): DataFrame =
    docs.select(explode(Text.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word")).limit(maxVocab)

  /** Learn `numMerges` BPE merges from the corpus. Returns the ordered
    * merge table (rank = position). Ties break lexicographically on
    * the pair — deterministic across runs and engines. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  maxVocab: Int = 65536): Seq[(String, String)] = {
    val vocab = wordCounts(docs, textCol, maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // symbol sequences: chars + the end-of-word marker
    var words: Array[(Array[String], Long)] = vocab.map { case (w, n) =>
      (w.map(_.toString).toArray :+ graft.functions.BpeEncodeExpr.EndOfWord, n)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) m = numMerges
      else {
        val (pair, _) = counts.toSeq
          .maxBy { case ((a, b), n) => (n, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))
        merges += pair
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
              out += pair._1 + pair._2; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.toArray, n)
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** Distributed BPE encoding of a text column with a learned merge
    * table: subword array per document. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeEncodeExpr(Text.tokens(text), merges)

  /** BPE token count — drop-in replacement for the regex token counter
    * when a trained tokenizer's counts should drive packing/budgets. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(encode(text, merges))
}
