package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a token-array column under a FIXED unigram-LM
  * piece vocabulary (plan constant, same contract as [[BpeEncodeExpr]]):
  * per word, the maximum-log-probability split into vocabulary pieces —
  * the SentencePiece unigram decode. Characters missing from the
  * vocabulary fall back to single-char pieces at `unkLogProb`, so every
  * word segments (full coverage, no <unk> holes in the count).
  *
  * One expression evaluation per row; the vocabulary lives in the
  * expression, not in a join (it is tokenizer-sized, not corpus-sized).
  */
case class UnigramEncodeExpr(child: Expression, vocab: Seq[(String, Double)],
                             unkLogProb: Double)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val logp: Map[String, Double] = vocab.toMap
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.map(_._1.length).max

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      val w = arr.getUTF8String(i)
      if (w != null) UnigramEncodeExpr.viterbi(w.toString, logp, maxLen, unkLogProb)
        .foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  def apply(tokens: Column, vocab: Seq[(String, Double)],
            unkLogProb: Double): Column =
    GraftExprBridge.toColumn(
      UnigramEncodeExpr(GraftExprBridge.toExpression(tokens), vocab, unkLogProb))

  /** Max-log-prob split of `word` into vocabulary pieces; dp over word
    * positions, tie on score → the longer piece (smaller start index)
    * wins — deterministic across runs. Shared by the trainer's E-step
    * and the encode expression. */
  def viterbi(word: String, logp: Map[String, Double], maxLen: Int,
              unkLogProb: Double): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val piece = word.substring(i, j)
        val lp =
          if (logp.contains(piece)) logp(piece)
          else if (j - i == 1) unkLogProb
          else Double.NegativeInfinity
        val s = best(i) + lp
        if (s > best(j)) { best(j) = s; back(j) = i }
        i += 1
      }
      j = j + 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) { out += word.substring(back(p), p); p = back(p) }
    out.reverse.toSeq
  }
}
