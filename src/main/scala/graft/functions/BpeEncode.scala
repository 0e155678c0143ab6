package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding of a token-array column with a FIXED learned merge
  * table (plan constant): classic greedy rank-priority merging — per
  * word, repeatedly merge the adjacent symbol pair with the best
  * (lowest) merge rank until none applies. One expression evaluation
  * per row; the merge table lives in the expression, not in a join.
  *
  * A 100-deep chain of HOF `aggregate` folds (one per merge) would be
  * the declarative encoding, but Catalyst plans it as a 100-level
  * expression tree evaluated per row per merge — this single
  * expression runs the standard encode loop instead (CodegenFallback:
  * one virtual call per row, no per-element lambda interpretation).
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private def encodeWord(word: String): Seq[String] = {
    var syms = word.map(_.toString) :+ BpeEncodeExpr.EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      // best-ranked adjacent pair present in the word
      var best = -1
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if best == -1 || r < best => best = r; bestAt = i
          case _ => ()
        }
        i += 1
      }
      if (best == -1) done = true
      else {
        // merge ALL occurrences of that pair, left to right
        val (a, b) = merges(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toIndexedSeq
      }
    }
    syms
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      val w = arr.getUTF8String(i)
      if (w != null) encodeWord(w.toString)
        .foreach(s => out += UTF8String.fromString(s))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeEncodeExpr {
  /** Word-boundary marker appended to every word before merging —
    * Sennrich et al.'s `</w>`, so merges can learn suffixes. */
  val EndOfWord = "</w>"

  def apply(tokens: Column, merges: Seq[(String, String)]): Column =
    GraftExprBridge.toColumn(
      BpeEncodeExpr(GraftExprBridge.toExpression(tokens), merges))
}
