package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ALL pairwise Pearson correlations of `children` in ONE aggregate.
  *
  * Replaces d·(d−1)/2 separate `corr()` declarative aggregates in the EDA
  * pack (reference: src/workbench/algorithms/sql/correlations.py:14-91).
  * The declarative form generates one huge whole-stage-codegen method
  * whose Janino compile dominated q07 (~1.3 s of a 1.5 s query, constant
  * in data size); this TypedImperativeAggregate keeps the generated code
  * tiny and runs the per-row update as compiled Scala over a primitive
  * buffer — the same pattern as [[ExactPercentiles]].
  *
  * Numerics: per-pair Welford co-moment update and merge, the EXACT
  * algorithm of Spark's built-in `Corr` (and DuckDB's `CORR`), so results
  * are identical to the combinator form and oracle parity is preserved.
  * Null semantics match `corr`: a row contributes to a pair only when
  * both sides are non-null (pairwise-complete).
  *
  * Buffer: 6 doubles per pair [n, meanA, meanB, M2a, M2b, Cab] —
  * O(d²) constants, independent of row count; mergeable across
  * partitions, so it scales like any sum.
  */
case class CorrMatrix(
    columns: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val d = columns.size
  // pair order: (0,1), (0,2), … (0,d-1), (1,2), … — caller maps names
  private val pairs: IndexedSeq[(Int, Int)] =
    for { a <- 0 until d; b <- a + 1 until d } yield (a, b)
  private val S = 6 // slots per pair

  override def children: Seq[Expression] = columns
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](pairs.size * S)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = new Array[Double](d)
    val isNull = new Array[Boolean](d)
    var i = 0
    while (i < d) {
      val e = columns(i).eval(input)
      if (e == null) isNull(i) = true
      else v(i) = e match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Int => x.toDouble
        case x: Long => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: Decimal => x.toDouble
        case x => x.toString.toDouble
      }
      i += 1
    }
    var p = 0
    while (p < pairs.size) {
      val (a, b) = pairs(p)
      if (!isNull(a) && !isNull(b)) {
        val o = p * S
        // Welford co-moment update — identical to Spark Covariance.update
        val n = buf(o) + 1
        val dx = v(a) - buf(o + 1)
        val dy = v(b) - buf(o + 2)
        buf(o) = n
        buf(o + 1) += dx / n
        buf(o + 2) += dy / n
        buf(o + 3) += dx * (v(a) - buf(o + 1))
        buf(o + 4) += dy * (v(b) - buf(o + 2))
        buf(o + 5) += dx * (v(b) - buf(o + 2))
      }
      p += 1
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var p = 0
    while (p < pairs.size) {
      val o = p * S
      val n1 = buf(o); val n2 = other(o)
      if (n2 > 0) {
        val n = n1 + n2
        val dx = other(o + 1) - buf(o + 1)
        val dy = other(o + 2) - buf(o + 2)
        val dxN = dx * n2 / n
        val dyN = dy * n2 / n
        buf(o) = n
        buf(o + 1) += dxN
        buf(o + 2) += dyN
        buf(o + 3) += other(o + 3) + dx * dxN * n1
        buf(o + 4) += other(o + 4) + dy * dyN * n1
        buf(o + 5) += other(o + 5) + dx * dyN * n1
      }
      p += 1
    }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Any](pairs.size)
    var p = 0
    while (p < pairs.size) {
      val o = p * S
      out(p) =
        if (buf(o) == 0) null
        else if (buf(o) == 1) Double.NaN // matches Corr's n==1 result
        else buf(o + 5) / math.sqrt(buf(o + 3) * buf(o + 4))
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val arr = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getDouble; i += 1 }
    arr
  }

  override def withNewMutableAggBufferOffset(offset: Int): CorrMatrix =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CorrMatrix =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CorrMatrix =
    copy(columns = newChildren)
}

object CorrMatrix {
  import org.apache.spark.sql.GraftExprBridge

  /** Column API: array of correlations for every (i<j) pair of `cs`,
    * in (0,1),(0,2),…,(1,2),… order. */
  def corrMatrix(cs: Seq[Column]): Column =
    GraftExprBridge.toColumn(
      CorrMatrix(cs.map(GraftExprBridge.toExpression)).toAggregateExpression())
}
