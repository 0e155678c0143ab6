package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile sketch aggregate (Apache DataSketches KLL,
  * shipped with Spark) — the quantile counterpart of the HLL
  * distinct-count shards in [[graft.eda.Sketches]]: sketch each shard
  * once, persist the kilobyte binaries, and answer ANY union of
  * shards' quantiles later without rescanning the corpus. The exact
  * [[ExactPercentiles]] is the oracle path; this is the 100 TB path
  * (bounded ~KB state per shard vs O(rows), provable rank-error ε
  * bounds from the k parameter).
  *
  * Two forms share the eval: [[KllSketchAgg]] builds a sketch from a
  * numeric column; [[KllMergeAgg]] unions ALREADY-SERIALIZED sketch
  * binaries (the persisted shard table). Both emit the serialized
  * sketch, so chains of merges stay binary-in/binary-out.
  */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }
  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Sketch a numeric column into a serialized KLL binary. */
case class KllSketchAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType  => v.asInstanceOf[Float].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case LongType   => v.asInstanceOf[Long].toDouble
        case ShortType  => v.asInstanceOf[Short].toDouble
        case ByteType   => v.asInstanceOf[Byte].toDouble
        case _: DecimalType =>
          v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
        case _ => v.toString.toDouble
      }
      if (!d.isNaN) buf.update(d)
    }
    buf
  }
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union already-serialized KLL binaries (a persisted shard table). */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }
  override def withNewMutableAggBufferOffset(offset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

object KllSketch {
  import org.apache.spark.sql.GraftExprBridge

  /** Column API: serialized KLL sketch of `c`. */
  def kllSketch(c: Column, k: Int = 200): Column =
    GraftExprBridge.toColumn(
      KllSketchAgg(GraftExprBridge.toExpression(c), k).toAggregateExpression())

  /** Column API: union of serialized sketches in `c`. */
  def kllMerge(c: Column, k: Int = 200): Column =
    GraftExprBridge.toColumn(
      KllMergeAgg(GraftExprBridge.toExpression(c), k).toAggregateExpression())

  /** Driver-side read-back: quantile estimates from a serialized
    * sketch (INCLUSIVE rank semantics — the DataSketches default). */
  def quantiles(bytes: Array[Byte], ps: Seq[Double]): Seq[Double] = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    ps.map(sk.getQuantile)
  }

  /** Retained-item count — the state-size story (≤ ~3k doubles at
    * k = 200 regardless of stream length). */
  def retained(bytes: Array[Byte]): Int =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getNumRetained
}
