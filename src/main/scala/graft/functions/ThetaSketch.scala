package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Theta distinct sketches (Apache DataSketches) — the SET-OPERATION
  * member of the sketch family: unlike HLL ([[graft.eda.Sketches]],
  * union only), persisted theta shards answer intersections and
  * differences ("users who purchased AND clicked", "in shard A but
  * not B") from kilobyte binaries, with error bounds, and without
  * rescanning the corpus. Values hash by string representation so any
  * key type sketches consistently.
  */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union] {
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()
  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] =
    buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }
}

/** Sketch a key column into a serialized theta binary. */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

object ThetaSketch {
  import org.apache.spark.sql.GraftExprBridge

  /** Column API: serialized theta sketch of the distinct values of `c`. */
  def thetaSketch(c: Column): Column =
    GraftExprBridge.toColumn(
      ThetaSketchAgg(GraftExprBridge.toExpression(c)).toAggregateExpression())

  private def wrap(b: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(b))

  /** Distinct estimate of one serialized sketch. */
  def estimate(b: Array[Byte]): Double = wrap(b).getEstimate

  /** Distinct estimate of A ∩ B. */
  def intersect(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.getEstimate
  }

  /** Distinct estimate of A \ B. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(wrap(a), wrap(b)).getEstimate
}
