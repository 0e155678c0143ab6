package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Frequent-items (heavy-hitters) sketch — DataSketches' ItemsSketch,
  * the Misra-Gries/Space-Saving family: bounded state finds every item
  * whose count exceeds n/maxMapSize with deterministic error bounds,
  * where an exact global top-k over 100 TB would shuffle the full key
  * universe. Persisted shard sketches merge like the HLL/KLL/theta
  * members of the family. */
case class FreqSketchAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)
  override def update(buf: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }
  override def merge(buf: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }
  override def eval(buf: ItemsSketch[String]): Any =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())
  override def withNewMutableAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketch {
  import org.apache.spark.sql.GraftExprBridge

  /** Column API: serialized frequent-items sketch of `c`. */
  def freqSketch(c: Column, maxMapSize: Int = 256): Column =
    GraftExprBridge.toColumn(
      FreqSketchAgg(GraftExprBridge.toExpression(c), maxMapSize)
        .toAggregateExpression())

  /** Read back the frequent items (NO_FALSE_NEGATIVES: every true
    * heavy hitter appears; some near-threshold items may too).
    * Returns (item, estimate, lower_bound, upper_bound) sorted by
    * estimate descending. */
  def frequentItems(bytes: Array[Byte]): Seq[(String, Long, Long, Long)] = {
    val sk = ItemsSketch.getInstance(Memory.wrap(bytes),
      new ArrayOfStringsSerDe())
    sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).toSeq
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy(x => (-x._2, x._1))
  }
}
