package graft.functions

import org.apache.datasketches.quantiles.ItemsSketch
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable quantile-sketch aggregate: builds the per-file key sketch in
  * the same pass that writes the file, exactly as the reference updates
  * its sketch while the compaction/ingest writer iterates
  * (reference: JavaCompactionRunner.java:93-103, SketchingIterator.java:40-66).
  * A TypedImperativeAggregate so partial sketches merge across partitions
  * without collecting rows (the Catalyst analog of the Rust
  * GroupsAccumulator-based sketch UDF, sketch_udf.rs:51-96).
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int = KeySketch.K,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[AnyRef]] with UnaryLike[Expression] {

  @transient private lazy val kind = KeySketch.kindOf(child.dataType)

  override def createAggregationBuffer(): ItemsSketch[AnyRef] = KeySketch.empty(kind, k)

  override def update(buf: ItemsSketch[AnyRef], input: InternalRow): ItemsSketch[AnyRef] = {
    val v = child.eval(input)
    if (v != null) buf.update(kind.toItem(v).asInstanceOf[AnyRef])
    buf
  }

  override def merge(buf: ItemsSketch[AnyRef], other: ItemsSketch[AnyRef]): ItemsSketch[AnyRef] = {
    val u = org.apache.datasketches.quantiles.ItemsUnion.getInstance(buf)
    u.union(other)
    u.getResult
  }

  override def eval(buf: ItemsSketch[AnyRef]): Any = KeySketch.serialize(kind, buf)

  override def serialize(buf: ItemsSketch[AnyRef]): Array[Byte] = KeySketch.serialize(kind, buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[AnyRef] =
    KeySketch.deserialize(kind, bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "key_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketchAgg {
  /** Column API: serialized quantile sketch of a key column. The
    * default K is the engine's sidecar parameter; callers needing a
    * larger exact regime (estimates provably exact while every item is
    * retained) pass their own.
    */
  def sketch_agg(c: Column, k: Int = KeySketch.K): Column =
    bridge.column(QuantileSketchAgg(bridge.expression(c), k).toAggregateExpression())
}
