package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** "sum" of string / byte-array values = concatenation (reference:
  * AggregationOp.java — string sum concatenates, byte[] sum concatenates).
  * The reference concatenates in merge-encounter order, which is
  * undefined across compaction orders; we concatenate in sorted order,
  * a legal refinement that makes the operation commutative+associative
  * as the data-processing contract demands (docs/usage/data-processing.md).
  */
case class ConcatSortedAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  private def isString = child.dataType == StringType

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    child.eval(input) match {
      case null => buf
      case u: UTF8String => buf += u.toString; buf
      case b: Array[Byte] => buf += b; buf
      case o => buf += o; buf
    }
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any])
      : mutable.ArrayBuffer[Any] = { buf ++= other; buf }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any = {
    val sorted = buf.sortWith((a, b) => graft.core.KeyOrdering.compare(a, b) < 0)
    if (isString) UTF8String.fromString(sorted.mkString(""))
    else sorted.map(_.asInstanceOf[Array[Byte]]).foldLeft(Array.emptyByteArray)(_ ++ _)
  }

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeObject)
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) { buf += in.readObject(); i += 1 }
    buf
  }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def prettyName: String = "concat_sorted"

  override def withNewMutableAggBufferOffset(offset: Int): ConcatSortedAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ConcatSortedAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ConcatSortedAgg =
    copy(child = newChild)
}

object ConcatSortedAgg {
  def concat_sorted(c: Column): Column =
    bridge.column(ConcatSortedAgg(bridge.expression(c)).toAggregateExpression())
}
