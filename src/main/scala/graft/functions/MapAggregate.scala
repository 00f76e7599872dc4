package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-type merge operations of the reference's aggregation DSL
  * (reference: java/core/.../iterator/AggregationOp.java:24-161):
  * numeric sum/min/max; string min/max lexicographic and sum = concat;
  * byte-array min/max unsigned-lexicographic and sum = concat.
  */
object MergeOp extends Enumeration {
  val Sum, Min, Max = Value

  def apply(op: MergeOp.Value, dt: DataType, a: Any, b: Any): Any = (op, dt) match {
    case (Sum, IntegerType) => a.asInstanceOf[Int] + b.asInstanceOf[Int]
    case (Sum, LongType) => a.asInstanceOf[Long] + b.asInstanceOf[Long]
    case (Sum, StringType) => a.asInstanceOf[String] + b.asInstanceOf[String]
    case (Sum, BinaryType) => a.asInstanceOf[Array[Byte]] ++ b.asInstanceOf[Array[Byte]]
    case (Min, _) => if (graft.core.KeyOrdering.compare(a, b) <= 0) a else b
    case (Max, _) => if (graft.core.KeyOrdering.compare(a, b) >= 0) a else b
    case (o, t) => throw new IllegalArgumentException(s"unsupported $o on ${t.sql}")
  }

  // ---- shared map-merge helpers (used by MapMergeAgg AND the streaming
  // merge aggregation in graft.exec — one implementation, one semantics) ----

  /** Byte-array map keys need value equality in external buffers. */
  def wrapBytes(v: Any): Any = v match {
    case b: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    case o => o
  }

  def unwrapBytes(v: Any): Any = v match {
    case a: scala.collection.immutable.ArraySeq.ofByte => a.unsafeArray
    case o => o
  }

  /** Merge one (k, v) into an external map buffer, applying `op` on key
    * collision — byte keys/values wrapped for equality, unwrapped for
    * the op (reference: AggregationOp.handleMap:163-215).
    */
  def mergeMapEntry(op: MergeOp.Value, valueType: DataType,
      buf: scala.collection.mutable.LinkedHashMap[Any, Any], k: Any, v: Any): Unit =
    buf.get(k) match {
      case Some(existing) =>
        buf.update(k, wrapBytes(apply(op, valueType, unwrapBytes(existing), unwrapBytes(v))))
      case None => buf.update(k, v)
    }

  def toInternalScalar(v: Any): Any = v match {
    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case a: scala.collection.immutable.ArraySeq.ofByte => a.unsafeArray
    case o => o
  }

  /** Deterministic MapData: entries sorted by key (stronger than the
    * reference, which inherits encounter order).
    */
  def toSortedMapData(buf: scala.collection.Map[Any, Any])
      : org.apache.spark.sql.catalyst.util.ArrayBasedMapData = {
    val sorted = buf.toSeq.sortWith((a, b) =>
      graft.core.KeyOrdering.compare(unwrapBytes(a._1), unwrapBytes(b._1)) < 0)
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      sorted.map(e => toInternalScalar(e._1)).toArray,
      sorted.map(e => toInternalScalar(e._2)).toArray)
  }
}

/** map_sum / map_min / map_max: merge map values key-wise, applying the
  * merge op on key collisions (reference: AggregationOp.handleMap
  * :163-215; the Rust engine's custom UDAF map_aggregate.rs). Implemented
  * as a TypedImperativeAggregate — the Catalyst analog of the Rust
  * GroupsAccumulator — so partial aggregation works map-side and no rows
  * are collected.
  *
  * Buffer keys/values are held as external JVM types (String/Long/...) so
  * the buffer is Java-serializable for shuffle.
  */
case class MapMergeAgg(
    child: Expression,
    op: MergeOp.Value,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LinkedHashMap[Any, Any]] with UnaryLike[Expression] {

  private def mapType: MapType = child.dataType.asInstanceOf[MapType]

  override def createAggregationBuffer(): mutable.LinkedHashMap[Any, Any] =
    mutable.LinkedHashMap.empty

  // Buffer keys must have value equality: Array[Byte] hashes by reference,
  // so equal binary keys would never merge and the output map would carry
  // duplicate keys. Wrap bytes in ArraySeq (structural ==/hashCode); also
  // defensively copy, since InternalRow getters may expose shared buffers.
  private def toExternal(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case b: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(b.clone())
    case o => o
  }
  private def toInternal(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case a: scala.collection.immutable.ArraySeq.ofByte => a.unsafeArray
    case o => o
  }

  private def mergeValue(buf: mutable.LinkedHashMap[Any, Any], k: Any, v: Any): Unit =
    MergeOp.mergeMapEntry(op, mapType.valueType, buf, k, v)

  override def update(buf: mutable.LinkedHashMap[Any, Any], input: InternalRow)
      : mutable.LinkedHashMap[Any, Any] = {
    child.eval(input) match {
      case null => buf
      case m: MapData =>
        val keys = m.keyArray(); val vals = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = toExternal(keys.get(i, mapType.keyType))
          val v = toExternal(vals.get(i, mapType.valueType))
          if (v != null) mergeValue(buf, k, v)
          i += 1
        }
        buf
    }
  }

  override def merge(buf: mutable.LinkedHashMap[Any, Any], other: mutable.LinkedHashMap[Any, Any])
      : mutable.LinkedHashMap[Any, Any] = {
    other.foreach { case (k, v) => mergeValue(buf, k, v) }
    buf
  }

  override def eval(buf: mutable.LinkedHashMap[Any, Any]): Any =
    MergeOp.toSortedMapData(buf)

  // Typed buffer codec: key/value types are known from the map type, so
  // entries encode as raw primitives/length-prefixed bytes — ~10x less
  // per-entry cost than ObjectOutputStream and no reflective readObject.
  private def writeVal(out: java.io.DataOutputStream, dt: DataType, v: Any): Unit = dt match {
    case IntegerType => out.writeInt(v.asInstanceOf[Int])
    case LongType => out.writeLong(v.asInstanceOf[Long])
    case StringType =>
      val b = v.asInstanceOf[String].getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = v match {
        case a: scala.collection.immutable.ArraySeq.ofByte => a.unsafeArray
        case a: Array[Byte] => a
      }
      out.writeInt(b.length); out.write(b)
    case other => throw new IllegalArgumentException(s"unsupported map entry type ${other.sql}")
  }

  private def readVal(in: java.io.DataInputStream, dt: DataType, asKey: Boolean): Any = dt match {
    case IntegerType => in.readInt()
    case LongType => in.readLong()
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b); new String(b, "UTF-8")
    case BinaryType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      if (asKey) scala.collection.immutable.ArraySeq.unsafeWrapArray(b) else b
    case other => throw new IllegalArgumentException(s"unsupported map entry type ${other.sql}")
  }

  override def serialize(buf: mutable.LinkedHashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64)
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      writeVal(out, mapType.keyType, k)
      writeVal(out, mapType.valueType, v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LinkedHashMap[Any, Any] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new mutable.LinkedHashMap[Any, Any]
    var i = 0
    while (i < n) {
      val k = readVal(in, mapType.keyType, asKey = true)
      buf.update(k, readVal(in, mapType.valueType, asKey = false))
      i += 1
    }
    buf
  }

  override def dataType: DataType = mapType
  override def nullable: Boolean = false
  override def prettyName: String = s"map_${op.toString.toLowerCase}"

  override def withNewMutableAggBufferOffset(offset: Int): MapMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MapMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MapMergeAgg =
    copy(child = newChild)
}

object MapMergeAgg {
  def map_sum(c: Column): Column =
    bridge.column(MapMergeAgg(bridge.expression(c), MergeOp.Sum).toAggregateExpression())
  def map_min(c: Column): Column =
    bridge.column(MapMergeAgg(bridge.expression(c), MergeOp.Min).toAggregateExpression())
  def map_max(c: Column): Column =
    bridge.column(MapMergeAgg(bridge.expression(c), MergeOp.Max).toAggregateExpression())
}
