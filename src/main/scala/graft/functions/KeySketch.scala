package graft.functions

import java.util.Comparator
import org.apache.datasketches.common.{ArrayOfItemsSerDe, ArrayOfLongsSerDe, ArrayOfStringsSerDe}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantiles.{ItemsSketch, ItemsUnion}
import org.apache.spark.sql.types._

/** Per-key-field quantile sketches, matching the reference's use of
  * Apache DataSketches classic quantiles ItemsSketch with K=1024 as the
  * mergeable per-file statistic that drives partition splitting
  * (reference: java/common/sketches/.../Sketches.java:35-95,
  * FindPartitionSplitPoint.java:76-89).
  *
  * Key-type handling: Int and Long keys sketch as boxed Long; String as
  * String; Binary as Array[Byte] with unsigned-lexicographic comparison
  * (the reference's ByteArray wrapping; Spark BinaryType sorts the same
  * way).
  */
object KeySketch {

  val K = 1024

  sealed trait Kind {
    type T <: AnyRef
    def clazz: Class[T]
    def comparator: Comparator[T]
    def serde: ArrayOfItemsSerDe[T]
    /** Spark-internal row value → sketch item. */
    def toItem(v: Any): T
    /** sketch item → external key value (for split points). */
    def fromItem(t: AnyRef): Any
  }

  case object LongKind extends Kind {
    type T = java.lang.Long
    val clazz: Class[java.lang.Long] = classOf[java.lang.Long]
    val comparator: Comparator[java.lang.Long] = Comparator.naturalOrder[java.lang.Long]()
    val serde = new ArrayOfLongsSerDe
    def toItem(v: Any): java.lang.Long = v match {
      case i: Int => java.lang.Long.valueOf(i.toLong)
      case l: Long => java.lang.Long.valueOf(l)
      case o => throw new IllegalArgumentException(s"not an integral key: $o")
    }
    def fromItem(t: AnyRef): Any = t.asInstanceOf[java.lang.Long].longValue()
  }

  case object IntKind extends Kind {
    type T = java.lang.Long
    def clazz = LongKind.clazz
    def comparator = LongKind.comparator
    def serde = LongKind.serde
    def toItem(v: Any) = LongKind.toItem(v)
    override def fromItem(t: AnyRef): Any = t.asInstanceOf[java.lang.Long].intValue()
  }

  case object StringKind extends Kind {
    type T = String
    val clazz: Class[String] = classOf[String]
    // UTF-8 code-point order, NOT naturalOrder (UTF-16): the sketch's
    // quantile ranking must agree with executor routing or a median
    // split point could misroute supplementary-plane keys (same bug
    // class as KeyOrdering.compareUtf8's scaladoc).
    val comparator: Comparator[String] = new Comparator[String] with Serializable {
      def compare(a: String, b: String): Int = graft.core.KeyOrdering.compareUtf8(a, b)
    }
    val serde = new ArrayOfStringsSerDe
    def toItem(v: Any): String = v match {
      case s: String => s
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case o => throw new IllegalArgumentException(s"not a string key: $o")
    }
    def fromItem(t: AnyRef): Any = t
  }

  case object BinaryKind extends Kind {
    type T = Array[Byte]
    val clazz: Class[Array[Byte]] = classOf[Array[Byte]]
    val comparator: Comparator[Array[Byte]] = new Comparator[Array[Byte]] with Serializable {
      def compare(a: Array[Byte], b: Array[Byte]): Int = java.util.Arrays.compareUnsigned(a, b)
    }
    val serde: ArrayOfItemsSerDe[Array[Byte]] = new ArrayOfBytesArraySerDe
    def toItem(v: Any): Array[Byte] = v.asInstanceOf[Array[Byte]]
    def fromItem(t: AnyRef): Any = t
  }

  def kindOf(dt: DataType): Kind = dt match {
    case IntegerType => IntKind
    case LongType => LongKind
    case StringType => StringKind
    case BinaryType => BinaryKind
    case o => throw new IllegalArgumentException(s"not a key type: ${o.sql}")
  }

  def empty(kind: Kind, k: Int = K): ItemsSketch[AnyRef] =
    ItemsSketch.getInstance(kind.clazz, k, kind.comparator)
      .asInstanceOf[ItemsSketch[AnyRef]]

  def serialize(kind: Kind, sketch: ItemsSketch[AnyRef]): Array[Byte] =
    sketch.toByteArray(kind.serde.asInstanceOf[ArrayOfItemsSerDe[AnyRef]])

  def deserialize(kind: Kind, bytes: Array[Byte]): ItemsSketch[AnyRef] =
    ItemsSketch.getInstance(kind.clazz, Memory.wrap(bytes), kind.comparator, kind.serde)
      .asInstanceOf[ItemsSketch[AnyRef]]

  /** Union of serialized sketches (A5: SketchesUnionBuilder). */
  def union(kind: Kind, sketches: Seq[Array[Byte]]): ItemsSketch[AnyRef] = {
    val u = ItemsUnion.getInstance(kind.clazz, K, kind.comparator)
      .asInstanceOf[ItemsUnion[AnyRef]]
    sketches.foreach(b => u.union(deserialize(kind, b)))
    u.getResult
  }

  /** Median split point, as the reference computes it: the 0.5 quantile,
    * valid only if strictly between min and max (else no split possible).
    * (reference: FindPartitionSplitPoint.splitPointForDimension:76-89)
    */
  def medianSplitPoint(kind: Kind, merged: ItemsSketch[AnyRef]): Option[Any] = {
    if (merged.isEmpty) return None
    val median = merged.getQuantile(0.5,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
    val cmp = kind.comparator.asInstanceOf[Comparator[AnyRef]]
    if (cmp.compare(median, merged.getMinItem) > 0 && cmp.compare(median, merged.getMaxItem) <= 0)
      Some(kind.fromItem(median))
    else None
  }
}
