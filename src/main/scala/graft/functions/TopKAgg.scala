package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k (score, id) pairs with the greatest
  * score, ties broken toward the smaller id — a total order, so the
  * result is a pure function of the input SET. Duplicate (score, id)
  * pairs collapse (callers feed one row per id). O(log k) insert,
  * O(k) state.
  */
final class TopKBuffer(val k: Int) extends Serializable {
  // worst-first ordering: head = the entry the next better row evicts
  val set = new java.util.TreeSet[(Double, Long)](
    (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def add(score: Double, id: Long): Unit = {
    if (set.size < k) { set.add((score, id)); () }
    else {
      val worst = set.first()
      if (score > worst._1 || (score == worst._1 && id < worst._2)) {
        if (set.add((score, id))) { set.pollFirst(); () }
      }
    }
  }
}

object TopKBuffer {
  def toBytes(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * buf.set.size)
    bb.putInt(buf.k); bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }
}

/** `top_k(score, id, k)`: mergeable per-group top-k as an aggregate —
  * the scale-correct replacement for `row_number() OVER (PARTITION BY g
  * ORDER BY score DESC) <= k`, which shuffles EVERY candidate row to
  * its group's reducer; here each map task keeps an O(k) heap per group
  * and only O(groups × k) state ever shuffles. Returns
  * array<struct<id, score>> best-first (score desc, id asc tiebreak).
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"top_k needs k > 0, got $k")

  private def score: Expression = left
  private def id: Expression = right

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k expects (double score, long id), got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) { val (s, i) = it.next(); buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    // best-first: descending iterator over the worst-first tree
    val out = new Array[Any](buf.set.size)
    val it = buf.set.descendingIterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = InternalRow(id, s)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = TopKBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TopKAgg = copy(left = newLeft, right = newRight)
}

object TopKAgg {
  def top_k(score: Column, id: Column, k: Int): Column =
    bridge.column(TopKAgg(bridge.expression(score), bridge.expression(id), k)
      .toAggregateExpression())
}
