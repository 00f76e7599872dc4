package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bitset kernels for set-similarity over dictionary-encoded element ids:
  * pack a set of small ints into a long[] mask, intersect by AND+popcount.
  * Static methods so generated Java calls them directly inside
  * whole-stage codegen (same pattern as HashOps/VectorOps).
  */
object BitsetOps {

  def fromIndices(ids: ArrayData, numWords: Int): ArrayData = {
    val words = new Array[Long](numWords)
    val n = ids.numElements()
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      words(id >>> 6) |= (1L << (id & 63))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(words)
  }

  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }
}

/** `bitset_from_indices(ids, numWords)`: long[] bitmask from an int-id set. */
case class BitsetFromIndices(child: Expression, numWords: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_from_indices"

  protected override def nullSafeEval(input: Any): Any =
    BitsetOps.fromIndices(input.asInstanceOf[ArrayData], numWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BitsetOps.fromIndices($c, $numWords);")

  override protected def withNewChildInternal(newChild: Expression): BitsetFromIndices =
    copy(child = newChild)
}

/** `bitset_intersect_count(a, b)`: popcount of the AND of two masks. */
case class BitsetIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitset_intersect_count"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BitsetOps.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitsetOps.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitsetIntersectCount =
    copy(left = l, right = r)
}

object BitsetExpressions {
  def bitset_from_indices(ids: Column, numWords: Int): Column =
    bridge.column(BitsetFromIndices(bridge.expression(ids), numWords))
  def bitset_intersect_count(a: Column, b: Column): Column =
    bridge.column(BitsetIntersectCount(bridge.expression(a), bridge.expression(b)))
}
