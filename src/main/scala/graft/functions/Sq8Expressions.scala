package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Scalar (int8) vector quantization — the lighter sibling of PQ: each
  * vector stores one double scale (127 / max|v|) plus dim bytes, a 4×
  * compression of float32 with EXACT integer dot products between code
  * vectors (|code| <= 127, so a 4096-dim dot stays far inside long
  * range) — the SIMD-friendly serving format faiss calls SQ8. The
  * approximate inner product is int_dot / (scale_a * scale_b); because
  * the int accumulation is order-independent and the scale arithmetic
  * is a fixed small formula, a SQL oracle replays the scoring
  * bit-exactly — unlike float-sum scores, which differ by summation
  * order.
  */
object Sq8Ops {

  /** scale = 127 / max|v| (0 for the all-zero vector). */
  def scale(v: ArrayData, isFloat: Boolean): Double = {
    var mx = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) {
      val x = math.abs(if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > mx) mx = x
      i += 1
    }
    if (mx > 0) 127.0 / mx else 0.0
  }

  /** Pack v into int8 codes: floor(x * scale + 0.5) per element — the
    * same closed-form both engines replay (no banker's rounding
    * divergence).
    */
  def encode(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val s = scale(v, isFloat)
    val n = v.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = math.floor(x * s + 0.5).toByte
      i += 1
    }
    out
  }

  /** Exact integer dot product of two code vectors. */
  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"sq8 code length mismatch: ${a.length} vs ${b.length}")
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    acc
  }
}

/** `sq8_encode(vec)`: the packed int8 code vector (binary, dim bytes). */
case class Sq8Encode(child: Expression) extends UnaryExpression with VecElemType {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val isF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    Sq8Ops.encode(v.asInstanceOf[ArrayData], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Sq8Ops.encode($v, $isF);")

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** `sq8_scale(vec)`: the per-vector dequantization scale. */
case class Sq8Scale(child: Expression) extends UnaryExpression with VecElemType {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_scale"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val isF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    Sq8Ops.scale(v.asInstanceOf[ArrayData], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.Sq8Ops.scale($v, $isF);")

  override protected def withNewChildInternal(newChild: Expression): Sq8Scale =
    copy(child = newChild)
}

/** `sq8_dot(codesA, codesB)`: exact integer dot of two code vectors —
  * the tight serving loop (a compiled byte-array walk, no boxing).
  */
case class Sq8Dot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_dot"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName needs two binary code columns, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Sq8Ops.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Sq8Ops.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Sq8Dot =
    copy(left = l, right = r)
}

object Sq8Expressions {
  def sq8_encode(v: Column): Column = bridge.column(Sq8Encode(bridge.expression(v)))
  def sq8_scale(v: Column): Column = bridge.column(Sq8Scale(bridge.expression(v)))
  def sq8_dot(a: Column, b: Column): Column =
    bridge.column(Sq8Dot(bridge.expression(a), bridge.expression(b)))
}
