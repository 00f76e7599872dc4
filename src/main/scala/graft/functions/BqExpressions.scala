package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Binary (1-bit) vector quantization: each dimension stores only its
  * SIGN bit, so a float32 vector compresses 32× (dim/8 bytes), and
  * similarity is pre-ranked by Hamming distance — popcount over XORed
  * code words, the cheapest possible scan a vector index can run (the
  * faiss IndexBinary / "BQ" serving shape; modern variants like RaBitQ
  * refine the same idea). Sign-bit Hamming approximates angular
  * distance (for unit-ish vectors, P[sign differs] = θ/π per random
  * hyperplane — the SimHash identity), so a small exact rerank over the
  * best Hamming candidates recovers true cosine top-k: at 100 TB the
  * full-precision vectors are touched for only O(rerank) rows per query
  * while the scan reads 1/32nd of the float bytes.
  *
  * Bit layout: dimension i -> byte i/8, bit i%8 (LSB first); trailing
  * pad bits are zero on both sides, so they never contribute to XOR.
  */
object BqOps {

  /** Pack sign bits: bit i set iff v(i) >= 0. */
  def encode(v: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x >= 0) out(i / 8) = (out(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    out
  }

  /** Hamming distance between two equal-length sign codes. */
  def hamming(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length,
      s"bq code length mismatch: ${a.length} vs ${b.length}")
    var acc = 0L
    var i = 0
    // 8-byte strides through the tails' common prefix, then bytes
    while (i + 8 <= a.length) {
      var wa = 0L
      var wb = 0L
      var j = 0
      while (j < 8) {
        wa |= (a(i + j) & 0xffL) << (8 * j)
        wb |= (b(i + j) & 0xffL) << (8 * j)
        j += 1
      }
      acc += java.lang.Long.bitCount(wa ^ wb)
      i += 8
    }
    while (i < a.length) {
      acc += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    acc
  }
}

/** `bq_encode(vec)`: the packed sign-bit code (binary, ceil(dim/8) bytes). */
case class BqEncode(child: Expression) extends UnaryExpression with VecElemType {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val isF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    BqOps.encode(v.asInstanceOf[ArrayData], isF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BqOps.encode($v, $isF);")

  override protected def withNewChildInternal(newChild: Expression): BqEncode =
    copy(child = newChild)
}

/** `bq_hamming(codesA, codesB)`: popcount(XOR) — the binary pre-rank. */
case class BqHamming(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bq_hamming"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckSuccess
    else TypeCheckFailure(s"$prettyName needs two binary code columns, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    BqOps.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BqOps.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BqHamming =
    copy(left = l, right = r)
}

object BqExpressions {
  def bq_encode(v: Column): Column = bridge.column(BqEncode(bridge.expression(v)))
  def bq_hamming(a: Column, b: Column): Column =
    bridge.column(BqHamming(bridge.expression(a), bridge.expression(b)))
}
