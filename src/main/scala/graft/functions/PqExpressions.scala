package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011 — the standard large-scale
  * ANN compression): a d-dim vector splits into `m` subvectors of d/m
  * dims, each quantized to its nearest of `ksub` trained codewords, so
  * the whole vector compresses to `m` small codes (here one byte each —
  * 64-dim float embeddings become 8 bytes, a 32× shrink). Query-time
  * scoring is ADC (asymmetric distance computation): the query builds an
  * m×ksub lookup table of per-subspace dot products ONCE, then every
  * encoded vector scores with `m` table lookups — no float math per row.
  *
  * Vectors are L2-normalized before encoding, so the summed subspace dot
  * products approximate the cosine similarity and ADC ranking agrees
  * with the exact cosine ranking up to quantization error; candidates
  * from the ADC scan are exact-rescored by the caller
  * (VectorFunctions.knnPq).
  *
  * Static-callable from generated Java like the [[VectorOps]] kernels —
  * tight loops, no per-row allocation beyond the code array.
  */
object PqOps {

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Encode one vector to `m` byte codes: per subspace, the index of the
    * L2-nearest codeword of its (normalized) subvector, ties toward the
    * lowest code. A vector shorter than m×dsub treats missing dims as 0
    * (same truncation convention as [[VectorOps.cosine]]); the zero
    * vector encodes against the raw zeros (inv = 0).
    */
  def encode(v: ArrayData, flat: Array[Double], m: Int, ksub: Int,
      isFloat: Boolean): ArrayData = {
    val dsub = flat.length / (m * ksub)
    val n = v.numElements()
    // L2 norm over the usable prefix
    var norm = 0.0
    var i = 0
    val lim = math.min(n, m * dsub)
    while (i < lim) { val x = get(v, i, isFloat); norm += x * x; i += 1 }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val x = if (base + d < n) get(v, base + d, isFloat) * inv else 0.0
          val diff = x - flat(off + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** ADC score: sum of the per-subspace table entries selected by the
    * codes — m lookups, nothing else.
    */
  def adc(codes: ArrayData, table: Array[Double], ksub: Int): Double = {
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) { s += table(j * ksub + (codes.getByte(j) & 0xff)); j += 1 }
    s
  }

  /** RESIDUAL encode — the IVFADC composition (Jégou '11 §III): quantize
    * `normalize(v) − centroid(cell)` against residual-trained codebooks,
    * WITHOUT re-normalizing (residuals are not unit vectors; their scale
    * is the signal). Query-time scoring recomposes
    * cos(q, v) ≈ dot(q̂, c_cell) + Σ_j table[j][code_j].
    * `cent` is the pre-normalized k×dim coarse matrix row-major.
    */
  def encodeResidual(v: ArrayData, cell: Int, cent: Array[Double], k: Int,
      flat: Array[Double], m: Int, ksub: Int, isFloat: Boolean): ArrayData = {
    val dsub = flat.length / (m * ksub)
    val dim = m * dsub
    val cdim = cent.length / k
    val coff = cell * cdim
    val n = v.numElements()
    var norm = 0.0
    var i = 0
    val lim = math.min(n, dim)
    while (i < lim) { val x = get(v, i, isFloat); norm += x * x; i += 1 }
    val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (j * ksub + c) * dsub
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val p = base + d
          val x = (if (p < n) get(v, p, isFloat) * inv else 0.0) -
            (if (p < cdim) cent(coff + p) else 0.0)
          val diff = x - flat(off + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }
}

/** Trained PQ codebooks: `m` subspaces × `ksub` codewords × `dsub` dims,
  * flattened row-major (codeword (j, c) starts at `(j*ksub + c)*dsub`).
  * Content-based equality like [[CentroidMatrix]] so structurally equal
  * expressions canonicalize equal.
  */
case class PqCodebooks(flat: Array[Double], m: Int, ksub: Int) extends Serializable {
  require(m > 0 && ksub > 0 && ksub <= 256 && flat.length % (m * ksub) == 0,
    s"flat length ${flat.length} not divisible by m*ksub=${m * ksub} (or ksub > 256)")
  def dsub: Int = flat.length / (m * ksub)
  def dim: Int = m * dsub
  def codeword(j: Int, c: Int): Array[Double] =
    java.util.Arrays.copyOfRange(flat, (j * ksub + c) * dsub, (j * ksub + c + 1) * dsub)
  override def equals(o: Any): Boolean = o match {
    case PqCodebooks(f, mm, kk) => mm == m && kk == ksub && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int = (31 * m + ksub) * 31 + java.util.Arrays.hashCode(flat)
  override def toString: String = s"PqCodebooks(m=$m, ksub=$ksub, dsub=$dsub)"
}

/** `pq_encode(vec)`: the vector's `m` PQ codes as array<byte>. Codebooks
  * ship once per plan via `addReferenceObj`, never per row.
  */
case class PqEncode(child: Expression, cb: PqCodebooks)
    extends UnaryExpression with VecElemType {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val vF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], cb.flat, cb.m, cb.ksub, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flat = ctx.addReferenceObj("pqFlat", cb.flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqOps.encode($v, $flat, ${cb.m}, ${cb.ksub}, $vF);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table (m×ksub flat); content-based equality for
  * canonicalization, same reasoning as [[CentroidMatrix]].
  */
case class PqDistTable(flat: Array[Double], ksub: Int) extends Serializable {
  require(ksub > 0 && flat.length % ksub == 0, s"table length ${flat.length} not m×ksub")
  def m: Int = flat.length / ksub
  override def equals(o: Any): Boolean = o match {
    case PqDistTable(f, kk) => kk == ksub && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int = 31 * ksub + java.util.Arrays.hashCode(flat)
  override def toString: String = s"PqDistTable(m=$m, ksub=$ksub)"
}

/** `pq_adc(codes)`: approximate cosine of the encoded vector against the
  * query baked into the table — m byte-indexed lookups per row.
  */
case class PqAdc(child: Expression, table: PqDistTable) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(ByteType, _) => TypeCheckSuccess
      case t => TypeCheckFailure(s"pq_adc needs array<byte> codes, got ${t.sql}")
    }
  }

  protected override def nullSafeEval(codes: Any): Any =
    PqOps.adc(codes.asInstanceOf[ArrayData], table.flat, table.ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flat = ctx.addReferenceObj("adcTable", table.flat, "double[]")
    nullSafeCodeGen(ctx, ev, codes =>
      s"${ev.value} = graft.functions.PqOps.adc($codes, $flat, ${table.ksub});")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** `pq_encode_residual(vec, cell)`: the vector's `m` residual-PQ codes
  * against its coarse cell — the IVFADC build kernel. Both the coarse
  * matrix and the codebooks ship once per plan via `addReferenceObj`.
  */
case class PqEncodeResidual(left: Expression, right: Expression,
    cents: CentroidMatrix, cb: PqCodebooks)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with VecElemType {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode_residual"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    checkVecTypes(Seq(left)) match {
      case TypeCheckSuccess => right.dataType match {
        case IntegerType => TypeCheckSuccess
        case t => TypeCheckFailure(s"pq_encode_residual cell must be int, got ${t.sql}")
      }
      case f => f
    }
  }
  private lazy val vF = elemIsFloat(left)

  protected override def nullSafeEval(v: Any, cell: Any): Any =
    PqOps.encodeResidual(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      cents.flat, cents.k, cb.flat, cb.m, cb.ksub, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cent = ctx.addReferenceObj("ivfpqCent", cents.flat, "double[]")
    val flat = ctx.addReferenceObj("ivfpqFlat", cb.flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, cell) =>
      s"${ev.value} = graft.functions.PqOps.encodeResidual($v, $cell, $cent, ${cents.k}, " +
        s"$flat, ${cb.m}, ${cb.ksub}, $vF);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeResidual =
    copy(left = l, right = r)
}

object PqExpressions {
  def pq_encode(v: Column, cb: PqCodebooks): Column =
    bridge.column(PqEncode(bridge.expression(v), cb))
  def pq_adc(codes: Column, table: PqDistTable): Column =
    bridge.column(PqAdc(bridge.expression(codes), table))
  def pq_encode_residual(v: Column, cell: Column, cents: CentroidMatrix,
      cb: PqCodebooks): Column =
    bridge.column(PqEncodeResidual(bridge.expression(v), bridge.expression(cell), cents, cb))
}
