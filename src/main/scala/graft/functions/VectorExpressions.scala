package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernels for vector similarity — static-callable from
  * generated Java, one tight loop per row (see HashOps scaladoc for why
  * higher-order functions were abandoned: they are CodegenFallback).
  * Element access is type-dispatched once per call via the `aFloat`
  * flags the expressions resolve from their child types.
  */
object VectorOps {


  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Cosine similarity in a single fused pass (dot, |a|, |b| together).
    * Mismatched lengths compare the common min(len) prefix — documented
    * truncation (padding with zeros would give the same dot product but a
    * different norm; callers wanting strictness should validate lengths
    * upstream).
    */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aFloat); val y = get(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0
    var i = 0
    while (i < n) { d += get(a, i, aFloat) * get(b, i, bFloat); i += 1 }
    d
  }

  /** Deterministic hyperplane weight in [-1000, 1000]: an LCG over the
    * mixed index (salt, plane, dim). No driver-side plane matrix to
    * broadcast — any executor recomputes the same planes — and the
    * formula is plain 64-bit integer arithmetic, so an independent SQL
    * engine (the DuckDB oracle) can reproduce the exact same planes.
    * All intermediates stay far below 2^63 (salt ≤ ~1e3, p,d ≤ ~1e4).
    */
  @inline private def weight(salt: Long, p: Int, d: Int): Double = {
    val x = salt * 1000003L + p * 7919L + d
    (java.lang.Math.floorMod(x * 2654435761L + 1013904223L, 2001L) - 1000L).toDouble
  }

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a
    * long (Charikar '02 SimHash for angular distance). O(bits × dims)
    * fused multiply-adds per row, compiled.
    */
  def hyperplaneSig(v: ArrayData, bits: Int, salt: Long, isFloat: Boolean): Long = {
    val dims = v.numElements()
    var sig = 0L
    var p = 0
    while (p < bits) {
      var proj = 0.0
      var d = 0
      while (d < dims) {
        proj += get(v, d, isFloat) * weight(salt, p, d)
        d += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Index of the nearest centroid by cosine (= max dot product, the
    * centroid rows being pre-normalized), ties toward the lowest index.
    * `flat` is the k×dim centroid matrix row-major; one fused loop, no
    * per-row allocation. Truncates to the common min(dim, |v|) prefix
    * like [[cosine]].
    */
  def nearestCell(v: ArrayData, flat: Array[Double], k: Int, isFloat: Boolean): Int = {
    val dim = flat.length / k
    val n = math.min(dim, v.numElements())
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += get(v, i, isFloat) * flat(off + i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** Max cosine similarity of `v` against the pre-normalized centroid
    * matrix — the k-means|| cost kernel (cost = 2 − 2·maxCos on
    * normalized points). A zero vector reports 1.0 (cost 0): it can
    * never be a useful center and must not poison the sampling total.
    */
  def maxCentroidCos(v: ArrayData, flat: Array[Double], k: Int, isFloat: Boolean): Double = {
    val dim = flat.length / k
    val n = math.min(dim, v.numElements())
    var norm = 0.0
    var i = 0
    while (i < n) { val x = get(v, i, isFloat); norm += x * x; i += 1 }
    if (norm <= 0) return 1.0
    val inv = 1.0 / math.sqrt(norm)
    var best = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      i = 0
      while (i < n) { dot += get(v, i, isFloat) * flat(off + i); i += 1 }
      if (dot > best) best = dot
      c += 1
    }
    best * inv
  }
}

/** Centroid matrix for the IVF expressions: k pre-normalized rows,
  * flattened row-major. A plain `Array[Double]` param in a case class
  * would compare by reference (see the BloomMightContainLong lesson) —
  * structurally identical expressions would never canonicalize equal and
  * subexpression elimination would miss them — so equality/hashCode here
  * are content-based.
  */
case class CentroidMatrix(flat: Array[Double], k: Int) extends Serializable {
  require(k > 0 && flat.length % k == 0, s"flat length ${flat.length} not divisible by k=$k")
  def dim: Int = flat.length / k
  def row(c: Int): Array[Double] = java.util.Arrays.copyOfRange(flat, c * dim, (c + 1) * dim)
  override def equals(o: Any): Boolean = o match {
    case CentroidMatrix(f, kk) => kk == k && java.util.Arrays.equals(f, flat)
    case _ => false
  }
  override def hashCode(): Int = 31 * k + java.util.Arrays.hashCode(flat)
  override def toString: String = s"CentroidMatrix(k=$k, dim=$dim)"
}

object CentroidMatrix {
  /** Build from centroid rows, L2-normalizing each (zero rows pass through). */
  def normalized(rows: Array[Array[Double]]): CentroidMatrix = {
    val k = rows.length
    val dim = rows.head.length
    val flat = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      val r = rows(c)
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += r(i) * r(i); i += 1 }
      val inv = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
      i = 0
      while (i < dim) { flat(c * dim + i) = r(i) * inv; i += 1 }
      c += 1
    }
    CentroidMatrix(flat, k)
  }
}

private[functions] trait VecElemType { self: Expression =>
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Only float/double element arrays are valid — anything else would
    * read garbage through the typed getters at runtime, so fail analysis.
    */
  protected def checkVecTypes(es: Seq[Expression]): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    es.zipWithIndex.collectFirst {
      case (e, i) if !e.dataType.isInstanceOf[ArrayType] ||
          !Seq(FloatType, DoubleType).contains(e.dataType.asInstanceOf[ArrayType].elementType) =>
        TypeCheckFailure(
          s"argument ${i + 1} of ${self.prettyName} must be array<float> or array<double>, " +
            s"got ${e.dataType.sql}")
    }.getOrElse(TypeCheckSuccess)
  }
}

/** `cosine_sim(a, b)`: cosine similarity of two numeric arrays
  * (float or double elements), fused single pass, native codegen.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VecElemType {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(left, right))
  private lazy val aF = elemIsFloat(left)
  private lazy val bF = elemIsFloat(right)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.cosine($a, $b, $aF, $bF);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `dot_product(a, b)`: dot product of two numeric arrays, native codegen. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VecElemType {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(left, right))
  private lazy val aF = elemIsFloat(left)
  private lazy val bF = elemIsFloat(right)

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorOps.dot($a, $b, $aF, $bF);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `hyperplane_lsh(vec, bits, salt)`: random-hyperplane LSH signature
  * packed into a long; planes derived deterministically from the salt so
  * multiple independent hash tables are just different salts.
  */
case class HyperplaneLsh(child: Expression, bits: Int, salt: Long)
    extends UnaryExpression with VecElemType {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val vF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    VectorOps.hyperplaneSig(v.asInstanceOf[ArrayData], bits, salt, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorOps.hyperplaneSig($v, $bits, ${salt}L, $vF);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLsh =
    copy(child = newChild)
}

/** `nearest_centroid(vec)`: index of the nearest (max-cosine) centroid in
  * a fixed pre-normalized matrix, ties toward the lowest index. The
  * matrix ships once per plan via `addReferenceObj` — never per row —
  * so assignment runs shuffle-free inside whole-stage codegen.
  */
case class NearestCentroid(child: Expression, m: CentroidMatrix)
    extends UnaryExpression with VecElemType {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val vF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    VectorOps.nearestCell(v.asInstanceOf[ArrayData], m.flat, m.k, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flat = ctx.addReferenceObj("centFlat", m.flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorOps.nearestCell($v, $flat, ${m.k}, $vF);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `max_centroid_cos(vec)`: max cosine of `vec` against the fixed
  * centroid matrix — the k-means|| sampling cost kernel.
  */
case class MaxCentroidCos(child: Expression, m: CentroidMatrix)
    extends UnaryExpression with VecElemType {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "max_centroid_cos"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVecTypes(Seq(child))
  private lazy val vF = elemIsFloat(child)

  protected override def nullSafeEval(v: Any): Any =
    VectorOps.maxCentroidCos(v.asInstanceOf[ArrayData], m.flat, m.k, vF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flat = ctx.addReferenceObj("centFlat", m.flat, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.VectorOps.maxCentroidCos($v, $flat, ${m.k}, $vF);")
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCentroidCos =
    copy(child = newChild)
}

object VectorExpressions {
  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSim(bridge.expression(a), bridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))
  def hyperplane_lsh(v: Column, bits: Int, salt: Long): Column =
    bridge.column(HyperplaneLsh(bridge.expression(v), bits, salt))
  def nearest_centroid(v: Column, m: CentroidMatrix): Column =
    bridge.column(NearestCentroid(bridge.expression(v), m))
  def max_centroid_cos(v: Column, m: CentroidMatrix): Column =
    bridge.column(MaxCentroidCos(bridge.expression(v), m))
}
