package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan '05): mergeable point-
  * frequency estimation in O(depth × width) memory — the third leg of
  * the one-pass profiling family next to KMV (how many distinct?) and
  * Misra-Gries (which keys dominate?): CMS answers "how often does key
  * x occur?" for ANY x after the pass, in fixed state, with one-sided
  * error (estimate >= truth, over by <= εN w.h.p.). At 100 TB: per-key
  * rate lookups over billions of keys for a 2 MB blob per pass, partials
  * merging map-side, no groupBy shuffle.
  *
  * Like [[FrequencySketches]]' sketches it is EXACT below capacity: the
  * buffer stays a sparse per-hash map until `capacity` distinct hashes
  * are seen, then densifies into the d×w counter matrix. Below capacity
  * every estimate is an exact count (64-bit-hash-collision caveat), so
  * the driver row oracle-checks against plain COUNT(*); the dense
  * estimator regime is spec-gated (never underestimates, merge ==
  * single-pass, εN bound).
  */
final class CmsBuffer(val depth: Int, val width: Int, val capacity: Int)
    extends Serializable {
  var n: Long = 0L
  // sparse regime: exact per-hash counts
  var sparse: java.util.HashMap[Long, Long] = new java.util.HashMap[Long, Long]()
  // dense regime: depth rows of width counters, row-major
  var dense: Array[Long] = null

  def isExact: Boolean = dense == null

  private def bucket(hash: Long, row: Int): Int = {
    // row-seeded second-level mix; floorMod for a non-negative index
    val h = XxMix.mix(hash, row)
    java.lang.Math.floorMod(h, width.toLong).toInt
  }

  private def densify(): Unit = {
    dense = new Array[Long](depth * width)
    val it = sparse.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      addDense(e.getKey, e.getValue)
    }
    sparse = null
  }

  private def addDense(hash: Long, count: Long): Unit = {
    var r = 0
    while (r < depth) {
      val i = r * width + bucket(hash, r)
      dense(i) += count
      r += 1
    }
  }

  def add(hash: Long, count: Long): Unit = {
    n += count
    if (dense != null) addDense(hash, count)
    else {
      sparse.merge(hash, count, (a, b) => a + b)
      if (sparse.size > capacity) densify()
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    require(other.depth == depth && other.width == width,
      s"incompatible CMS dims: ${depth}x$width vs ${other.depth}x${other.width}")
    n += other.n
    if (other.dense != null && dense == null) densify()
    if (other.dense != null) {
      var i = 0
      while (i < dense.length) { dense(i) += other.dense(i); i += 1 }
    } else {
      val it = other.sparse.entrySet().iterator()
      if (dense != null) {
        while (it.hasNext) { val e = it.next(); addDense(e.getKey, e.getValue) }
      } else {
        while (it.hasNext) {
          val e = it.next()
          sparse.merge(e.getKey, e.getValue, (a, b) => a + b)
        }
        if (sparse.size > capacity) densify()
      }
    }
  }

  /** Point estimate: exact in the sparse regime; min over the depth
    * rows in the dense regime (the CMS estimator — never underestimates).
    */
  def estimate(hash: Long): Long =
    if (dense == null) {
      // Explicit absent-key => 0: sparse is a boxed-Long map, and
      // relying on Scala's null-unboxing-to-0 would turn into an NPE
      // under any refactor that types the result as java.lang.Long.
      sparse.getOrDefault(hash, 0L)
    } else {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = dense(r * width + bucket(hash, r))
        if (c < best) best = c
        r += 1
      }
      best
    }
}

/** Row-seeded mixing shared by build and query sides. */
private[functions] object XxMix {
  def mix(hash: Long, row: Int): Long = {
    // xxhash64 avalanche over (hash ^ row-salt) — cheap, well-spread
    var h = hash ^ (0x9E3779B97F4A7C15L * (row + 1))
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    h
  }
}

object CmsBuffer {
  def toBytes(buf: CmsBuffer): Array[Byte] = {
    if (buf.dense == null) {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 * 3 + 8 + 4 + 16 * buf.sparse.size)
      bb.put(0: Byte)
      bb.putInt(buf.depth); bb.putInt(buf.width); bb.putInt(buf.capacity)
      bb.putLong(buf.n)
      bb.putInt(buf.sparse.size)
      val it = buf.sparse.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
      bb.array()
    } else {
      val bb = java.nio.ByteBuffer.allocate(1 + 4 * 3 + 8 + 8 * buf.dense.length)
      bb.put(1: Byte)
      bb.putInt(buf.depth); bb.putInt(buf.width); bb.putInt(buf.capacity)
      bb.putLong(buf.n)
      var i = 0
      while (i < buf.dense.length) { bb.putLong(buf.dense(i)); i += 1 }
      bb.array()
    }
  }

  def fromBytes(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val mode = bb.get()
    val buf = new CmsBuffer(bb.getInt(), bb.getInt(), bb.getInt())
    buf.n = bb.getLong()
    if (mode == 0) {
      val size = bb.getInt()
      var i = 0
      while (i < size) { buf.sparse.put(bb.getLong(), bb.getLong()); i += 1 }
    } else {
      buf.sparse = null
      buf.dense = new Array[Long](buf.depth * buf.width)
      var i = 0
      while (i < buf.dense.length) { buf.dense(i) = bb.getLong(); i += 1 }
    }
    buf
  }
}

/** `cms_sketch(key)`: the serialized Count-Min sketch of a key column —
  * partials combine map-side like every TypedImperativeAggregate; the
  * O(depth × width) blob answers point-frequency queries driver-side via
  * [[CountMinSketch.cmsEstimate]].
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1 && capacity >= 0,
    s"cms_sketch needs depth/width >= 1, got ${depth}x$width cap=$capacity")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    FrequencySketches.checkKeyType(child, prettyName)

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, width, capacity)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(FrequencySketches.hashValue(v, CountMinSketch.Seed), 1L)
    buf
  }

  override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CmsBuffer): Any = CmsBuffer.toBytes(buf)
  override def serialize(buf: CmsBuffer): Array[Byte] = CmsBuffer.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CmsBuffer = CmsBuffer.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CountMinSketch {
  /** Fixed hash seed so partials from different partitions agree. */
  private[functions] val Seed = 0x7F4A7C15L

  def cms_sketch(c: Column, depth: Int = 4, width: Int = 65536,
      capacity: Int = 65536): Column =
    bridge.column(CmsSketchAgg(bridge.expression(c), depth, width, capacity)
      .toAggregateExpression())

  def cmsEstimateLong(sketch: Array[Byte], key: Long): Long =
    CmsBuffer.fromBytes(sketch)
      .estimate(FrequencySketches.hashValue(key, Seed))

  /** Probe for sketches built over an IntegerType column. Int and Long
    * keys hash differently (XXH64.hashInt vs hashLong), so probing an
    * int-built sketch through cmsEstimateLong would silently return 0
    * in the sparse regime (or an unrelated bucket when dense); this
    * mirrors the update path's hash for int inputs.
    */
  def cmsEstimateInt(sketch: Array[Byte], key: Int): Long =
    CmsBuffer.fromBytes(sketch)
      .estimate(FrequencySketches.hashValue(key, Seed))

  def cmsEstimateString(sketch: Array[Byte], key: String): Long =
    CmsBuffer.fromBytes(sketch)
      .estimate(FrequencySketches.hashValue(UTF8String.fromString(key), Seed))

  /** True while the sketch still holds exact per-hash counts (below
    * capacity) — every estimate drawn from it is exact, the regime the
    * oracle-checked driver row asserts.
    */
  def cmsIsExact(sketch: Array[Byte]): Boolean = CmsBuffer.fromBytes(sketch).isExact

  def cmsTotal(sketch: Array[Byte]): Long = CmsBuffer.fromBytes(sketch).n
}
