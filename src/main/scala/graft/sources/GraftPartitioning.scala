package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructType}
import graft.core.{KeyOrdering, PartitionTree, Region}

/** Storage-partitioned joins (SPJ) for graft tables: the DSv2 scan
  * reports `KeyGroupedPartitioning` over the partition-tree leaves so
  * plain `spark.sql` joins and GROUP BYs on row-key prefixes between
  * co-partitioned graft tables run with ZERO shuffle — the declarative
  * sibling of the manual [[graft.operators.CoJoin]] leaf-zip, and one
  * step past the reference's own Spark connector, which stops at filter
  * pushdown (java/analytics-integration/spark/SleeperScanBuilder.java:37).
  *
  * Spark's SPJ matches partition VALUES produced by a common transform
  * function, which cannot natively express "same RANGE tiling": two
  * tables with different split points would collide on identity-labeled
  * values and silently co-locate rows that live in different ranges.
  * The sound encoding used here:
  *
  *  - the transform is a catalog-resolved function
  *    `graft_leaf_<fingerprint>(splitKeyCols...)` whose RESULT is the
  *    leaf ORDINAL (the leaf's index in the canonical key-sorted order
  *    of the tree's leaf regions) — every row of a leaf really does
  *    map to that single value, so `KeyGroupedPartitioning`'s contract
  *    ("equal clustering values ⇒ same partition") holds exactly;
  *  - the fingerprint hashes the canonical LEAF REGIONS (bounds +
  *    types, names excluded — co-partitioning is positional, like
  *    CoJoin). Two scans are join-compatible only when Spark sees the
  *    same function (`BoundFunction.canonicalName` carries the
  *    fingerprint), i.e. only when the trees tile key space
  *    identically; different trees fall back to a normal shuffle
  *    instead of producing wrong results — the failure mode is
  *    performance, never correctness;
  *  - the bound function is fully serializable and evaluable
  *    (`produceResult` walks the split tree), so
  *    `spark.sql.sources.v2.bucketing.shuffle.enabled` can shuffle a
  *    NON-graft join side by leaf ordinal while the graft side stays
  *    in place.
  *
  * Enable with `spark.sql.sources.v2.bucketing.enabled=true` (plus
  * `...pushPartValues.enabled`, default on, for pruned scans whose leaf
  * sets differ).
  */
object GraftPartitioning {

  val FunctionPrefix = "graft_leaf_"

  /** Key dimensions the tree actually splits on (ascending). A join
    * needs only these columns among its keys for leaf-grain
    * co-location; unsplit dimensions never influence leaf choice.
    */
  def splitDims(tree: PartitionTree): Seq[Int] =
    tree.partitions.flatMap(_.splitDimension).distinct.sorted

  /** Canonical leaf order: ascending by each dimension's lower bound
    * (None = -inf). Canonical regions tile key space, so this is total
    * and identical for any two trees with the same leaf tiling,
    * whatever their internal split history.
    */
  def sortedLeafIds(tree: PartitionTree): Seq[String] =
    tree.leaves.sortWith((a, b) => regionLt(a.region, b.region)).map(_.id)

  def leafOrdinals(tree: PartitionTree): Map[String, Int] =
    sortedLeafIds(tree).zipWithIndex.toMap

  private def cmpBound(a: Option[Any], b: Option[Any]): Int = (a, b) match {
    case (None, None) => 0
    case (None, _) => -1
    case (_, None) => 1
    case (Some(x), Some(y)) => KeyOrdering.compare(x, y)
  }

  private def regionLt(a: Region, b: Region): Boolean = {
    a.ranges.zip(b.ranges).foreach { case (ra, rb) =>
      val c = cmpBound(ra.min, rb.min)
      if (c != 0) return c < 0
    }
    false
  }

  /** Tiling fingerprint: SHA-256 over the canonical sorted leaf regions
    * (typed bounds per dimension, field names excluded). Equal
    * fingerprints ⟺ identical key-space tiling with identical key
    * types, the exact precondition for leaf-grain co-location.
    */
  def fingerprint(tree: PartitionTree): String = {
    def enc(v: Any): String = v match {
      case null => "_"
      case i: Int => s"i$i"
      case l: Long => s"l$l"
      case s: String => s"s${s.length}:$s"
      case b: Array[Byte] => "b" + b.map("%02x".format(_)).mkString
      case other => s"o$other"
    }
    val sb = new StringBuilder
    tree.schema.rowKeys.foreach(f => sb.append(f.dataType.typeName).append(';'))
    sortedLeafIds(tree).foreach { id =>
      tree(id).region.ranges.foreach { r =>
        sb.append(enc(r.min.orNull)).append(',').append(enc(r.max.orNull)).append('|')
      }
      sb.append('/')
    }
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sb.toString.getBytes(UTF_8))
    d.take(12).map("%02x".format(_)).mkString
  }

  /** Driver-side registry fingerprint → locator, populated when a scan
    * reports its partitioning and consulted by
    * [[GraftCatalog.loadFunction]] moments later in the same analysis
    * pass (`V2ScanPartitioningAndOrdering` resolves the transform
    * through the relation's FunctionCatalog).
    *
    * BOUNDED (access-order LRU): an entry is only needed between a scan
    * reporting its partitioning and that query's function resolution,
    * but each one pins a full PartitionTree — a long-lived session over
    * tables whose trees keep splitting (every split changes the
    * fingerprint) would otherwise grow driver memory without limit. The
    * cap is generous versus the per-query lifetime; eviction of a
    * STILL-RESOLVING entry (>128 distinct tilings inside one analysis
    * pass) would surface as NoSuchFunctionException, i.e. loudly and
    * FATALLY to that query (Spark does not re-plan on it) — never a
    * wrong result. The failure mode needs >128 distinct partition trees
    * in concurrent analysis, far past any real catalog session.
    */
  private val MaxRegistered = 128
  private val registry = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, LeafLocator](32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, LeafLocator]): Boolean =
        size() > MaxRegistered
    })

  def register(tree: PartitionTree): String = {
    val fp = fingerprint(tree)
    registry.computeIfAbsent(fp, _ => LeafLocator(tree, splitDims(tree), leafOrdinals(tree)))
    fp
  }

  def lookup(fp: String): Option[LeafLocator] = Option(registry.get(fp))
}

/** Serializable leaf-ordinal evaluator: walks the split tree exactly
  * like `PartitionTree.leafFor`, consuming only the split-dimension key
  * values (the transform's arguments).
  */
final case class LeafLocator(tree: PartitionTree, dims: Seq[Int],
    ordinals: Map[String, Int]) extends Serializable {

  def argTypes: Seq[DataType] = dims.map(tree.schema.rowKeys(_).dataType)
  def argNames: Seq[String] = dims.map(tree.schema.rowKeys(_).name)

  /** args are the split-dim values in `dims` order, external JVM types. */
  def ordinalOf(args: Array[Any]): Int = {
    val byDim = new Array[Any](tree.schema.rowKeys.size)
    var i = 0
    while (i < dims.length) { byDim(dims(i)) = args(i); i += 1 }
    ordinals(tree.leafFor(byDim.toSeq).id)
  }
}

final class GraftLeafUnbound(fnName: String, locator: LeafLocator)
    extends UnboundFunction {
  override def name(): String = fnName
  override def description(): String =
    s"graft partition-tree leaf ordinal over (${locator.argNames.mkString(", ")})"
  override def bind(inputType: StructType): BoundFunction = {
    val expected = locator.argTypes
    val got = inputType.fields.map(_.dataType).toSeq
    require(got == expected,
      s"$fnName expects (${expected.map(_.sql).mkString(", ")}), got (${got.map(_.sql).mkString(", ")})")
    new GraftLeafBound(fnName, locator)
  }
}

final class GraftLeafBound(fnName: String, locator: LeafLocator)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = locator.argTypes.toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = fnName
  // join compatibility hinges on this: equal canonical names ⟺ equal
  // leaf tilings (the fingerprint rides in fnName)
  override def canonicalName(): String = s"graft.$fnName"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val types = locator.argTypes
    val args = new Array[Any](types.size)
    var i = 0
    while (i < args.length) {
      args(i) = types(i) match {
        case StringType => input.getUTF8String(i).toString
        case LongType => input.getLong(i)
        case IntegerType => input.getInt(i)
        case BinaryType => input.getBinary(i)
        case dt => input.get(i, dt)
      }
      i += 1
    }
    Integer.valueOf(locator.ordinalOf(args))
  }
}
