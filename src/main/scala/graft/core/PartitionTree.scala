package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, when}

/** A node in the binary key-space split tree. A partition owns a
  * contiguous hyper-rectangle of key space (its region); non-leaf
  * partitions record which key dimension their children split on and at
  * what value. (reference: java/core/.../partition/Partition.java:37-43,
  * PartitionTree.java:41, tree semantics docs/design.md:83-134)
  */
final case class Partition(
    id: String,
    region: Region,
    parentId: Option[String],
    childIds: Seq[String],
    splitDimension: Option[Int],
    splitPoint: Option[Any]) {
  def isLeaf: Boolean = childIds.isEmpty
}

/** Immutable partition tree with the planner-side operations the
  * reference performs: leaf lookup for a key, leaves overlapping a query
  * region, ancestor chains (for file selection), and leaf assignment as a
  * single codegen-friendly Catalyst expression for ingest.
  */
final case class PartitionTree(schema: GraftSchema, partitions: Seq[Partition]) {

  private val byId: Map[String, Partition] = partitions.map(p => p.id -> p).toMap

  val root: Partition = {
    val roots = partitions.filter(_.parentId.isEmpty)
    require(roots.size == 1, s"expected exactly one root, got ${roots.size}")
    roots.head
  }

  def apply(id: String): Partition = byId(id)
  def leaves: Seq[Partition] = partitions.filter(_.isLeaf)

  /** Leaf containing a concrete key (row-key values in schema order). */
  def leafFor(key: Seq[Any]): Partition = {
    var node = root
    while (!node.isLeaf) {
      val d = node.splitDimension.get
      val sp = node.splitPoint.get
      val goLeft = KeyOrdering.compare(key(d), sp) < 0
      node = byId(node.childIds(if (goLeft) 0 else 1))
    }
    node
  }

  /** Ancestors from the partition's parent up to the root.
    * (reference: QueryPlanner.getFiles walks this chain, :222-237)
    */
  def ancestors(id: String): Seq[Partition] = {
    val b = Seq.newBuilder[Partition]
    var cur = byId(id).parentId
    while (cur.isDefined) { val p = byId(cur.get); b += p; cur = p.parentId }
    b.result()
  }

  /** Leaves whose region overlaps any of the query regions.
    * (reference: QueryPlanner.getRelevantLeafPartitions:206-220)
    */
  def leavesOverlapping(regions: Seq[Region]): Seq[Partition] =
    leaves.filter(l => regions.exists(_.overlaps(l.region)))

  /** Leaf-assignment as a nested CASE WHEN over the split tree — pure
    * Catalyst, whole-stage-codegen'd, O(depth) comparisons per row. This
    * replaces the reference's per-row broadcast-tree descent
    * (bulk-import AddPartitionFunction.java) with an expression the
    * optimizer can see through.
    */
  def leafIdColumn: Column = {
    def descend(p: Partition): Column =
      if (p.isLeaf) lit(p.id)
      else {
        val field = schema.rowKeys(p.splitDimension.get).name
        val sp = p.splitPoint.get
        when(col(field) < lit(sp), descend(byId(p.childIds(0))))
          .otherwise(descend(byId(p.childIds(1))))
      }
    descend(root)
  }

  def addSplit(parentId: String, dimension: Int, splitPoint: Any,
      leftId: String, rightId: String): PartitionTree = {
    val parent = byId(parentId)
    require(parent.isLeaf, s"can only split a leaf partition: $parentId")
    val field = schema.rowKeys(dimension).name
    def replaceRange(r: Region, f: KeyRange => KeyRange): Region =
      Region(r.ranges.map(kr => if (kr.field == field) f(kr) else kr))
    val leftRegion = replaceRange(parent.region, _.copy(max = Some(splitPoint), maxInclusive = false))
    val rightRegion = replaceRange(parent.region, _.copy(min = Some(splitPoint), minInclusive = true))
    val left = Partition(leftId, leftRegion, Some(parentId), Nil, None, None)
    val right = Partition(rightId, rightRegion, Some(parentId), Nil, None, None)
    val newParent = parent.copy(childIds = Seq(leftId, rightId),
      splitDimension = Some(dimension), splitPoint = Some(splitPoint))
    PartitionTree(schema, partitions.filterNot(_.id == parentId) ++ Seq(newParent, left, right))
  }
}

object PartitionTree {

  /** Single-partition tree covering all key space. */
  def single(schema: GraftSchema): PartitionTree = {
    val region = Region(schema.rowKeys.map(f => KeyRange.unbounded(f.name)))
    PartitionTree(schema, Seq(Partition("root", region, None, Nil, None, None)))
  }

  /** Build a balanced tree from sorted split points on the first row-key
    * dimension — the reference's initial-partitioning path
    * (PartitionsFromSplitPoints.java:44-294). n split points → n+1 leaves.
    */
  def fromSplitPoints(schema: GraftSchema, splitPoints: Seq[Any]): PartitionTree = {
    require(splitPoints == splitPoints.sortWith((a, b) => KeyOrdering.compare(a, b) < 0),
      "split points must be sorted ascending")
    require(splitPoints.distinct.size == splitPoints.size, "split points must be distinct")
    if (splitPoints.isEmpty) return single(schema)

    val field = schema.rowKeys.head.name
    val otherDims = schema.rowKeys.tail.map(f => KeyRange.unbounded(f.name))
    var counter = 0
    def freshId(): String = { counter += 1; s"p$counter" }
    val all = Seq.newBuilder[Partition]

    // Recursively split [lo, hi) at the median split point.
    def build(id: String, parent: Option[String], lo: Option[Any], hi: Option[Any],
        points: Seq[Any]): Unit = {
      val region = Region(KeyRange(field, lo, minInclusive = true, hi, maxInclusive = false) +: otherDims)
      if (points.isEmpty) {
        all += Partition(id, region, parent, Nil, None, None)
      } else {
        val mid = points.size / 2
        val sp = points(mid)
        val (leftId, rightId) = (freshId(), freshId())
        all += Partition(id, region, parent, Seq(leftId, rightId), Some(0), Some(sp))
        build(leftId, Some(id), lo, Some(sp), points.take(mid))
        build(rightId, Some(id), Some(sp), hi, points.drop(mid + 1))
      }
    }
    build("root", None, None, None, splitPoints)
    PartitionTree(schema, all.result())
  }
}
