package graft.jobs

import java.util.UUID
import graft.meta.SketchSidecar
import graft.functions.KeySketch
import graft.table.GraftTable

/** Partition splitting (M3): a leaf whose row count exceeds the split
  * threshold splits at the median of the merged key sketches of its
  * files, on the first dimension that yields a valid split point — a
  * metadata-only operation; data files are untouched and their references
  * are pushed down to the children (M4).
  * (reference: FindPartitionsToSplit.java, SplitPartition.java,
  * FindPartitionSplitPoint.java:45-89, SplitFileReferences.java)
  */
final class PartitionSplitter(table: GraftTable) {

  /** Returns ids of partitions that were split. */
  def run(): Seq[String] = {
    table.store.assertWritable()
    val threshold = table.config.splitThreshold
    val split = scala.collection.mutable.ArrayBuffer.empty[String]
    var progress = true
    while (progress) {
      progress = false
      val refs = table.store.fileReferences.groupBy(_.partitionId)
      val tree = table.store.partitionTree
      val oversize = tree.leaves
        .filter(l => refs.get(l.id).exists(_.map(_.rowCount).sum > threshold))
        .sortBy(_.id)
      oversize.headOption.foreach { leaf =>
        findSplitPoint(leaf.id).foreach { case (dim, point) =>
          val (l, r) = (s"${leaf.id}-${freshId()}", s"${leaf.id}-${freshId()}")
          table.store.splitPartition(leaf.id, dim, point, l, r)
          table.store.splitFileReferences()
          split += leaf.id
          progress = true
        }
      }
    }
    split.toSeq
  }

  /** First splittable dimension and its sketch-median split point
    * (reference: FindPartitionSplitPoint.splitPointForDimension — median
    * must be strictly inside (min, max] of observed keys AND inside the
    * partition's own region to be usable).
    */
  def findSplitPoint(partitionId: String): Option[(Int, Any)] = {
    val schema = table.schema
    val partition = table.store.partitionTree(partitionId)
    val files = table.store.fileReferences.filter(_.partitionId == partitionId)
      .map(table.pathOf)
    schema.rowKeys.zipWithIndex.iterator.flatMap { case (f, dim) =>
      val kind = KeySketch.kindOf(f.dataType)
      SketchSidecar.mergedSketch(schema, f.name, files)
        .flatMap(m => KeySketch.medianSplitPoint(kind, m))
        .filter { p =>
          val range = partition.region.ranges.find(_.field == f.name).get.canonical
          val aboveMin = range.min.forall(m => graft.core.KeyOrdering.compare(p, m) > 0)
          val belowMax = range.max.forall(m => graft.core.KeyOrdering.compare(p, m) < 0)
          aboveMin && belowMax
        }
        .map(dim -> _)
    }.nextOption()
  }

  private def freshId(): String = UUID.randomUUID().toString.take(4)
}
