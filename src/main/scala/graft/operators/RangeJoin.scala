package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key: match every point row to
  * every interval row with `lo <= point <= hi`.
  *
  * Spark plans a bare inequality join as a BroadcastNestedLoopJoin —
  * O(points × intervals) work that is the canonical 100-TB scale-killer.
  * The binned plan here is the standard fix (the same idea behind
  * Databricks' range-join hints and interval trees flattened onto a
  * grid): pick a bin width `w`, map each point to the single bin
  * `floor(p / w)` and each interval to every bin it touches
  * (`sequence(floor(lo/w), floor(hi/w))`, exploded), hash-join on the
  * bin index, and keep the exact predicate as a post-filter. Each
  * matching (point, interval) pair meets in EXACTLY one bin — the
  * point's — so no distinct is needed; the join is a plain shuffled
  * hash join that partitions like any other.
  *
  * Choose `w` near the typical interval length: replication of an
  * interval is `ceil(len/w) + 1` bins, and a bin's candidate count is
  * (points in bin) × (intervals touching it). Degenerate skew (an
  * interval spanning the whole domain) replicates that one row widely —
  * bound it by clamping interval length upstream, not by widening `w`
  * for everyone.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val bin = (c: Column) => floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(iv, p("__bin") === iv("__bin")
        && col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
