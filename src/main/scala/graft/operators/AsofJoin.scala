package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the single right
  * row with the same key and the greatest event time that is <= the left
  * row's time (the "latest state as of" lookup a feature-store or
  * training-data pipeline runs constantly — label each example with the
  * most recent preceding signal).
  *
  * Spark has no built-in as-of join, and the naive formulations both die
  * at scale: a correlated per-row subquery is O(left × right-per-key),
  * and an inequality join is a BroadcastNestedLoopJoin. This
  * implementation is the union + partitioned-window plan instead: tag
  * both sides, union them, sort each key's rows once by (time, side,
  * tiebreak), and carry the latest right payload forward with
  * last(_, ignoreNulls). ONE shuffle on the key and one sort — exactly a
  * window aggregation's cost, independent of how many right rows precede
  * each left row, so it survives a 1000-executor 100-TB run like any
  * other window query.
  *
  * The right payload rides in a single struct so a legitimately-null
  * payload FIELD cannot be skipped past by ignoreNulls (per-column
  * carry-forward would resurrect an older row's value for just that
  * column); the struct itself is non-null exactly on right rows.
  *
  * Within one key, rows order by (time, side, tiebreak) with right
  * before left at equal times — a right row timestamped exactly at the
  * left row's time counts (<=, the conventional as-of inclusive bound) —
  * and `tieBreak` makes the pick among equal-time right rows
  * deterministic (the greatest wins, matching "latest version wins").
  */
object AsofJoin {

  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      payloadCols: Seq[String],
      tieBreakCol: String,
      payloadPrefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(_.startsWith(payloadPrefix)),
      s"left side already has '$payloadPrefix*' columns; pass a different payloadPrefix")

    val payload = struct(payloadCols.map(col): _*)
    val taggedRight = right.select(
      Seq(col(keyCol), col(timeCol).as("__t"), lit(0).as("__side"),
        col(tieBreakCol).cast("long").as("__tie"), payload.as("__payload")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(timeCol).as("__t"), lit(1).as("__side"),
        col(tieBreakCol).cast("long").as("__tie"),
        lit(null).cast(taggedRight.schema("__payload").dataType).as("__payload")) ++
        leftCols.filterNot(_ == keyCol).map(col): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(p => col(s"__match.$p").as(s"$payloadPrefix$p")): _*)
  }

}
