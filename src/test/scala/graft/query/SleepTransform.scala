package graft.query

import org.apache.spark.sql.DataFrame
import graft.core.GraftSchema
import graft.transforms.SortedRowTransform

/** Test transform that sleeps its config-string milliseconds when the
  * query plan is built — makes a query measurably long so the async
  * REST path can prove its 202 returns before completion.
  */
final class SleepTransform extends SortedRowTransform {
  private var ms: Long = 0L
  override def init(config: String, schema: GraftSchema): Unit =
    ms = config.trim.toLong
  override def apply(df: DataFrame): DataFrame = {
    Thread.sleep(ms)
    df
  }
}
