package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Executed-plan audits. Used by the SPJ driver rows and specs to PROVE
  * a join/aggregation ran shuffle-free rather than trusting that it did
  * — AQE hides finalized exchanges inside QueryStageExec leaf nodes, so
  * a plain `collect { case s: ShuffleExchangeLike }` over the adaptive
  * plan undercounts (to zero) and would wave broken plans through.
  */
object Plans {

  /** (shuffle exchanges, broadcast exchanges) in the FINAL executed plan.
    * Call after an action has finalized AQE (or pass eagerly-executed
    * DataFrames).
    */
  def exchanges(df: DataFrame): (Int, Int) = {
    var sh = 0
    var bc = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          sh += 1
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
          bc += 1
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (sh, bc)
  }

  /** Run `df` to completion and require its final plan moved zero rows
    * across the network: no shuffle AND no broadcast exchange.
    */
  def requireExchangeFree(df: DataFrame, what: String): Unit = {
    df.collect()
    val (sh, bc) = exchanges(df)
    require(sh == 0 && bc == 0,
      s"$what expected an exchange-free plan, got $sh shuffle(s) + $bc broadcast(s):\n" +
        df.queryExecution.executedPlan)
  }
}
