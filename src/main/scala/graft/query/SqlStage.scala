package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** SELECT-only SQL stage over registered views — the analog of the
  * reference's arbitrary-SQL post-processing of query results, which
  * rejects DDL/DML/statements and only permits SELECT
  * (reference: rust/query_sql/src/lib.rs:35-54).
  *
  * The gate is a parse-time check on the logical plan type: anything that
  * parses to a Command (DDL, SET, CACHE, ...) or an insert is rejected
  * before execution.
  */
object SqlStage {

  def run(spark: SparkSession, sql: String): DataFrame = {
    val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
    def reject(kind: String): Nothing =
      throw new IllegalArgumentException(
        s"SqlStage permits SELECT statements only; got $kind: ${plan.nodeName}")
    plan match {
      case _: Command => reject("a command")
      case _: InsertIntoStatement => reject("an insert")
      case p if p.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.COMMAND) =>
        reject("a nested command")
      case _ => spark.sql(sql)
    }
  }

  /** Register a query-result DataFrame under the reference's conventional
    * view name and run SQL over it (leaf-query post-stage shape).
    */
  def overResults(spark: SparkSession, results: DataFrame, sql: String): DataFrame = {
    results.createOrReplaceTempView("query_results")
    run(spark, sql)
  }
}
