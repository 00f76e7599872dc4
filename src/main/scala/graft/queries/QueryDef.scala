package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark build function plus (optionally)
  * an equivalent ANSI SQL string the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two.
  *
  * Determinism rules (so the driver's hash compare is stable):
  *  - every query ends in a total ORDER BY with a unique tiebreak;
  *  - no raw timestamp outputs (cast to string or epoch long);
  *  - money sums accumulate in DECIMAL and output as DOUBLE;
  *  - counts / integer sums output as BIGINT in both engines.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(sql: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(sql))
  def rowsOnly(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
