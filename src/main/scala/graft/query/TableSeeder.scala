package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.LongType
import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

/** spark-submit-able table bootstrap for non-JVM clients' tests and
  * demos (the Python client's pytest drives it): creates a (k: long
  * row key, v: long value) table at `<dir>`, split at `<split>`, and
  * ingests rows 1..n with v = k * 10.
  *
  *   spark-submit --class graft.query.TableSeeder graft.jar <dir> <rows> <split>
  */
object TableSeeder {

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: TableSeeder <dir> <rows> <split>")
    val Array(dir, rowsS, splitS) = args
    val spark = SparkSession.builder().appName("graft-table-seeder").getOrCreate()
    import spark.implicits._
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("k", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", LongType)))
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(splitS.toLong))
    table.ingest((1L to rowsS.toLong).map(i => (i, i * 10)).toDF("k", "v"))
    println(s"""{"dir":"$dir","rows":$rowsS}""")
  }
}
