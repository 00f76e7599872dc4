package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.LongType
import graft.core.{GraftField, GraftSchema}
import graft.table.GraftTable

/** spark-submit-able table bootstrap for non-JVM clients' tests and
  * demos (the Python client's pytest drives it): creates a (k: long
  * row key, v: long value) table at `<dir>`, split at `<split>`, and
  * ingests rows 1..n with v = k * 10. An optional 4th argument sets
  * the table's aggregationConfig (e.g. `last(v)` for a
  * last-write-wins table the Python merge test targets).
  *
  *   spark-submit --class graft.query.TableSeeder graft.jar \
  *     <dir> <rows> <split> [aggregationConfig]
  */
object TableSeeder {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: TableSeeder <dir> <rows> <split> [aggregationConfig]")
    val (dir, rowsS, splitS) = (args(0), args(1), args(2))
    val aggConfig = if (args.length == 4) args(3) else ""
    val spark = SparkSession.builder().appName("graft-table-seeder").getOrCreate()
    import spark.implicits._
    val schema = GraftSchema(
      rowKeys = Seq(GraftField("k", LongType)),
      sortKeys = Nil,
      values = Seq(GraftField("v", LongType)))
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq(splitS.toLong),
      config = graft.table.TableConfig(aggregationConfig = aggConfig))
    table.ingest((1L to rowsS.toLong).map(i => (i, i * 10)).toDF("k", "v"))
    println(s"""{"dir":"$dir","rows":$rowsS}""")
  }
}
