package graft
object CountQ { def main(a: Array[String]): Unit = {
  println("queries=" + SparkEntry.queries.size)
  println("oracles=" + SparkEntry.oracleSql.size)
  val q = SparkEntry.queries.keySet; val o = SparkEntry.oracleSql.keySet
  println("noOracle=" + (q -- o).toSeq.sorted.mkString(","))
} }
