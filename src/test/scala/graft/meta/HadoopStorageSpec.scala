package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** The storage layer speaks the Hadoop FileSystem API: every lifecycle
  * operation must work against a scheme-qualified table directory, the
  * CAS seam must be honored by both provided implementations, and the
  * data path must stay free of `java.nio.file` (which only ever resolves
  * the local POSIX filesystem — the round-4 structural gap).
  */
class HadoopStorageSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("count", LongType)))

  private def batch(rows: (String, Long, Long)*) = rows.toDF("key", "ts", "count")

  test("full lifecycle against a file:// scheme-qualified table directory") {
    val dir = "file://" + java.nio.file.Files.createTempDirectory("graft-hfs").toString + "/tbl"
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq("m"),
      config = TableConfig(gcDelayMinutes = 0, aggregationConfig = "sum(count)"))

    table.ingest(batch(("apple", 1L, 2L), ("zebra", 1L, 5L)))
    table.ingest(batch(("apple", 1L, 3L), ("mango", 2L, 4L)))
    assert(table.toDF.orderBy("key").as[(String, Long, Long)].collect().toSeq ==
      Seq(("apple", 1L, 5L), ("mango", 2L, 4L), ("zebra", 1L, 5L)))

    // sketches landed next to the scheme-qualified data files
    table.store.fileReferences.foreach(r => assert(SketchSidecar.exists(table.pathOf(r))))

    table.compactAll()
    assert(table.store.fileReferences.groupBy(_.partitionId).values.forall(_.size == 1))
    assert(table.toDF.count() == 3)

    // region query still prunes and reads through the qualified paths
    val q = graft.query.GraftQuery.forRegions(Region(KeyRange.minMax("key", "a", "c")))
    assert(table.query(q).select("key").as[String].collect().toSeq == Seq("apple"))

    // DSv2 scan over the qualified dir (row + pushdown path)
    spark.read.format("graft").load(dir).createOrReplaceTempView("hfs_t")
    assert(spark.sql("SELECT count FROM hfs_t WHERE key = 'mango'").as[Long].collect().toSeq
      == Seq(4L))

    // GC deletes through the FileSystem
    val doomed = table.store.unreferencedFiles.map(_.filename)
    assert(doomed.nonEmpty)
    assert(table.collectGarbage(System.currentTimeMillis() + 1000).toSet == doomed.toSet)
    assert(table.toDF.count() == 3)

    // reload from the qualified path sees the same state
    val reloaded = GraftTable.load(spark, dir)
    assert(reloaded.toDF.count() == 3)
  }

  test("RenameCAS: exactly one of two publishers wins a version name") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas").toString
    val (fs, root) = GraftFS.resolve(dir)
    val target = new org.apache.hadoop.fs.Path(root, "state-v7.json")
    val t1 = new org.apache.hadoop.fs.Path(root, ".w1.tmp")
    val t2 = new org.apache.hadoop.fs.Path(root, ".w2.tmp")
    GraftFS.writeString(t1.toString, "writer-1")
    GraftFS.writeString(t2.toString, "writer-2")
    val first = RenameCAS.publish(fs, t1, target)
    val second = RenameCAS.publish(fs, t2, target)
    assert(first && !second)
    assert(GraftFS.readString(target.toString) == "writer-1") // loser never clobbers
  }

  test("HardLinkCAS: loser detects the conflict and the winner's content survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cas-hl").toString
    val (fs, root) = GraftFS.resolve(dir)
    val target = new org.apache.hadoop.fs.Path(root, "state-v3.json")
    val t1 = new org.apache.hadoop.fs.Path(root, ".w1.tmp")
    val t2 = new org.apache.hadoop.fs.Path(root, ".w2.tmp")
    GraftFS.writeString(t1.toString, "winner")
    GraftFS.writeString(t2.toString, "loser")
    assert(HardLinkCAS.publish(fs, t1, target))
    assert(!HardLinkCAS.publish(fs, t2, target))
    assert(GraftFS.readString(target.toString) == "winner")
  }

  test("a crashed writer's empty reserved snapshot blocks commits only for the grace window") {
    val prev = System.getProperty("graft.state.quarantine.grace.ms")
    System.setProperty("graft.state.quarantine.grace.ms", "400")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-husk").toString
      val store = JsonStateStore.create(dir, schema, PartitionTree.fromSplitPoints(schema, Nil))
      // simulate the fallback-writer crash: version 2 reserved but never filled
      GraftFS.writeString(s"$dir/txn-v2.json", "")
      val t0 = System.currentTimeMillis()
      store.addFiles(Seq(FileReference("f1.parquet", store.partitionTree.leaves.head.id, 1L)))
      val elapsed = System.currentTimeMillis() - t0
      // the commit waited out the grace, quarantined the husk, and landed
      assert(store.fileReferences.map(_.filename) == Seq("f1.parquet"))
      assert(elapsed >= 350, s"commit should have waited for the grace window, took ${elapsed}ms")
      assert(elapsed < 10000, s"commit must be bounded by the grace window, took ${elapsed}ms")
      assert(GraftFS.exists(s"$dir/txn-v2.json.corrupt") || !GraftFS.exists(s"$dir/txn-v2.json"))
    } finally {
      if (prev == null) System.clearProperty("graft.state.quarantine.grace.ms")
      else System.setProperty("graft.state.quarantine.grace.ms", prev)
    }
  }

  test("the data path contains no java.nio.file usage (Hadoop FileSystem only)") {
    val dataPathDirs = Seq("jobs", "meta", "table", "sources", "streaming", "exec", "query")
      .map(d => java.nio.file.Paths.get(s"src/main/scala/graft/$d")) ++
      Seq(java.nio.file.Paths.get("src/main/scala/org/apache/spark"))
    // GraftFS: the local-FS hard-link CAS, documented local-only.
    // HttpCas: only its SERVER half touches java.nio.file — the claim
    // service's own durable storage (the DynamoDB-analog's internal
    // store), never a table path; the client half (HttpClaimStore /
    // HttpCas) is pure HTTP.
    val allowed = Set("GraftFS.scala", "HttpCas.scala")
    val offenders = dataPathDirs.filter(java.nio.file.Files.isDirectory(_)).flatMap { d =>
      val stream = java.nio.file.Files.walk(d)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".scala"))
          .filterNot(p => allowed(p.getFileName.toString))
          .filter(p => new String(java.nio.file.Files.readAllBytes(p)).contains("java.nio.file"))
          .map(_.toString)
          .toList
      } finally stream.close()
    }
    assert(offenders.isEmpty,
      s"java.nio.file leaked back into the data path: ${offenders.mkString(", ")}")
  }
}
