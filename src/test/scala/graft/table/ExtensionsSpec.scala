package graft.table

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.query.GraftQuery
import graft.streaming.StreamingIngest
import graft.transforms.{SortedRowTransform, TransformFactory}

/** X1 config-string transforms (table + query level, required-field
  * pruning), point-lookup sugar, and T1 streaming ingest.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("vis", StringType), GraftField("count", LongType)))

  private def tmp() = Files.createTempDirectory("graft-ext").toString

  private def batch(rows: (String, Long, String, Long)*) =
    rows.toDF("key", "ts", "vis", "count")

  test("TransformFactory builds from class-name{config} strings and validates") {
    val t = TransformFactory.create("graft.transforms.SecurityFilter{vis,public|secret}", schema)
    assert(t.requiredValueFields == Seq("vis"))
    intercept[Exception](
      TransformFactory.create("graft.transforms.SecurityFilter{nope,auth}", schema))
    assert(TransformFactory.parse("", schema).isEmpty)
    assert(TransformFactory.parse("  ", schema).isEmpty)
  }

  test("a ;-separated spec chains transforms in order with unioned required fields") {
    val chain = TransformFactory.parse(
      "graft.transforms.SecurityFilter{vis,public};graft.transforms.CapValue{count,10}",
      schema).get
    assert(chain.requiredValueFields.toSet == Set("vis", "count"))

    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(transformConfig =
        "graft.transforms.SecurityFilter{vis,public};graft.transforms.CapValue{count,10}"))
    table.ingest(batch(
      ("a", 1L, "public", 100L), ("b", 1L, "secret!", 2L), ("c", 1L, "public", 5L)))

    // query view: filter drops b, cap rewrites a's count
    assert(table.toDF.select("key", "count").as[(String, Long)].collect().toSeq ==
      Seq(("a", 10L), ("c", 5L)))

    // compaction applies the whole chain persistently
    table.compactAll()
    val refs = table.store.fileReferences
    assert(refs.map(_.rowCount).sum == 2)
    val raw = spark.read.parquet(refs.map(table.pathOf): _*)
      .select("key", "count").as[(String, Long)].collect().toSet
    assert(raw == Set(("a", 10L), ("c", 5L)))
  }

  test("compactAll converges when a transform drops ALL of a leaf's rows") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq("m"),
      config = TableConfig(transformConfig = "graft.transforms.SecurityFilter{vis,public}"))
    // left leaf: only secret rows (fully dropped); right leaf: mixed
    table.ingest(batch(
      ("a", 1L, "secret!", 1L), ("b", 1L, "secret!", 2L),
      ("x", 1L, "public", 3L), ("y", 1L, "secret!", 4L)))

    table.compactAll()
    // the emptied leaf's inputs were committed away (pure removal), not
    // left live to be re-merged forever
    val live = table.store.fileReferences
    assert(live.map(_.rowCount).sum == 1, s"live=$live")
    assert(table.toDF.select("key").as[String].collect().toSeq == Seq("x"))

    // convergence: a second compactAll finds nothing to do
    val versionBefore = table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion
    table.compactAll()
    assert(table.store.asInstanceOf[graft.meta.JsonStateStore].currentVersion == versionBefore,
      "second compactAll should be a no-op on a converged table")
  }

  test("table-level transform applies at query time AND rewrites data at compaction") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(transformConfig = "graft.transforms.SecurityFilter{vis,public}"))
    table.ingest(batch(
      ("a", 1L, "public", 1L), ("b", 1L, "topsecret", 2L), ("c", 1L, "", 3L)))

    // query-time: secret row filtered even before compaction
    assert(table.toDF.select("key").as[String].collect().toSet == Set("a", "c"))

    // compaction applies it persistently: the rewritten file has 2 rows
    table.ingest(batch(("d", 1L, "topsecret", 4L)))
    table.compactAll()
    val totalRows = table.store.fileReferences.map(_.rowCount).sum
    assert(totalRows == 2, s"persistent delete at compaction expected, refs=${table.store.fileReferences}")
  }

  test("single-job compaction applies the table transform and stays sorted") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(transformConfig = "graft.transforms.SecurityFilter{vis,public}"))
    table.ingest(batch(("b", 1L, "public", 1L), ("d", 1L, "secret!", 2L)))
    table.ingest(batch(("a", 1L, "public", 3L), ("c", 1L, "public", 4L)))
    val n = table.compact(graft.jobs.BasicCompactionStrategy())
    assert(n == 1)
    val refs = table.store.fileReferences
    assert(refs.size == 1 && refs.head.rowCount == 3, s"refs=$refs")
    // the rewritten file is sorted by key
    val keys = spark.read.parquet(table.pathOf(refs.head))
      .select("key").as[String].collect().toSeq
    assert(keys == Seq("a", "b", "c"))
  }

  test("query-level config transform + required fields keep the read schema pruned") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    table.ingest(batch(("a", 1L, "public", 1L), ("b", 1L, "x", 2L)))

    val q = GraftQuery(
      requestedValueFields = Some(Seq("count")), // vis NOT requested...
      queryTransformConfig = Some("graft.transforms.SecurityFilter{vis,public}"))
    val df = table.query(q)
    // ...but the transform's requiredValueFields pulled vis into the read,
    // and the final projection drops it again
    assert(df.columns.toSeq == Seq("key", "ts", "count"))
    assert(df.select("key").as[String].collect().toSeq == Seq("a"))
  }

  test("programmatic + config transforms compose in order (table, then query)") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema,
      config = TableConfig(transformConfig = "graft.transforms.CapValue{count,10}"))
    table.ingest(batch(("a", 1L, "p", 100L), ("b", 1L, "p", 5L)))
    val q = GraftQuery(queryTimeTransform = Some((df: DataFrame) => df.filter(col("count") >= 10)))
    // CapValue caps 100 -> 10 first, then the hook keeps >= 10
    assert(table.query(q).select("key").as[String].collect().toSeq == Seq("a"))
  }

  test("point lookup plans to exactly the leaves holding the keys") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq("h", "p"))
    table.ingest(batch(("c", 1L, "p", 1L), ("k", 2L, "p", 2L), ("t", 3L, "p", 3L)))

    val got = table.lookup("k").select("key", "count").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("k", 2L)))

    // pruning assertion: the exact-key region overlaps exactly one leaf
    val q = GraftQuery.forKeys(schema, Seq("k"))
    val tree = table.store.partitionTree
    assert(tree.leavesOverlapping(q.regions.map(_.canonical)).size == 1)

    // multi-key lookup hits two leaves, returns both rows
    val multi = GraftQuery.forKeys(schema, Seq("c"), Seq("t"))
    assert(tree.leavesOverlapping(multi.regions.map(_.canonical)).size == 2)
    assert(table.query(multi).select("key").as[String].collect().toSet == Set("c", "t"))
  }

  test("streaming ingest: files land exactly once across trigger cycles") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema, splitPoints = Seq("m"))
    val inbox = Files.createTempDirectory("graft-inbox").toString
    val cp = Files.createTempDirectory("graft-cp").toString
    val ingest = new StreamingIngest(table, inbox, cp)

    def drop(name: String, rows: (String, Long, String, Long)*): Unit = {
      val stage = Files.createTempDirectory("graft-stage")
      batch(rows: _*).coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, java.nio.file.Paths.get(inbox, name))
    }

    drop("f1.parquet", ("a", 1L, "p", 1L), ("z", 1L, "p", 2L))
    assert(ingest.runOnce() == 1)
    assert(table.toDF.count() == 2)

    // second cycle with nothing new: no-op, no duplicates
    assert(ingest.runOnce() == 0)
    assert(table.toDF.count() == 2)

    drop("f2.parquet", ("m", 2L, "p", 3L))
    assert(ingest.runOnce() == 1)
    assert(table.toDF.count() == 3)
    assert(table.toDF.select("key").as[String].collect().toSet == Set("a", "z", "m"))
  }

  test("streaming ingest with the dedup transform drops already-ingested texts") {
    // text dedup lives on the `vis` column here (any string value field)
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    val inbox = Files.createTempDirectory("graft-inbox-dd").toString
    val cp = Files.createTempDirectory("graft-cp-dd").toString
    val ingest = new StreamingIngest(table, inbox, cp,
      batchTransform = graft.streaming.StreamingDedup.againstTable(table, "vis"))

    def drop(name: String, rows: (String, Long, String, Long)*): Unit = {
      val stage = Files.createTempDirectory("graft-stage-dd")
      batch(rows: _*).coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, java.nio.file.Paths.get(inbox, name))
    }

    // in-batch duplicate "aa": the smallest key wins, deterministically
    drop("f1.parquet", ("a", 1L, "aa", 1L), ("b", 1L, "bb", 2L), ("c", 1L, "aa", 3L))
    assert(ingest.runOnce() == 1)
    assert(table.toDF.select("key").as[String].collect().toSet == Set("a", "b"))

    // cross-batch duplicate "bb" gated by the table's current contents
    drop("f2.parquet", ("d", 2L, "bb", 4L), ("e", 2L, "cc", 5L))
    assert(ingest.runOnce() == 1)
    assert(table.toDF.select("key", "vis").as[(String, String)].collect().toSet ==
      Set(("a", "aa"), ("b", "bb"), ("e", "cc")))

    // null-text rows are each their own winner (Dedup's null convention):
    // a batch with two distinct null-text rows ingests BOTH, while its
    // non-null duplicate still collapses
    val stage = Files.createTempDirectory("graft-stage-dd")
    Seq(("n1", 3L, Option.empty[String], 6L), ("n2", 3L, Option.empty[String], 7L),
        ("n3", 3L, Some("dd"), 8L), ("n4", 3L, Some("dd"), 9L))
      .toDF("key", "ts", "vis", "count")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, java.nio.file.Paths.get(inbox, "f3.parquet"))
    assert(ingest.runOnce() == 1)
    assert(table.toDF.filter(col("vis").isNull).select("key").as[String].collect().toSet ==
      Set("n1", "n2"))
    assert(table.toDF.filter(col("vis") === "dd").select("key").as[String].collect().toSet ==
      Set("n3"))
  }

  test("streaming ingest batcher honors min batch size until max age forces it") {
    val dir = tmp()
    val table = GraftTable.create(spark, dir, schema)
    val inbox = Files.createTempDirectory("graft-inbox2").toString
    val cp = Files.createTempDirectory("graft-cp2").toString
    val ingest = new StreamingIngest(table, inbox, cp,
      minBatchFiles = 2, maxBatchAgeMs = 60000)

    val stage = Files.createTempDirectory("graft-stage2")
    batch(("a", 1L, "p", 1L)).coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, java.nio.file.Paths.get(inbox, "only.parquet"))

    // one file, young: below min batch size -> held back
    assert(ingest.runOnce() == 0)
    assert(table.toDF.count() == 0)

    // same file, but now "older" than maxBatchAgeMs -> age forces the batch
    assert(ingest.runOnce(nowMs = System.currentTimeMillis() + 120000) == 1)
    assert(table.toDF.count() == 1)
  }

  test("stream identity: legacy checkpoints keep their appId, fresh ones mint a uuid") {
    def drop(inbox: String, name: String): Unit = {
      val stage = Files.createTempDirectory("graft-stage3")
      batch(("a", 1L, "p", 1L)).coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, java.nio.file.Paths.get(inbox, name))
    }

    // PRE-UPGRADE checkpoint (has an offsets dir, no stream-id file):
    // its committed watermarks live under appId "stream:<checkpointDir>",
    // so the minted identity must seed from the path — a crash-replayed
    // batch straddling the upgrade then still deduplicates.
    val legacyTable = GraftTable.create(spark, tmp(), schema, splitPoints = Seq("m"))
    val legacyInbox = Files.createTempDirectory("graft-inbox-lg").toString
    val legacyCp = Files.createTempDirectory("graft-cp-lg").toString
    Files.createDirectories(java.nio.file.Paths.get(legacyCp, "offsets"))
    drop(legacyInbox, "f.parquet")
    assert(new StreamingIngest(legacyTable, legacyInbox, legacyCp).runOnce() == 1)
    assert(legacyTable.store.lastTxnVersion(s"stream:$legacyCp").nonEmpty)

    // FRESH checkpoint: a uuid identity, persisted next to the checkpoint;
    // the path-keyed appId is never used
    val freshTable = GraftTable.create(spark, tmp(), schema, splitPoints = Seq("m"))
    val freshInbox = Files.createTempDirectory("graft-inbox-fr").toString
    val freshCp = Files.createTempDirectory("graft-cp-fr").toString
    drop(freshInbox, "f.parquet")
    assert(new StreamingIngest(freshTable, freshInbox, freshCp).runOnce() == 1)
    assert(freshTable.store.lastTxnVersion(s"stream:$freshCp").isEmpty)
    val id = Files.readString(java.nio.file.Paths.get(freshCp, "stream-id")).trim
    assert(id.nonEmpty && id != freshCp)
    assert(freshTable.store.lastTxnVersion(s"stream:$id").nonEmpty)
  }
}
